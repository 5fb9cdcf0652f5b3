"""Pure-stdlib PNG codec (8-bit grayscale, non-interlaced).

Closes the one environment-gated hole in the multimodal ladder: the
container has no Pillow (no pip), so earlier rounds shipped a
byte-histogram decode stub.  PNG's container is just zlib + struct —
both stdlib — so an actual decoder is implementable from the public
spec (RFC 2083 / W3C PNG): signature, chunked layout with CRC-32,
DEFLATE-compressed scanlines, and the five per-row predictor filters
(None/Sub/Up/Average/Paeth).

Scope: bit depth 8, color type 0 (grayscale), no interlace — the
subset the engine's image fixtures use.  Anything else raises
``ValueError`` with the offending field, never a wrong answer.  The
decoder handles ALL five filter types and multiple IDAT chunks, so
8-bit grayscale output of any standard writer decodes here.

Used by ``operators/multimodal.py``: ``decode_image`` routes payloads
with the PNG signature through this decoder; the
``png_roundtrip_decode_stats`` query proves encode→decode end-to-end
against a DuckDB oracle that recomputes the ground-truth pixels
independently.  Reference parity: /root/reference has no image path
at all — this is part of the mandated multimodal extension surface.
"""

from __future__ import annotations

import struct
import zlib

PNG_SIGNATURE = b"\x89PNG\r\n\x1a\n"


def _chunk(tag: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + tag
        + body
        + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
    )


def _paeth(a: int, b: int, c: int) -> int:
    """Paeth predictor (PNG spec §6.6): nearest of left/up/up-left."""
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def encode_png_gray(
    width: int,
    height: int,
    pixels: bytes,
    row_filters: list[int] | None = None,
) -> bytes:
    """Encode row-major 8-bit grayscale ``pixels`` as a valid PNG.

    ``row_filters`` picks the predictor per scanline (default all 0 /
    None); passing a mix of 0–4 produces files that exercise every
    unfilter branch of the decoder — exactly what the roundtrip query
    does.  bpp is 1, so "pixel to the left" is "byte to the left".
    """
    if len(pixels) != width * height:
        raise ValueError(f"pixels: want {width * height} bytes, got {len(pixels)}")
    if row_filters is None:
        row_filters = [0] * height
    if len(row_filters) != height:
        raise ValueError("row_filters: one entry per scanline")
    raw = bytearray()
    prior = bytes(width)
    for y in range(height):
        row = pixels[y * width : (y + 1) * width]
        ft = row_filters[y]
        raw.append(ft)
        if ft == 0:
            raw += row
        elif ft == 1:  # Sub
            raw += bytes((row[x] - (row[x - 1] if x else 0)) & 0xFF for x in range(width))
        elif ft == 2:  # Up
            raw += bytes((row[x] - prior[x]) & 0xFF for x in range(width))
        elif ft == 3:  # Average
            raw += bytes(
                (row[x] - (((row[x - 1] if x else 0) + prior[x]) >> 1)) & 0xFF
                for x in range(width)
            )
        elif ft == 4:  # Paeth
            raw += bytes(
                (
                    row[x]
                    - _paeth(
                        row[x - 1] if x else 0,
                        prior[x],
                        prior[x - 1] if x else 0,
                    )
                )
                & 0xFF
                for x in range(width)
            )
        else:
            raise ValueError(f"filter type {ft} not in 0..4")
        prior = row
    ihdr = struct.pack(">IIBBBBB", width, height, 8, 0, 0, 0, 0)
    return (
        PNG_SIGNATURE
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(raw), 6))
        + _chunk(b"IEND", b"")
    )


def decode_png_gray(data: bytes) -> tuple[int, int, bytes]:
    """Decode an 8-bit grayscale non-interlaced PNG.

    Returns ``(width, height, pixels)`` with pixels row-major.  CRCs
    are verified; IDAT may span multiple chunks; all five filter
    types unfilter per spec.  Unsupported shapes (bit depth ≠ 8,
    color type ≠ 0 grayscale, interlaced) raise ``ValueError``.
    """
    if data[:8] != PNG_SIGNATURE:
        raise ValueError("not a PNG: bad signature")
    pos = 8
    width = height = -1
    idat = bytearray()
    seen_iend = False
    while pos < len(data):
        if pos + 8 > len(data):
            raise ValueError("truncated chunk header")
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        if pos + 12 + length > len(data):
            raise ValueError(f"truncated {tag!r} chunk")
        body = data[pos + 8 : pos + 8 + length]
        (crc,) = struct.unpack(">I", data[pos + 8 + length : pos + 12 + length])
        if zlib.crc32(tag + body) & 0xFFFFFFFF != crc:
            raise ValueError(f"CRC mismatch in {tag!r} chunk")
        if tag == b"IHDR":
            width, height, depth, color, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", body
            )
            if depth != 8:
                raise ValueError(f"unsupported bit depth {depth} (only 8)")
            if color != 0:
                raise ValueError(f"unsupported color type {color} (only 0 grayscale)")
            if comp != 0 or filt != 0:
                raise ValueError("nonstandard compression/filter method")
            if interlace != 0:
                raise ValueError("interlaced PNG not supported")
        elif tag == b"IDAT":
            idat += body
        elif tag == b"IEND":
            seen_iend = True
            break
        # ancillary chunks (tEXt, pHYs, ...) are skipped per spec
        pos += 12 + length
    if width < 0:
        raise ValueError("missing IHDR")
    if not seen_iend:
        raise ValueError("missing IEND")
    raw = zlib.decompress(bytes(idat))
    stride = width + 1
    if len(raw) != stride * height:
        raise ValueError(
            f"decompressed stream: want {stride * height} bytes, got {len(raw)}"
        )
    out = bytearray(width * height)
    prior = bytes(width)
    for y in range(height):
        ft = raw[y * stride]
        line = raw[y * stride + 1 : (y + 1) * stride]
        row = bytearray(width)
        if ft == 0:
            row[:] = line
        elif ft == 1:  # Sub
            for x in range(width):
                row[x] = (line[x] + (row[x - 1] if x else 0)) & 0xFF
        elif ft == 2:  # Up
            for x in range(width):
                row[x] = (line[x] + prior[x]) & 0xFF
        elif ft == 3:  # Average
            for x in range(width):
                row[x] = (line[x] + (((row[x - 1] if x else 0) + prior[x]) >> 1)) & 0xFF
        elif ft == 4:  # Paeth
            for x in range(width):
                row[x] = (
                    line[x]
                    + _paeth(
                        row[x - 1] if x else 0, prior[x], prior[x - 1] if x else 0
                    )
                ) & 0xFF
        else:
            raise ValueError(f"scanline {y}: filter type {ft} not in 0..4")
        out[y * width : (y + 1) * width] = row
        prior = bytes(row)
    return width, height, bytes(out)
