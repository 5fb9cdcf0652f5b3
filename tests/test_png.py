"""Unit tests for the stdlib PNG codec (edinet_etl_spark.png).

The roundtrip query proves encoder∘decoder == identity against the
DuckDB oracle; these tests break the symmetry so a matched
encoder/decoder bug can't cancel: the decoder is exercised on a PNG
built BY HAND (independent chunk/filter construction), and the
encoder's output container is validated field by field.
"""

from __future__ import annotations

import struct
import zlib

import pytest

from edinet_etl_spark.png import (
    PNG_SIGNATURE,
    decode_png_gray,
    encode_png_gray,
)


def _hand_chunk(tag: bytes, body: bytes) -> bytes:
    # deliberately re-implemented here, not imported from the codec
    return (
        len(body).to_bytes(4, "big")
        + tag
        + body
        + (zlib.crc32(tag + body) & 0xFFFFFFFF).to_bytes(4, "big")
    )


def _hand_png(width, height, scanlines: bytes, split_idat: bool = False) -> bytes:
    ihdr = struct.pack(">IIBBBBB", width, height, 8, 0, 0, 0, 0)
    comp = zlib.compress(scanlines)
    if split_idat:
        mid = len(comp) // 2
        idat = _hand_chunk(b"IDAT", comp[:mid]) + _hand_chunk(b"IDAT", comp[mid:])
    else:
        idat = _hand_chunk(b"IDAT", comp)
    return PNG_SIGNATURE + _hand_chunk(b"IHDR", ihdr) + idat + _hand_chunk(b"IEND", b"")


def test_decode_hand_built_filter0():
    # 2x2 image [[1,2],[3,4]], both rows filter 0
    data = _hand_png(2, 2, b"\x00\x01\x02\x00\x03\x04")
    assert decode_png_gray(data) == (2, 2, bytes([1, 2, 3, 4]))


def test_decode_hand_built_all_filters():
    """Five rows, one per filter type, unfiltered by hand per the spec."""
    w = 4
    # row 0, filter 0 (None): recon = [10, 20, 30, 40]
    r0 = bytes([10, 20, 30, 40])
    # row 1, filter 1 (Sub): filt [5, 5, 5, 5] -> recon [5, 10, 15, 20]
    # row 2, filter 2 (Up): filt [1, 1, 1, 1] over r1 -> [6, 11, 16, 21]
    # row 3, filter 3 (Average): filt [4, 4, 4, 4], prior=[6,11,16,21]
    #   x0: 4 + (0+6)//2 = 7; x1: 4 + (7+11)//2 = 13;
    #   x2: 4 + (13+16)//2 = 18; x3: 4 + (18+21)//2 = 23
    # row 4, filter 4 (Paeth): filt [2, 2, 2, 2], prior=[7,13,18,23]
    #   x0: a=0,b=7,c=0 -> p=7, pa=7,pb=0 -> b=7; recon 9
    #   x1: a=9,b=13,c=7 -> p=15, pa=6,pb=2,pc=8 -> b=13; recon 15
    #   x2: a=15,b=18,c=13 -> p=20, pa=5,pb=2,pc=7 -> b=18; recon 20
    #   x3: a=20,b=23,c=18 -> p=25, pa=5,pb=2,pc=7 -> b=23; recon 25
    scan = (
        b"\x00" + r0
        + b"\x01" + bytes([5, 5, 5, 5])
        + b"\x02" + bytes([1, 1, 1, 1])
        + b"\x03" + bytes([4, 4, 4, 4])
        + b"\x04" + bytes([2, 2, 2, 2])
    )
    data = _hand_png(w, 5, scan, split_idat=True)
    width, height, px = decode_png_gray(data)
    assert (width, height) == (4, 5)
    assert list(px) == [
        10, 20, 30, 40,
        5, 10, 15, 20,
        6, 11, 16, 21,
        7, 13, 18, 23,
        9, 15, 20, 25,
    ]


def test_roundtrip_all_filters_exhaustive():
    """Every (filter, size) combination roundtrips; pixels cover the
    byte range including wraparound-prone values (0, 255)."""
    for w, h in [(1, 1), (1, 7), (5, 1), (8, 8), (13, 3)]:
        px = bytes((i * 37 + 11) % 256 for i in range(w * h))
        for ft in range(5):
            data = encode_png_gray(w, h, px, [ft] * h)
            assert decode_png_gray(data) == (w, h, px), (w, h, ft)
        # mixed filters
        data = encode_png_gray(w, h, px, [(y * 3 + 1) % 5 for y in range(h)])
        assert decode_png_gray(data) == (w, h, px)


def test_encoder_emits_valid_container():
    data = encode_png_gray(3, 2, bytes(6), [0, 0])
    assert data[:8] == PNG_SIGNATURE
    (ln,) = struct.unpack(">I", data[8:12])
    assert data[12:16] == b"IHDR" and ln == 13
    w, h, depth, color, comp, filt, inter = struct.unpack(">IIBBBBB", data[16:29])
    assert (w, h, depth, color, comp, filt, inter) == (3, 2, 8, 0, 0, 0, 0)
    assert data.endswith(_hand_chunk(b"IEND", b""))


def test_decode_skips_ancillary_chunks():
    scan = b"\x00\x01\x02\x00\x03\x04"
    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 0, 0, 0, 0)
    data = (
        PNG_SIGNATURE
        + _hand_chunk(b"IHDR", ihdr)
        + _hand_chunk(b"tEXt", b"Comment\x00hi")
        + _hand_chunk(b"IDAT", zlib.compress(scan))
        + _hand_chunk(b"IEND", b"")
    )
    assert decode_png_gray(data) == (2, 2, bytes([1, 2, 3, 4]))


@pytest.mark.parametrize(
    "mutate,msg",
    [
        (lambda d: b"JUNK" + d[4:], "signature"),
        (lambda d: d[:20] + bytes([d[20] ^ 1]) + d[21:], "CRC"),  # flip IHDR byte
        (lambda d: d[:-4], "IEND"),  # drop trailing CRC -> truncated/missing IEND
    ],
)
def test_decode_rejects_corruption(mutate, msg):
    data = encode_png_gray(2, 2, bytes([1, 2, 3, 4]), [0, 0])
    with pytest.raises(ValueError):
        decode_png_gray(mutate(data))


@pytest.mark.parametrize(
    "depth,color,interlace",
    [(16, 0, 0), (8, 2, 0), (8, 6, 0), (8, 0, 1)],
)
def test_decode_rejects_unsupported_shapes(depth, color, interlace):
    ihdr = struct.pack(">IIBBBBB", 2, 2, depth, color, 0, 0, interlace)
    data = (
        PNG_SIGNATURE
        + _hand_chunk(b"IHDR", ihdr)
        + _hand_chunk(b"IDAT", zlib.compress(b"\x00\x01\x02\x00\x03\x04"))
        + _hand_chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError):
        decode_png_gray(data)


def test_decode_image_routes_png_payloads():
    """decode_image_stub: PNG payloads produce a pixel-value histogram
    (the real decode path); other bytes keep the byte-histogram
    fallback."""
    from edinet_etl_spark.operators.multimodal import FEATURE_DIM, decode_image_stub

    px = bytes((i * 7) % 256 for i in range(24))
    feat = decode_image_stub(encode_png_gray(6, 4, px, [4] * 4))
    want = [0] * FEATURE_DIM
    for v in px:
        want[v % FEATURE_DIM] += 1
    assert feat == [c / len(px) for c in want]
    assert abs(sum(feat) - 1.0) < 1e-9

    raw = b"not a png at all"
    feat2 = decode_image_stub(raw)
    want2 = [0] * FEATURE_DIM
    for b in raw:
        want2[b % FEATURE_DIM] += 1
    assert feat2 == [c / len(raw) for c in want2]
