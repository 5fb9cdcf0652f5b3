"""ZIP member extraction (S4/X2/A2 in SURVEY.md §2).

Reference behavior (``/root/reference/src/utils/helper.py:35-101``):
save the ZIP to a temp dir, extract all members, ``rglob`` for the
target extension, keep the *largest* match, rename it to
``{edinetCode}_{yyyyMMdd}_{docTypeCode}{ext}``, clean up.  Corrupt
ZIPs and no-match ZIPs are logged and skipped.

Spark-first shape: no filesystem at all — ``zipfile`` over in-memory
bytes inside a ``mapInPandas`` UDTF (1 ZIP row → N member rows), then
the *selection* (extension filter + largest-wins argmax A2 + filename
build F7/F8) is plain relational code Catalyst can see.
"""

from __future__ import annotations

import io
import zipfile
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEMBER_SCHEMA = (
    "docID string, edinetCode string, docTypeCode string, "
    "submitDateTime string, file_type string, arrival_idx long, "
    "member_name string, member_size long, member_bytes binary"
)

_META = ["docID", "edinetCode", "docTypeCode", "submitDateTime", "file_type", "arrival_idx"]


def explode_zip_members(downloads: DataFrame) -> DataFrame:
    """X2 UDTF: one row per ZIP member (name, size, bytes).  Corrupt
    archives emit nothing — the reference's log-and-skip error path
    (``src/utils/helper.py:64-67``)."""

    def unzip(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for row in pdf.itertuples(index=False):
                try:
                    zf = zipfile.ZipFile(io.BytesIO(row.content))
                    infos = zf.infolist()
                except Exception:  # noqa: BLE001 — corrupt zip → skip doc
                    continue
                meta = tuple(getattr(row, c) for c in _META)
                for info in infos:
                    if info.is_dir():
                        continue
                    rows.append(
                        meta + (info.filename, info.file_size, zf.read(info))
                    )
            yield pd.DataFrame(
                rows, columns=_META + ["member_name", "member_size", "member_bytes"]
            )

    return downloads.mapInPandas(unzip, schema=MEMBER_SCHEMA)


def select_best_member(members: DataFrame) -> DataFrame:
    """Extension filter + A2 largest-wins + final-filename build.

    ``max_by(struct, key)``-equivalent via one window: largest
    ``member_size`` per doc, member name as a total-order tiebreak
    (the reference's ``max()`` inherits Path ordering on ties —
    we pin it, SURVEY §2.11d).  Filename: F7 date normalize + F8
    concat (``src/utils/helper.py:82-85``)."""
    from pyspark.sql import Window

    ext_ok = F.col("member_name").endswith(
        F.when(F.col("file_type") == "csv", ".csv").otherwise(".xbrl")
    )
    w = Window.partitionBy("docID").orderBy(
        F.desc("member_size"), F.desc("member_name")
    )
    date_str = F.regexp_replace(
        F.substring_index(F.col("submitDateTime"), " ", 1), "-", ""
    )
    filename = F.concat_ws(
        "_", F.col("edinetCode"), date_str, F.col("docTypeCode")
    )
    return (
        members.filter(ext_ok)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .withColumn(
            "filename",
            F.concat(filename, F.lit("."), F.col("file_type")),
        )
        .select(*_META, "filename", "member_bytes")
    )


def extract_filings(downloads: DataFrame) -> DataFrame:
    """Full S4 stage: unzip → pick target member → canonical filename."""
    return select_best_member(explode_zip_members(downloads))
