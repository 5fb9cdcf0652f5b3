"""Pre-fetched filing lake: the `binaryFile`-source ingestion path
(SURVEY.md §2.1 S3's second mapping — "pre-fetched dir +
spark.read.format('binaryFile')").

The HTTP path (`edinet_api.download_documents`) is right when Spark
itself polls the API; this path is right when an upstream collector
already landed the ZIPs on shared storage (the usual shape at scale:
ingestion and compute decoupled, the lake is the interface).  The
`binaryFile` source gives (path, modificationTime, length, content)
rows with the same scan machinery as any other file source —
partition-parallel reads, pathGlobFilter pushdown, and no bytes read
for pruned files when only metadata columns are selected.

Downstream is IDENTICAL to the HTTP path: filename-encoded metadata is
parsed relationally (F5/F6-style regexes), then the same ZIP UDTF +
largest-member selection (`zip_extract`) feeds the parsers — one code
path for members regardless of how bytes arrived.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# Lake layout convention:
#   {docID}_{edinetCode}_{docTypeCode}_{fileType}.zip   (full form)
#   {docID}_{edinetCode}_{fileType}.zip                 (legacy form)
# with the submit date as the parent directory (dt=YYYY-MM-DD/).
# docTypeCode is the EDINET form code ('120' annual, '130' amendment —
# the key the A1 amendment-priority dedup selects on); fileType is the
# API payload type ('5' CSV, '1' XBRL).  They are DIFFERENT codes: an
# earlier revision stored only fileType and surfaced it AS docTypeCode,
# which silently disabled the '130'-beats-'120' rule for lake-ingested
# filings (a '130' never appeared).  Legacy 3-part names now yield a
# NULL docTypeCode — honest absence instead of a wrong value.  The
# name parse mirrors the reference's (/root/reference/src/transform.py:120).
_NAME_RE = r"([^/_]+)_([^/_]+)_(?:(\d+)_)?(\d)\.zip$"
_DT_RE = r"dt=(\d{4}-\d{2}-\d{2})"


def read_filing_lake(spark: SparkSession, lake_dir: str) -> DataFrame:
    """Scan a directory tree of filing ZIPs into the same
    (docID, edinetCode, docTypeCode, submitDateTime, file_type,
    arrival_idx, content) shape `download_documents` produces, so
    `zip_extract.explode_zip_members` composes unchanged.

    file_type comes from the fileType component the same way the flag
    dispatch does (P13): type 5 payloads carry CSV members, type 1
    XBRL.  The arrival index (load-bearing order at L1, SURVEY
    §2.11d) is the lake's modificationTime ordered rank — stable
    because object stores version by write time.
    """
    from pyspark.sql import Window

    files = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.zip")
        .load(lake_dir)
    )
    w = Window.orderBy("modificationTime", "path")
    return files.select(
        F.regexp_extract("path", _NAME_RE, 1).alias("docID"),
        F.regexp_extract("path", _NAME_RE, 2).alias("edinetCode"),
        # optional group: legacy 3-part names extract "" → NULL
        F.nullif(F.regexp_extract("path", _NAME_RE, 3), F.lit("")).alias(
            "docTypeCode"
        ),
        F.regexp_extract("path", _DT_RE, 1).alias("submitDateTime"),
        F.when(F.regexp_extract("path", _NAME_RE, 4) == "5", "csv")
        .otherwise("xbrl")
        .alias("file_type"),
        F.row_number().over(w).cast("long").alias("arrival_idx"),
        "content",
    )
