"""Company-master dimension source (S1/P1-P5 in SURVEY.md §2).

Reference behavior (``/root/reference/src/extract.py:23-69``): read the
EDINET company-master CSV (cp932/Shift-JIS), keep 6 of 13 columns,
filter to listed + consolidated companies with a non-null alphabetic
name, optionally exclude industries.

Spark-first shape: explicit ``StructType`` (no inference — SURVEY
§1.3), charset option on the CSV reader, and plain relational
filter/project so Catalyst prunes columns at the scan.  The master is
~11 k rows — it is the *broadcast* side of every downstream join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# 13 source columns, all read as strings (the reference's pandas read
# treats every kept column as object dtype; ``Capital stock`` is never
# used numerically).  Order matches data/EdinetcodeDlInfo.csv.
COMPANY_MASTER_SCHEMA = T.StructType(
    [
        T.StructField("EDINET Code", T.StringType()),
        T.StructField("Type of Submitter", T.StringType()),
        T.StructField("Listed company / Unlisted company", T.StringType()),
        T.StructField("Consolidated / NonConsolidated", T.StringType()),
        T.StructField("Capital stock", T.StringType()),
        T.StructField("account closing date", T.StringType()),
        T.StructField("Submitter Name", T.StringType()),
        T.StructField("Submitter Name（alphabetic）", T.StringType()),
        T.StructField("Submitter Name（phonetic）", T.StringType()),
        T.StructField("Province", T.StringType()),
        T.StructField("Submitter's industry", T.StringType()),
        T.StructField("Securities Identification Code", T.StringType()),
        T.StructField("Submitter's Japan Corporate Number", T.StringType()),
    ]
)

# P1: the 6 columns the pipeline keeps (src/extract.py:37-44).
COLUMNS_TO_KEEP = [
    "EDINET Code",
    "Listed company / Unlisted company",
    "Consolidated / NonConsolidated",
    "account closing date",
    "Submitter Name（alphabetic）",
    "Submitter's industry",
]


def read_company_master(spark: SparkSession, csv_path: str) -> DataFrame:
    """S1: cp932-encoded CSV scan with an explicit schema
    (``src/extract.py:34``).  Spark 4 whitelists CSV charsets;
    ``legacy.javaCharsets`` opens the full JVM set (cp932/Shift-JIS
    included) — runtime-settable, so safe to pin here."""
    spark.conf.set("spark.sql.legacy.javaCharsets", "true")
    return (
        spark.read.option("header", True)
        .option("encoding", "cp932")
        .schema(COMPANY_MASTER_SCHEMA)
        .csv(csv_path)
    )


def filter_target_companies(
    df: DataFrame, industry_exclude: list[str] | None = None
) -> DataFrame:
    """P1-P5: project to the 6 pipeline columns, keep listed +
    consolidated companies with a non-null alphabetic name
    (``src/extract.py:37-61``); ``industry_exclude`` enables the
    commented-out NOT-IN filter at ``src/extract.py:53-60``."""
    out = (
        df.select(*COLUMNS_TO_KEEP)
        .filter(F.col("Listed company / Unlisted company") == "Listed company")
        .filter(F.col("Consolidated / NonConsolidated") == "Consolidated")
        .filter(F.col("Submitter Name（alphabetic）").isNotNull())
    )
    if industry_exclude:
        out = out.filter(~F.col("Submitter's industry").isin(industry_exclude))
    return out


def extract_companies(
    spark: SparkSession, csv_path: str, industry_exclude: list[str] | None = None
) -> DataFrame:
    """The reference's ``extract_companies`` as one lazy expression."""
    return filter_target_companies(read_company_master(spark, csv_path), industry_exclude)
