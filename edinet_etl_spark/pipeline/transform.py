"""Filing-transform stage (X1/S5/A1/J1/J3/P7-P11/L2/F4-F13).

Reference behavior (``/root/reference/src/transform.py``): pick one
filing per company (type '130' amended beats '120'), parse each filing
(UTF-16 TSV or XBRL) into (context, value, unit) rows, decode relative
years against the fiscal year, skip bad casts/unknown contexts, enrich
with the company dimension, emit
``[year, companyname, industryclassification, geonameen, revenue,
revenue_unit]``.

Spark-first shape: the per-file Python loop disappears.  Parsing is a
minimal ``mapInPandas`` island (bytes → positional rows); *everything
else* — the head-5 limit, the dynamic revenue mask, the fiscal-year
extract, the year decode, cast-skip, the dimension join — is
declarative, so one Catalyst plan covers all files at once.
"""

from __future__ import annotations

import io
import xml.etree.ElementTree as ET
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# J3: relative-year decode (src/transform.py:171-177).
YEAR_OFFSETS = {
    "CurrentYearDuration": 0,
    "Prior1YearDuration": -1,
    "Prior2YearDuration": -2,
    "Prior3YearDuration": -3,
    "Prior4YearDuration": -4,
}

FACT_SCHEMA = (
    "filename string, arrival_idx long, row_pos long, "
    "element_id string, context_ref string, value string, unit_ref string"
)

_FACT_COLS = [
    "filename",
    "arrival_idx",
    "row_pos",
    "element_id",
    "context_ref",
    "value",
    "unit_ref",
]


def select_best_filings(filings: DataFrame) -> DataFrame:
    """A1 priority dedup (``src/transform.py:109-145``): one filing per
    company; any type-'130' filing beats non-130; among 130s the
    reference's ``company_files[code] = path`` overwrite means the
    *last-seen* 130 wins, while among non-130s the dict-insert guard
    means the *first-seen* wins.  Pinned with the explicit arrival
    index (SURVEY §2.11d)."""
    code = F.regexp_extract("filename", r"(E\d+)_\d+_(\d+)\.(csv|xbrl)", 1)
    dtype = F.regexp_extract("filename", r"(E\d+)_\d+_(\d+)\.(csv|xbrl)", 2)
    is_130 = (F.col("doc_type_f") == "130").cast("int")
    tie = F.when(F.col("doc_type_f") == "130", -F.col("arrival_idx")).otherwise(
        F.col("arrival_idx")
    )
    w = Window.partitionBy("company_code").orderBy(F.desc(is_130), F.asc(tie))
    return (
        filings.withColumn("company_code", code)
        .withColumn("doc_type_f", dtype)
        .filter(F.col("company_code") != "")  # non-matching names dropped (:127-128)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn", "doc_type_f")
    )


def parse_filing_csv(filings: DataFrame) -> DataFrame:
    """S5+P7 prep: decode UTF-16 tab-separated filing bytes into
    positional rows.  Only the *decode* happens in Python; the
    reference's row-1 mask (P7), DEI extract (P8) and head-5 (L2) are
    applied relationally in :func:`csv_revenue_facts`."""

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                try:
                    df = pd.read_csv(
                        io.BytesIO(r.member_bytes), sep="\t", encoding="utf-16"
                    )
                except Exception:  # noqa: BLE001 — unparseable filing → skip
                    continue
                for pos, row in enumerate(df.itertuples(index=False)):
                    vals = dict(zip(df.columns, row))
                    rows.append(
                        (
                            r.filename,
                            r.arrival_idx,
                            pos,
                            str(vals.get("要素ID", "")),
                            str(vals.get("コンテキストID", "")),
                            None if pd.isna(vals.get("値")) else str(vals.get("値")),
                            None
                            if pd.isna(vals.get("ユニットID"))
                            else str(vals.get("ユニットID")),
                        )
                    )
            yield pd.DataFrame(rows, columns=_FACT_COLS)

    return filings.filter(F.col("file_type") == "csv").mapInPandas(
        parse, schema=FACT_SCHEMA
    )


def csv_revenue_facts(parsed: DataFrame) -> DataFrame:
    """P7/P8/L2 on the positional rows, all declarative:

    - revenue mask = ``要素ID`` at positional row 1 (pandas
      ``df.loc[1]``, ``src/transform.py:94``) — a per-file dynamic
      value, expressed as a window max over ``row_pos == 1``;
    - fiscal year = year of the DEI row's value (``:99-102``);
    - first 5 mask rows in file order (``:98``).
    """
    w = Window.partitionBy("filename")
    mask = F.max(F.when(F.col("row_pos") == 1, F.col("element_id"))).over(w)
    fiscal = F.max(
        F.when(
            F.col("element_id") == "jpdei_cor:CurrentFiscalYearEndDateDEI",
            F.year(F.to_date(F.col("value"))),
        )
    ).over(w)
    wn = Window.partitionBy("filename").orderBy("row_pos")
    return (
        parsed.withColumn("revenue_mask", mask)
        .withColumn("fiscal_year", fiscal)
        .filter(F.col("element_id") == F.col("revenue_mask"))
        .withColumn("rev_rn", F.row_number().over(wn))
        .filter(F.col("rev_rn") <= 5)
        .filter(F.col("fiscal_year").isNotNull())  # no DEI row → skip file
        .select(
            "filename",
            "arrival_idx",
            "context_ref",
            "value",
            "unit_ref",
            "fiscal_year",
        )
    )


def parse_filing_xbrl(filings: DataFrame) -> DataFrame:
    """X1 UDTF (``src/transform.py:11-74``): fiscal year from the first
    parseable ``CurrentPeriodEndDateDEI``; revenue rows = the 5
    elements after the first ``NumberOfSubmissionDEI`` marker that
    carry a contextRef and text; ``unitRef`` defaults to 'JPY' (F13).

    Fixes the reference's unbound-``fiscal_year`` bug (SURVEY §2.11a):
    a file with no parseable fiscal date emits nothing instead of
    raising NameError."""

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                try:
                    root = ET.fromstring(r.member_bytes)
                except Exception:  # noqa: BLE001 — malformed XML → skip
                    continue
                elements = list(root.iter())
                fiscal_year = None
                for elem in elements:
                    if elem.tag.endswith("CurrentPeriodEndDateDEI") and elem.text:
                        try:
                            fiscal_year = pd.to_datetime(elem.text).year
                            break
                        except Exception:  # noqa: BLE001 — keep scanning
                            continue
                if fiscal_year is None:
                    continue
                for i, elem in enumerate(elements):
                    if "NumberOfSubmissionDEI" in elem.tag:
                        for j in range(1, 6):
                            if i + j < len(elements):
                                rev = elements[i + j]
                                ctx = rev.get("contextRef")
                                if ctx and rev.text:
                                    rows.append(
                                        (
                                            r.filename,
                                            r.arrival_idx,
                                            fiscal_year,
                                            ctx,
                                            rev.text,
                                            rev.get("unitRef", "JPY"),
                                        )
                                    )
                        break
            yield pd.DataFrame(
                rows,
                columns=[
                    "filename",
                    "arrival_idx",
                    "fiscal_year",
                    "context_ref",
                    "value",
                    "unit_ref",
                ],
            )

    return filings.filter(F.col("file_type") == "xbrl").mapInPandas(
        parse,
        schema=(
            "filename string, arrival_idx long, fiscal_year int, "
            "context_ref string, value string, unit_ref string"
        ),
    )


def revenue_facts(filings: DataFrame) -> DataFrame:
    """P12 format dispatch: CSV and XBRL branches, unioned into one
    fact stream of (filename, fiscal_year, context_ref, value,
    unit_ref)."""
    csv_facts = csv_revenue_facts(parse_filing_csv(filings))
    xbrl_facts = parse_filing_xbrl(filings).select(
        "filename", "arrival_idx", "context_ref", "value", "unit_ref", "fiscal_year"
    )
    return csv_facts.unionByName(xbrl_facts)


def decode_and_enrich(facts: DataFrame, companies: DataFrame) -> DataFrame:
    """J3+P11 year decode, P10 cast-skip, F13 unit default, J1
    broadcast company join, final schema (``src/transform.py:187-213``).

    The 5-key year map is a literal broadcast-joined DataFrame —
    unknown contexts drop out of the inner join exactly like the
    reference's ``year_mapping.get(...) is None: continue``."""
    spark = facts.sparkSession
    offsets = spark.createDataFrame(
        list(YEAR_OFFSETS.items()), "context_ref string, year_offset int"
    )
    dim = companies.select(
        F.col("EDINET Code").alias("company_code"),
        F.col("Submitter Name（alphabetic）").alias("companyname"),
        F.col("Submitter's industry").alias("industryclassification"),
    )
    code = F.split(F.col("filename"), "_")[0]  # F5 (src/transform.py:161)
    return (
        facts.withColumn("company_code", code)
        .join(F.broadcast(offsets), "context_ref", "inner")  # J3 + P11
        .withColumn("revenue", F.col("value").try_cast("long"))  # F10
        .filter(F.col("revenue").isNotNull())  # P10
        .join(F.broadcast(dim), "company_code", "inner")  # J1 + P9
        .select(
            (F.col("fiscal_year") + F.col("year_offset")).alias("year"),  # F11
            "companyname",
            "industryclassification",
            F.lit("Japan").alias("geonameen"),  # F12
            "revenue",
            F.coalesce(F.col("unit_ref"), F.lit("JPY")).alias("revenue_unit"),  # F13
        )
    )


def process_financial_documents(filings: DataFrame, companies: DataFrame) -> DataFrame:
    """The reference's ``process_financial_documents`` as one lazy
    plan: A1 best-filing dedup → parse → decode → enrich."""
    return decode_and_enrich(revenue_facts(select_best_filings(filings)), companies)
