"""Reference-parity pipeline tests (SURVEY.md §5 strategy #2/#3).

Offline end-to-end: recorded API fixtures (FIXTURES.md §B) through the
full Spark ETL, compared against hand-computed goldens — plus targeted
unit tests for each reference-specific semantic: A1 130-beats-120
dedup (with the last-130 / first-non-130 tie rules), A2 largest
member, P10 cast skip, P11 unknown-context skip, L2 head-5, F13 unit
default, the fixed unbound-fiscal-year XBRL behavior (§2.11a), ZIP
error paths, empty-input sink guard, and retry swallow semantics.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from edinet_etl_spark.pipeline.config import PipelineConfig
from edinet_etl_spark.pipeline.etl import ingest_filings, run_pipeline
from edinet_etl_spark.pipeline.load import load_to_csv
from edinet_etl_spark.pipeline.transform import (
    parse_filing_xbrl,
    process_financial_documents,
    select_best_filings,
)
from edinet_etl_spark.sources import company_master, edinet_api
from edinet_etl_spark.sources.edinet_api import RetryPolicy, _PartitionLimiter, _with_retries
from tests.fixtures.gen import (
    GOLDEN,
    XBRL_NO_FISCAL,
    XBRL_VALID,
    FixtureFetcher,
    FlakyFetcher,
    build_all,
)


@pytest.fixture(scope="module")
def fixture_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("edinet_fixtures")
    build_all(root)
    return str(root)


@pytest.fixture(scope="module")
def cfg(fixture_root, tmp_path_factory):
    out = tmp_path_factory.mktemp("edinet_out")
    return PipelineConfig(
        csv_file=f"{fixture_root}/company_master.csv",
        output_dir=str(out),
        start_date="2024-06-01",
        end_date="2024-06-04",
        companies_to_get=None,
        fetch_partitions=2,
        retry_delay=0.001,
    )


def test_company_master_filters(spark, fixture_root):
    """B1: cp932 scan + P1-P4 leave exactly the 5 qualifying rows."""
    df = company_master.extract_companies(
        spark, f"{fixture_root}/company_master.csv"
    )
    codes = sorted(r["EDINET Code"] for r in df.collect())
    assert codes == ["E00001", "E00002", "E00006", "E00007"]
    # P5 industry exclusion (the commented-out reference feature)
    df2 = company_master.extract_companies(
        spark, f"{fixture_root}/company_master.csv", industry_exclude=["Banks"]
    )
    assert sorted(r["EDINET Code"] for r in df2.collect()) == [
        "E00001", "E00002", "E00007",
    ]


def test_list_and_filter_documents(spark, fixture_root, cfg):
    """S2/F2/J2/P6: date-range fetch explodes results; semi-join +
    doc-type filter keep exactly the targeted docs."""
    fetcher = FixtureFetcher(fixture_root)
    dates = edinet_api.date_range(spark, cfg.start_date, cfg.end_date)
    assert dates.count() == 4
    docs = edinet_api.list_documents(dates, fetcher, num_partitions=2)
    assert sorted(r["docID"] for r in docs.collect()) == [
        "D001", "D002", "D003", "D004", "D005", "D006", "D007", "D009",
    ]
    companies = company_master.extract_companies(
        spark, f"{fixture_root}/company_master.csv"
    )
    kept = edinet_api.filter_documents(docs, companies, ["120", "130"])
    # D004 unknown company, D005 bad type dropped; D006 still here (flag
    # dispatch happens at download time, src/extract.py:176-184)
    assert sorted(r["docID"] for r in kept.collect()) == [
        "D001", "D002", "D003", "D006", "D007", "D009",
    ]


def test_end_to_end_golden(spark, fixture_root, cfg):
    """The full offline pipeline reproduces the hand-computed B6 rows:
    A1 dedup discards D002's XBRL (5555 must not appear), bad casts and
    unknown contexts are skipped, missing unit defaults to JPY."""
    companies, filings = ingest_filings(spark, cfg, FixtureFetcher(fixture_root))
    final = process_financial_documents(filings, companies)
    rows = sorted(
        (r["year"], r["companyname"], r["industryclassification"],
         r["geonameen"], r["revenue"], r["revenue_unit"])
        for r in final.collect()
    )
    assert rows == GOLDEN
    assert all(r[4] != 5555 for r in rows)  # deduped XBRL never parsed


def test_run_pipeline_writes_csv(spark, fixture_root, cfg, tmp_path):
    """S7: end-to-end run writes a single readable CSV."""
    import glob

    out_dir = run_pipeline(spark, cfg, FixtureFetcher(fixture_root))
    assert out_dir is not None
    files = glob.glob(f"{out_dir}/*.csv")
    assert len(files) == 1  # coalesce(1) single-file parity
    back = spark.read.option("header", True).csv(out_dir)
    assert back.count() == len(GOLDEN)
    assert back.columns == [
        "year", "companyname", "industryclassification",
        "geonameen", "revenue", "revenue_unit",
    ]


def test_zip_error_paths(spark, fixture_root, cfg):
    """B5: corrupt ZIP (D009) and no-matching-member ZIP (D007) emit no
    filings; D001's largest .csv member wins (A2)."""
    _, filings = ingest_filings(spark, cfg, FixtureFetcher(fixture_root))
    got = {r["docID"]: r["filename"] for r in filings.collect()}
    assert set(got) == {"D001", "D002", "D003"}
    assert got["D001"] == "E00001_20240601_120.csv"
    assert got["D002"] == "E00002_20240601_120.xbrl"


def test_select_best_filings_tie_rules(spark):
    """A1 exact dict-semantics: any 130 beats non-130; LAST-seen 130
    wins among 130s (reference overwrites on every 130); FIRST-seen
    wins among non-130s (dict-insert guard).  src/transform.py:133."""
    rows = [
        ("E00001_20240101_120.csv", 1, "csv", b""),
        ("E00001_20240102_120.csv", 2, "csv", b""),   # first 120 wins → idx 1
        ("E00002_20240101_130.csv", 3, "csv", b""),
        ("E00002_20240102_130.csv", 4, "csv", b""),   # last 130 wins → idx 4
        ("E00003_20240101_120.csv", 5, "csv", b""),
        ("E00003_20240102_130.csv", 6, "csv", b""),   # 130 beats earlier 120
        ("not-a-filing.txt", 7, "csv", b""),          # regex miss → dropped
    ]
    df = spark.createDataFrame(
        rows, "filename string, arrival_idx long, file_type string, member_bytes binary"
    )
    best = {r["company_code"]: r["arrival_idx"]
            for r in select_best_filings(df).collect()}
    assert best == {"E00001": 1, "E00002": 4, "E00003": 6}


def test_xbrl_parse_semantics(spark):
    """X1: marker-relative extraction; element without contextRef
    skipped; unitRef defaults to JPY; no-fiscal-year file emits nothing
    (fixed §2.11a behavior)."""
    df = spark.createDataFrame(
        [
            ("E00002_20240601_120.xbrl", 1, "xbrl", bytearray(XBRL_VALID)),
            ("E00009_20240601_120.xbrl", 2, "xbrl", bytearray(XBRL_NO_FISCAL)),
        ],
        "filename string, arrival_idx long, file_type string, member_bytes binary",
    )
    out = parse_filing_xbrl(df).collect()
    by_ctx = {r["context_ref"]: r for r in out}
    assert all(r["filename"].startswith("E00002") for r in out)
    # 4 of the 5 post-marker elements carry contextRef+text; the bare
    # <Revenue>2222</Revenue> is skipped (src/transform.py:60)
    assert sorted(by_ctx) == [
        "CurrentYearDuration", "Prior1YearDuration",
        "Prior2YearDuration", "Prior3YearDuration",
    ]
    assert by_ctx["Prior2YearDuration"]["unit_ref"] == "JPY"  # F13 default
    assert all(r["fiscal_year"] == 2024 for r in out)


def test_retry_swallow_and_recover(spark, fixture_root, cfg):
    """Reference retry semantics: transient failures recover; permanent
    failures are swallowed → missing rows, not job failure."""
    fetcher = FlakyFetcher(
        fixture_root, fail_times=1, always_fail=("list:2024-06-02", "doc:D001")
    )
    dates = edinet_api.date_range(spark, cfg.start_date, cfg.end_date)
    policy = RetryPolicy(max_retries=2, retry_delay=0.001)
    docs = edinet_api.list_documents(dates, fetcher, policy, num_partitions=1)
    ids = sorted(r["docID"] for r in docs.collect())
    # 2024-06-02's docs (D003/D005/D006) are missing; the rest recovered
    assert ids == ["D001", "D002", "D004", "D007", "D009"]
    dl = edinet_api.download_documents(docs, fetcher, policy=policy, num_partitions=1)
    assert "D001" not in {r["docID"] for r in dl.collect()}


def test_partition_limiter_and_retry_unit():
    """_with_retries returns the value on eventual success and None
    after exhausting retries."""
    calls = {"n": 0}

    def flaky():
        calls["n"] += 1
        if calls["n"] < 3:
            raise OSError("boom")
        return "ok"

    limiter = _PartitionLimiter(per_second=0)
    policy = RetryPolicy(max_retries=3, retry_delay=0.0001)
    assert _with_retries(flaky, policy, limiter) == "ok"
    assert calls["n"] == 3
    assert _with_retries(lambda: (_ for _ in ()).throw(OSError()), policy, limiter) is None


def test_empty_sink_guard(spark, tmp_path, caplog):
    """S8: empty input → no write + warning (src/load.py:20-22,
    tests/test_load.py:33-45)."""
    import logging

    empty = spark.createDataFrame([], "year int, revenue long")
    with caplog.at_level(logging.WARNING, logger="edinet_etl_spark.pipeline.load"):
        result = load_to_csv(empty, str(tmp_path), "nothing")
    assert result is None
    assert not (tmp_path / "nothing").exists()
    assert any("empty" in r.message.lower() for r in caplog.records)


def test_observed_write_metrics(spark, tmp_path):
    """The Observation-API write reports row count / exact revenue total
    / null counts measured on the write pass itself (S7 monitoring
    parity — the reference logs re-scanned counts; we ride the action)."""
    from edinet_etl_spark.pipeline.load import load_to_csv_observed

    df = spark.createDataFrame(
        [(2021, "A", 100), (2022, "A", 250), (2022, "B", None)],
        "year int, companyname string, revenue long",
    )
    target, metrics = load_to_csv_observed(df, str(tmp_path), "observed")
    assert target is not None
    assert metrics["n_rows"] == 3
    assert metrics["revenue_total"] == "350"
    assert metrics["null_revenue"] == 1
    # the write actually happened with all rows
    import glob

    files = glob.glob(f"{target}/*.csv")
    assert files
    body = "".join(open(f).read() for f in files)
    assert body.count("\n") == 4  # header + 3 rows


def test_observed_metrics_multi_partition(spark, tmp_path):
    """Regression: Observation.get captures the FIRST action on the
    observed plan.  Before the fix, the empty-guard's isEmpty() probe
    consumed the observation, reporting one take(1) row per partition
    (8 for this frame) instead of the written 1000."""
    from pyspark.sql import functions as F

    from edinet_etl_spark.pipeline.load import load_to_csv_observed

    df = (
        spark.range(0, 1000, numPartitions=8)
        .select(F.col("id").cast("long").alias("revenue"))
    )
    target, metrics = load_to_csv_observed(
        df, str(tmp_path), "observed_mp", single_file=False
    )
    assert target is not None
    assert metrics["n_rows"] == 1000
    assert metrics["revenue_total"] == str(sum(range(1000)))


def test_binary_lake_ingestion(spark, tmp_path):
    """S3's pre-fetched-directory mapping: ZIPs landed on storage by an
    upstream collector, read via the `binaryFile` source, explode
    through the SAME ZIP UDTF as the HTTP path, members intact."""
    import io
    import zipfile

    from edinet_etl_spark.sources.binary_lake import read_filing_lake
    from edinet_etl_spark.sources.zip_extract import explode_zip_members

    lake = tmp_path / "lake" / "dt=2024-06-01"
    lake.mkdir(parents=True)

    def zip_bytes(members: dict[str, bytes]) -> bytes:
        buf = io.BytesIO()
        with zipfile.ZipFile(buf, "w") as zf:
            for name, data in members.items():
                zf.writestr(name, data)
        return buf.getvalue()

    # full 4-part names carry the EDINET form code (docTypeCode)
    (lake / "D001_E00001_120_5.zip").write_bytes(
        zip_bytes({"a/main.csv": b"x" * 10, "a/side.csv": b"y" * 99})
    )
    (lake / "D002_E00002_130_1.zip").write_bytes(
        zip_bytes({"b/report.xbrl": b"<xbrl/>"})
    )
    # legacy 3-part name: file type only, docTypeCode honestly NULL
    (lake / "broken_E9_1.zip").write_bytes(b"not a zip")

    filings = read_filing_lake(spark, str(tmp_path / "lake"))
    rows = {r["docID"]: r for r in filings.collect()}
    assert set(rows) == {"D001", "D002", "broken"}
    assert rows["D001"]["file_type"] == "csv"
    assert rows["D001"]["docTypeCode"] == "120"
    assert rows["D001"]["submitDateTime"] == "2024-06-01"
    assert rows["D002"]["file_type"] == "xbrl"
    # the amendment-priority key survives lake ingestion (the A1
    # '130'-beats-'120' rule depends on it)
    assert rows["D002"]["docTypeCode"] == "130"
    assert rows["broken"]["docTypeCode"] is None
    assert rows["broken"]["file_type"] == "xbrl"

    members = explode_zip_members(filings).collect()
    got = {(m["docID"], m["member_name"]): m["member_size"] for m in members}
    # corrupt zip skipped; real members exploded with true sizes
    assert got == {
        ("D001", "a/main.csv"): 10,
        ("D001", "a/side.csv"): 99,
        ("D002", "b/report.xbrl"): 7,
    }
