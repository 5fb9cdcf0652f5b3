"""End-to-end EDINET ETL on Spark (SURVEY.md §3 lifecycle).

The reference's five eager stages (``/root/reference/main.py:13-40``)
become two Spark jobs:

1. **Ingestion** (UDF islands, executor-side HTTP): company master →
   date range → list fetch → semi-join filter → download → unzip.
2. **Analytics** (one Catalyst plan): best-filing dedup → parse →
   year decode → dimension join → final table → CSV sink.

Injection of ``Fetcher`` keeps every test offline (FIXTURES.md §B).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from edinet_etl_spark.pipeline.config import PipelineConfig
from edinet_etl_spark.pipeline.load import load_to_csv
from edinet_etl_spark.pipeline.transform import process_financial_documents
from edinet_etl_spark.sources import company_master, edinet_api, zip_extract
from edinet_etl_spark.sources.edinet_api import Fetcher, RetryPolicy


def ingest_filings(
    spark: SparkSession, cfg: PipelineConfig, fetcher: Fetcher
) -> tuple[DataFrame, DataFrame]:
    """Stages 1-4 (``main.py:15-28``): returns (companies, filings)."""
    companies = company_master.extract_companies(spark, cfg.csv_file)
    dates = edinet_api.date_range(spark, cfg.start_date, cfg.end_date)
    policy = RetryPolicy(
        max_retries=cfg.max_retries,
        retry_delay=cfg.retry_delay,
        requests_per_second=cfg.request_per_second,
    )
    docs = edinet_api.list_documents(
        dates, fetcher, policy, num_partitions=cfg.fetch_partitions
    )
    targeted = edinet_api.filter_documents(docs, companies, cfg.target_doc_types)
    downloads = edinet_api.download_documents(
        targeted,
        fetcher,
        companies_to_get=cfg.companies_to_get,
        policy=RetryPolicy(
            max_retries=cfg.max_retries,
            retry_delay=cfg.retry_delay,
            requests_per_second=cfg.request_per_second,
            jitter_base=0.5,
        ),
        num_partitions=cfg.fetch_partitions,
    )
    return companies, zip_extract.extract_filings(downloads)


def run_pipeline(
    spark: SparkSession, cfg: PipelineConfig, fetcher: Fetcher
) -> str | None:
    """Full pipeline (``main.py:13-40``): returns the output dir, or
    None when no data survived (S8 guard)."""
    companies, filings = ingest_filings(spark, cfg, fetcher)
    final = process_financial_documents(filings, companies)
    return load_to_csv(final, cfg.output_dir, "japan_company_data")


def main(argv: list[str] | None = None) -> int:
    """CLI entry (parity with the reference's ``main.py:13-40``):
    ``python -m edinet_etl_spark.pipeline.etl --csv-file ... --api-key
    ...``.  Runs the live pipeline; every setting mirrors a
    ``config/settings.env`` knob of the reference."""
    import argparse

    from edinet_etl_spark.session import get_spark
    from edinet_etl_spark.sources.edinet_api import HttpFetcher

    d = PipelineConfig()
    p = argparse.ArgumentParser(description="EDINET revenue ETL on Spark")
    p.add_argument("--csv-file", default=d.csv_file)
    p.add_argument("--output-dir", default=d.output_dir)
    p.add_argument("--start-date", default=d.start_date)
    p.add_argument("--end-date", default=d.end_date)
    p.add_argument("--base-url", default=d.base_url)
    p.add_argument("--api-key", default=d.api_key)
    p.add_argument("--companies-to-get", type=int, default=d.companies_to_get)
    p.add_argument("--request-per-second", type=float, default=d.request_per_second)
    a = p.parse_args(argv)
    cfg = PipelineConfig(
        base_url=a.base_url,
        api_key=a.api_key,
        csv_file=a.csv_file,
        output_dir=a.output_dir,
        start_date=a.start_date,
        end_date=a.end_date,
        companies_to_get=a.companies_to_get,
        request_per_second=a.request_per_second,
    )
    spark = get_spark("edinet-etl")
    out = run_pipeline(spark, cfg, HttpFetcher(cfg.base_url, cfg.api_key))
    print(out if out else "no data written")
    return 0 if out else 1


if __name__ == "__main__":
    raise SystemExit(main())
