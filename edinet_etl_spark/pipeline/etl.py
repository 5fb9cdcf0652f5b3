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
