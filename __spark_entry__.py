"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

The actual surface lives in ``edinet_etl_spark`` (operators register
themselves in ``edinet_etl_spark.registry``); this module only adapts
it to the driver contract.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from edinet_etl_spark import registry

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    Revenue by nation and year — the reference's final analytics shape
    (``/root/reference/src/transform.py:204-211``) transposed onto the
    TPC-H-ish tables: 5-way join, broadcast dims, exact-decimal sums.
    """
    registry.load_all()
    return registry.QUERIES["revenue_by_nation_year"](spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 (and the
    M3/M5/M6 extensions).  Each callable takes (spark, sf_dir)."""
    return registry.all_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL mirror for each checkable query.
    Queries absent here (approx sketches, stubbed multimodal features)
    get the driver's rows-only check."""
    return registry.all_oracles()
