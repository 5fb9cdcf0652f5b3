"""SQL entry point (the engine's second declarative surface).

Everything else in this repo uses the DataFrame API; this module
proves the same Catalyst plans are reachable through ``spark.sql`` —
temp views + CTEs + window functions in pure SQL text, the interface
a reference user migrating existing SQL would hit first.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from edinet_etl_spark.registry import query
from edinet_etl_spark.session import prep
from edinet_etl_spark.tables import load

# sql_dsum's exact-decimal discipline, spelled in the dialect common to
# Spark AND DuckDB (``STRING`` is the shared cast name; bare VARCHAR
# fails in Spark).
_DSUM = (
    "CAST(CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount)"
    " AS DECIMAL(18,8))) AS STRING) AS DOUBLE) AS revenue"
)

_SQL = f"""
WITH nation_rev AS (
  SELECT n.n_name, r.r_name,
         {_DSUM}
  FROM lineitem l
  JOIN orders o   ON l.l_orderkey = o.o_orderkey
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation n   ON c.c_nationkey = n.n_nationkey
  JOIN region r   ON n.n_regionkey = r.r_regionkey
  GROUP BY n.n_name, r.r_name
), ranked AS (
  SELECT r_name, n_name, revenue,
         ROW_NUMBER() OVER (PARTITION BY r_name
                            ORDER BY revenue DESC, n_name) AS rk
  FROM nation_rev
)
SELECT r_name, n_name, revenue FROM ranked WHERE rk = 1
"""


@query(
    "sql_top_nation_per_region",
    # the oracle IS the same SQL — DuckDB runs it over its own views
    oracle=_SQL,
    covers=["A-extended", "W-extended", "J1"],
)
def sql_top_nation_per_region(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-revenue nation per region, expressed as pure SQL text
    (CTEs + 5-way join + window).  The exact same string runs in
    DuckDB as the oracle — SQL-level engine interchangeability, the
    strongest form of the parity contract."""
    prep(spark)
    for t in ("lineitem", "orders", "customer", "nation", "region"):
        load(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql(_SQL)
