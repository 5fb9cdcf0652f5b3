"""SparkSession construction tuned for this engine.

Local mode is a single JVM; on a real cluster the same confs hold, with
``spark.sql.shuffle.partitions`` sized to ~2-3x total cores and AQE
coalescing/skew-join left on.  Every conf here is scale-motivated:

- AQE re-plans at runtime (partition coalescing, skew-join splitting,
  broadcast conversion after size discovery) — essential at 100 TB where
  static estimates are wrong.
- Arrow makes every pandas-UDF boundary columnar.
- UTC session timezone pins timestamp semantics so results are
  byte-comparable against external engines (the DuckDB oracle, and any
  warehouse downstream).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def get_spark(app_name: str = "edinet_etl_spark", cpus: str | int | None = None) -> SparkSession:
    """Build (or fetch) a SparkSession with the engine's standard confs."""
    n = str(cpus or DEFAULT_CPUS)
    builder = (
        SparkSession.builder.master(f"local[{n}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", n)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def prep(spark: SparkSession) -> SparkSession:
    """Pin session confs the query surface depends on, idempotently.

    The driver may hand us an arbitrary session; queries assume UTC
    timestamps (oracle comparability) and benefit from AQE.
    """
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    return spark
