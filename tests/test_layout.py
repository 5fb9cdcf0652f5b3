"""Plan-level assertions for the lake-layout claims in SCALE.md:
bucketed joins plan without Exchange; date partitioning produces
PartitionFilters pruning."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from edinet_etl_spark import layout
from edinet_etl_spark.tables import load

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def warehouse(spark, tmp_path_factory):
    layout.write_bucketed_join_tables(
        spark, SF_DIR, str(tmp_path_factory.mktemp("wh"))
    )
    return spark


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_bucketed_join_has_no_exchange(warehouse):
    spark = warehouse
    # AQE off for this check: with it on, the final plan string hides
    # inside AdaptiveSparkPlan until execution
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        df = layout.bucketed_join(spark)
        joined_plan = _plan(
            spark.table("lake.lineitem_bucketed").join(
                spark.table("lake.orders_bucketed"),
                F.col("l_orderkey") == F.col("o_orderkey"),
            )
        )
        assert "Exchange" not in joined_plan  # co-located buckets
        assert "SortMergeJoin" in joined_plan
        # and the result still matches the plain-table join
        plain = (
            load(spark, SF_DIR, "lineitem")
            .join(
                load(spark, SF_DIR, "orders"),
                F.col("l_orderkey") == F.col("o_orderkey"),
            )
            .groupBy("o_orderpriority")
            .agg(F.count("*").alias("n"))
        )
        assert sorted(map(tuple, df.collect())) == sorted(
            map(tuple, plain.collect())
        )
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")


def test_date_partition_pruning(spark, tmp_path):
    out = str(tmp_path / "events_by_date")
    layout.write_date_partitioned_events(spark, SF_DIR, out)
    day_df = layout.read_one_day(spark, out, "2024-01-03")
    plan = _plan(day_df)
    assert "PartitionFilters: [" in plan
    assert "event_date" in plan.split("PartitionFilters:")[1].split("]")[0]
    # pruned read returns exactly that day's events
    expected = (
        load(spark, SF_DIR, "events")
        .filter(F.to_date("ts") == "2024-01-03")
        .count()
    )
    assert day_df.count() == expected


def test_compaction_reduces_file_count(spark, tmp_path):
    from edinet_etl_spark import layout

    frag = str(tmp_path / "fragmented")
    # fragment: 64 tiny files
    load(spark, SF_DIR, "orders").repartition(64).write.parquet(frag)
    import os

    n_in = sum(1 for f in os.listdir(frag) if f.endswith(".parquet"))
    assert n_in == 64
    out = str(tmp_path / "compacted")
    n_out = layout.compact(spark, frag, out)
    assert n_out == 1  # tiny table → single file at the 128MB target
    assert (
        spark.read.parquet(out).count()
        == load(spark, SF_DIR, "orders").count()
    )


def test_format_roundtrips_orc_jsonl(spark, tmp_path):
    """Format interchange: ORC (self-describing) and JSON-lines
    (schema-on-read) both round-trip the same rows; the JSON read uses
    an explicit schema (timestamps don't survive text inference)."""
    from edinet_etl_spark.layout import roundtrip_format
    from edinet_etl_spark.tables import load

    src = (
        load(spark, SF_DIR, "lineitem")
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_shipdate")
        .limit(200)
    )
    expected = sorted(map(tuple, src.collect()))

    orc = roundtrip_format(src, str(tmp_path / "orc"), "orc")
    assert sorted(map(tuple, orc.collect())) == expected
    assert orc.schema == src.schema  # ORC carries types

    jsonl = roundtrip_format(
        src,
        str(tmp_path / "jsonl"),
        "json",
        schema="l_orderkey bigint, l_linenumber int, l_quantity double, "
        "l_shipdate timestamp_ntz",
    )
    assert sorted(map(tuple, jsonl.collect())) == expected
