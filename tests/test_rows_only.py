"""Tightened checks for the two queries the DuckDB oracle cannot
value-match (approximate / engine-internal results) — without these,
their driver check is rows-only and a wrong-but-right-cardinality
result would slip through."""

from __future__ import annotations

from pyspark.sql import functions as F

from edinet_etl_spark import registry
from edinet_etl_spark.operators.multimodal import FEATURE_DIM
from edinet_etl_spark.tables import load

SF_DIR = "/root/testdata/sf0.01"

registry.load_all()


def test_approx_distinct_within_error_bound(spark):
    """HLL approx distinct counts must land within 5% of exact (HLL's
    standard error at default precision is ~2.3%)."""
    rows = registry.QUERIES["approx_distinct_parts"](spark, SF_DIR).collect()
    assert rows, "approx query returned nothing"
    li = load(spark, SF_DIR, "lineitem")
    exact = {
        r["l_returnflag"]: r["n"]
        for r in li.groupBy("l_returnflag")
        .agg(F.count_distinct("l_partkey").alias("n"))
        .collect()
    }
    for row in rows:
        e = exact[row["l_returnflag"]]
        assert abs(row["approx_parts"] - e) <= max(1, 0.05 * e), (
            row["l_returnflag"], row["approx_parts"], e,
        )


def test_multimodal_features_deterministic_and_normalized(spark):
    """The stub feature is a normalized byte histogram: deterministic
    across runs, FEATURE_DIM wide, summing to ~1.  (The registered
    query now projects the md5 fingerprint for its oracle; the float
    array rides the same kernel and is checked here.)"""
    from edinet_etl_spark.operators.multimodal import (
        _DECODE_SCHEMA,
        _decode_batches,
        with_media_columns,
    )

    def decoded():
        media = with_media_columns(load(spark, SF_DIR, "documents"))
        df = media.mapInPandas(_decode_batches, schema=_DECODE_SCHEMA)
        return {r["doc_id"]: list(r["feature"]) for r in df.collect()}

    a, b = decoded(), decoded()
    assert a == b  # bit-deterministic across runs
    for doc_id, feat in list(a.items())[:50]:
        assert len(feat) == FEATURE_DIM
        assert abs(sum(feat) - 1.0) < 1e-6
