"""Unit tests for the round-2 giant-bucket/block salting invariants.

The salted sub-bucket split (dedup.salted_buckets and its per-query
twins in similarity.py) is novel semantics: these tests pin the
properties the oracle diff alone can't isolate — completeness (no doc
dropped), the cap bound, determinism, and the linear pair-work bound —
on synthetic buckets engineered to exceed the cap (the sf0.01 fixture
never does, by design).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from edinet_etl_spark.operators.dedup import _MAX_BUCKET, salted_buckets
from edinet_etl_spark.operators.similarity import _IVF_K, _seed_stride


def _bands_df(spark, sizes: dict[str, int]):
    """One synthetic band table: bucket `h` gets `sizes[h]` docs."""
    rows = []
    base = 0
    for h, n in sizes.items():
        for i in range(n):
            rows.append((base + i, 0, h))
        base += 1000
    return spark.createDataFrame(rows, "doc_id long, band_id int, band_hash string")


def test_salted_buckets_complete_and_capped(spark):
    bands = _bands_df(spark, {"a": 150, "b": 64, "c": 65, "d": 1})
    out = salted_buckets(bands, cap=64).collect()
    # every sub-bucket within cap; singleton BUCKETS filtered
    for r in out:
        assert 2 <= len(r["ids"]) <= 64
    # completeness: every doc of every multi-doc bucket appears once —
    # the balanced round-robin split never strands a size-1 remainder
    per_bucket: dict[str, list[int]] = {}
    sizes: dict[str, list[int]] = {}
    for r in out:
        per_bucket.setdefault(r["band_hash"], []).extend(r["ids"])
        sizes.setdefault(r["band_hash"], []).append(len(r["ids"]))
    # "a" = 150 docs, n_sub=3 -> balanced 50+50+50, all docs present
    assert sorted(per_bucket["a"]) == list(range(0, 150))
    assert sorted(sizes["a"]) == [50, 50, 50]
    # "b" = exactly cap -> one intact sub-bucket
    assert sorted(per_bucket["b"]) == list(range(1000, 1064))
    # "c" = cap+1 -> BALANCED split 33+32 (a floor-divide split would
    # strand doc rank 65 alone and cost it every pair in this band)
    assert len(per_bucket["c"]) == 65
    assert sorted(sizes["c"]) == [32, 33]
    # "d" singleton bucket produces nothing
    assert "d" not in per_bucket


def test_salted_buckets_pair_work_is_linear(spark):
    """Pair count from a salted B-doc bucket is ≤ B·cap/2 (linear in
    B), vs B·(B-1)/2 unsalted — the entire point of the salt."""
    B, cap = 150, 64
    bands = _bands_df(spark, {"big": B})
    out = salted_buckets(bands, cap=cap)
    n_pairs = (
        out.select(F.explode("ids").alias("x"), "ids")
        .select("x", F.explode("ids").alias("y"))
        .filter(F.col("x") < F.col("y"))
        .count()
    )
    assert n_pairs <= B * cap / 2
    assert n_pairs == 3 * (50 * 49 // 2)  # balanced 50+50+50


def test_salted_buckets_deterministic(spark):
    bands = _bands_df(spark, {"a": 100, "b": 7})
    one = sorted(map(str, salted_buckets(bands, cap=16).collect()))
    two = sorted(map(str, salted_buckets(bands, cap=16).collect()))
    assert one == two


def test_seed_stride_fixes_k(spark):
    """ceil((max_id+1)/K): the seed count is ~K at every corpus size —
    the round-2 fix for the quadratic n×K assignment."""
    for n in (500, 2000, 20000, 999):
        emb = spark.range(n).select(F.col("id").alias("vec_id"))
        stride = _seed_stride(emb)
        k = emb.filter(F.col("vec_id") % stride == 0).count()
        assert k <= _IVF_K, (n, stride, k)
        assert k >= _IVF_K - 1  # ceil rounding can undershoot by one
    # sf0.01 continuity: 500 vectors -> stride 50, exactly the
    # round-1 constant, so sf0.01 outputs are unchanged
    emb = spark.range(500).select(F.col("id").alias("vec_id"))
    assert _seed_stride(emb) == 50


def test_delta_threshold_scale_relative(spark):
    """Batch threshold = floor(0.8·(max_id+1)) — 400 at sf0.01 (the
    round-1 constant) and proportionally larger at larger SFs."""
    from edinet_etl_spark.operators.dedup import _DELTA_FRACTION

    assert int(_DELTA_FRACTION * 500) == 400
    assert int(_DELTA_FRACTION * 5000) == 4000
