"""Invariant tests for the round-8 operators (beyond the oracle
differential): PAV fit properties, t-closeness EMD bounds, SCD2
point-in-time version correctness vs a direct CASE derivation, aHash
near-dup family recall on the synthetic image groups, and the
PPJoin-graduated ngram join's equality with its brute-force eval arm.
"""

from __future__ import annotations

import pytest

from edinet_etl_spark import registry
from tests.conftest import SF_DIR

registry.load_all()


def _rows(spark, name, sf_dir=None):
    return registry.QUERIES[name](spark, sf_dir or SF_DIR).collect()


# ------------------------------------------------------------- isotonic PAV

def test_isotonic_fit_is_monotone_and_pools_correctly(spark):
    rows = sorted(_rows(spark, "isotonic_calibration_pav"), key=lambda r: r["bin"])
    fits = [r["isotonic_rate"] for r in rows]
    # monotone non-decreasing by construction
    assert all(a <= b for a, b in zip(fits, fits[1:]))
    # each pooled level's weighted mean equals the raw weighted mean of
    # its pool (the defining PAV property): group consecutive equal fits
    i = 0
    while i < len(rows):
        j = i
        while j + 1 < len(rows) and fits[j + 1] == fits[i]:
            j += 1
        pool = rows[i : j + 1]
        n = sum(r["n"] for r in pool)
        pos = sum(r["n_pos"] for r in pool)
        assert fits[i] == pytest.approx(pos / n, abs=1e-12)
        i = j + 1
    # fit preserves total mass: sum fit_i * n_i == total positives
    assert sum(r["isotonic_rate"] * r["n"] for r in rows) == pytest.approx(
        sum(r["n_pos"] for r in rows), rel=1e-12
    )


# ------------------------------------------------------------ t-closeness

def test_t_closeness_emd_bounds_and_global_cell(spark):
    rows = _rows(spark, "t_closeness_audit")
    assert rows
    for r in rows:
        assert 0.0 <= r["emd"] <= 1.0
        assert r["meets_t"] in (0, 1)
        assert r["meets_t"] == (1 if r["emd"] <= 0.2 else 0)
    # population is conserved across cells
    from edinet_etl_spark.tables import load

    n_cust = load(spark, SF_DIR, "customer").count()
    assert sum(r["n_individuals"] for r in rows) == n_cust


# ------------------------------------------------- SCD2 point-in-time join

def test_scd2_pit_matches_direct_case_derivation(spark):
    """The as-of join must pick exactly the version valid at the order
    date — derivable directly with a CASE over the change date."""
    from pyspark.sql import functions as F

    from edinet_etl_spark.numeric import dec, _dec_to_double
    from edinet_etl_spark.operators.temporal import _PIT_CHANGE, _PIT_NEWSEG
    from edinet_etl_spark.tables import load

    got = {
        r["segment_at_order"]: (r["n_orders"], r["revenue"])
        for r in _rows(spark, "scd2_point_in_time_join")
    }
    orders = load(spark, SF_DIR, "orders")
    cust = load(spark, SF_DIR, "customer").select("c_custkey", "c_mktsegment")
    seg = F.when(
        (F.col("c_custkey") % 3 == 0)
        & (F.col("o_orderdate") >= F.to_timestamp(F.lit(_PIT_CHANGE))),
        F.lit(_PIT_NEWSEG),
    ).otherwise(F.col("c_mktsegment"))
    want = {
        r["segment_at_order"]: (r["n_orders"], r["revenue"])
        for r in orders.join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy(seg.alias("segment_at_order"))
        .agg(
            F.count("*").cast("bigint").alias("n_orders"),
            _dec_to_double(F.sum(dec(F.col("o_totalprice")))).alias("revenue"),
        )
        .collect()
    }
    assert got == want


# ------------------------------------------------------ image aHash dedup

def test_image_ahash_families_pair_up(spark):
    """Docs in the same synthetic image family (doc_id stride groups)
    differ by ONE pixel — every family pair must surface at a small
    Hamming distance, and no pair may exceed the declared radius."""
    from edinet_etl_spark.operators.multimodal import (
        _AHASH_GROUPS,
        _AHASH_MAXHAM,
    )
    from edinet_etl_spark.tables import load

    rows = _rows(spark, "image_ahash_neardup")
    assert rows
    pairs = {(r["doc_a"], r["doc_b"]) for r in rows}
    assert all(r["hamming"] <= _AHASH_MAXHAM for r in rows)
    doc_ids = [
        r["doc_id"]
        for r in load(spark, SF_DIR, "documents").select("doc_id").collect()
    ]
    by_group: dict[int, list[int]] = {}
    for d in doc_ids:
        by_group.setdefault(d % _AHASH_GROUPS, []).append(d)
    n_family_pairs = 0
    n_found = 0
    for g, members in by_group.items():
        members.sort()
        for i in range(len(members)):
            for j in range(i + 1, len(members)):
                n_family_pairs += 1
                if (members[i], members[j]) in pairs:
                    n_found += 1
    # one-pixel perturbations keep block means within threshold almost
    # always; require near-total family recall
    assert n_found / n_family_pairs >= 0.95


# --------------------------------------- PPJoin graduation: completeness

def test_ngram_production_equals_allpairs_eval(spark):
    """The prefix-filtered production form and the brute-force eval arm
    must return the IDENTICAL pair set with identical jaccards — the
    zero-false-negative guarantee, checked directly (the driver checks
    it against DuckDB; this checks the two Spark plans against each
    other)."""
    prod = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in _rows(spark, "ngram_jaccard_pairs")
    }
    base = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in _rows(spark, "ngram_jaccard_allpairs_eval")
    }
    assert prod == base


# ------------------------------------------------- bucketed join audit

def test_bucketed_audit_reports_zero_exchanges(spark):
    rows = _rows(spark, "bucketed_colocated_join_audit")
    assert rows and all(r["n_exchanges_under_join"] == 0 for r in rows)
