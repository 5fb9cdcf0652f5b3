"""Query/oracle registry backing ``__spark_entry__``.

Each operator module registers its queries with the ``@query``
decorator; ``__spark_entry__.queries()`` / ``oracle_sql()`` read the
accumulated dicts.  A query is a ``(spark, sf_dir) -> DataFrame``
callable; its oracle is the equivalent ANSI SQL DuckDB runs over the
same parquet tables (views ``region nation customer supplier part
orders lineitem events documents embeddings``).

Contract discipline (BASELINE.md t2):
- every computed column aliased identically on both sides;
- float aggregates go through ``numeric.dsum`` (order-independent);
- any LIMIT is preceded by a total ORDER BY;
- queries whose semantics aren't SQL-expressible register with
  ``oracle=None`` → the driver records a rows-only check.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}
# SURVEY.md §2 operator ids each query exercises (for COVERAGE.md).
COVERS: dict[str, list[str]] = {}


def query(name: str, oracle: str | None = None, covers: list[str] | None = None) -> Callable[[QueryFn], QueryFn]:
    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name: {name}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        COVERS[name] = covers or []
        return fn

    return deco


def load_all() -> None:
    """Import every operator module so registrations run (idempotent)."""
    from edinet_etl_spark.operators import (  # noqa: F401
        analytics,
        dedup,
        events,
        formats,
        llmdata,
        multimodal,
        pii,
        quality,
        reference_ops,
        relational,
        similarity,
        sketches,
        sql_api,
        subqueries,
        temporal,
        text,
        tpch_rest,
        udf_surface,
    )
    from edinet_etl_spark.streaming import jobs  # noqa: F401


# The driver's correctness sweep checks a ~50-query *prefix* of
# registration order (CORRECTNESS_r01 stopped at 50).  This explicit
# order front-loads one representative per SURVEY §2 row and per
# north-star family — flagship first, then relational/reference_ops
# (the §2.1–§2.10 surface), sql/subquery/udf/multimodal/llmdata-tail/
# temporal/text/similarity/streaming representatives — so a bounded
# sweep still yields a hard correctness signal for every family.
# Modules fully driver-proven in round 1 (analytics, dedup, events,
# llmdata head) sort last; within unlisted queries, family order below
# then registration order.  Names here that stop existing raise at
# lookup time (guarded in _ordered_names).
# Round-8 rotation (VERDICT r7 tasks 1+4): the head carries the
# hard-signal names — the KM re-proof (survival now DECIMAL(18,8)-
# quantized on both sides) flanked by its two diagnostic probes, the
# round-8 net-new queries (each needs a first driver row), and the
# three queries whose code changed this round (ngram graduation /
# decile plan pin / winnowing position cap / RRF dial refactor).  The
# backfill slots rotate in 27 of the 47 names whose only driver row is
# from ROUND 1 — seven rounds of environment drift unconfirmed — so a
# green window both closes the net-new ledger and refreshes the oldest
# evidence.  The 20 remaining r1-only names rotate in next round.
# (Nine late-r8 additions — nelson_aalen_hazard /
# interval_union_coverage / bitmap_distinct_rollup /
# streaming_bitmap_distinct / rolling_7d_active_bitmap /
# audio_silence_segments / quantity_moment_stats /
# bitmap_retention_pairs / leakage_safe_split_audit — took the last
# nine backfill slots; the displaced names lead the behind-window
# cohort.)
_PRIORITY: tuple[str, ...] = (
    # ---- 1-3: KM re-proof + diagnostic probes ----
    "kaplan_meier_conversion", "km_grid_probe", "km_factor_probe",
    # ---- round-8 net-new / changed (first driver row or re-proof) ----
    "ngram_jaccard_pairs", "ngram_jaccard_allpairs_eval",
    "streaming_join_view_maintenance", "isotonic_calibration_pav",
    "t_closeness_audit", "scd2_point_in_time_join",
    "bucketed_colocated_join_audit", "image_ahash_neardup",
    "decile_lift_table", "winnowing_fingerprints", "rrf_fusion_topk",
    "nelson_aalen_hazard", "interval_union_coverage",
    "bitmap_distinct_rollup", "streaming_bitmap_distinct",
    "rolling_7d_active_bitmap", "audio_silence_segments",
    "quantity_moment_stats", "bitmap_retention_pairs",
    "leakage_safe_split_audit",
    # ---- backfill: last driver-tested in round 1 ----
    "customer_rank_in_nation", "order_lag_lead", "running_customer_spend",
    "yearly_spend_range_frame", "top3_orders_per_priority",
    "customer_quartiles", "sales_cube", "sales_rollup",
    "order_grouping_sets", "distinct_part_counts", "quantity_pivot",
    "percentile_stats", "salted_returnflag_totals",
    "lineitem_metrics_unpivot", "fuzzy_name_pairs",
    "deterministic_sample_stats", "nations_per_region_listagg",
    "price_quantity_corr", "price_histogram", "orders_upsert_merge",
    "order_value_distribution", "salted_hotkey_join_totals",
    "scd2_customer_dim", "exact_dedup", "bag_of_words_dedup",
    "minhash_lsh_candidates", "simhash_signatures",
    # ---- behind the window: the next r1-only cohort, so a wider
    # sweep (or the r9 head) picks them up first ----
    "neardup_components", "neardup_canonical_docs",
    "delta_dedup_against_corpus",
    "tumbling_hourly_stats", "sliding_30m_windows", "user_sessions",
    "first_event_per_user_type", "eventtype_hourly_pivot",
    "multires_time_rollup",
    "user_retention_cohorts", "event_funnel_conversion",
    "event_type_map_roundtrip", "event_transition_counts",
    "stratified_doc_sample", "train_test_split_counts",
    "benchmark_contamination", "quality_filter_funnel",
)

# Tail order for queries not in _PRIORITY: still-unproven families
# first, round-1-green modules last.
_MODULE_ORDER: tuple[str, ...] = (
    "sketches", "pii", "quality", "temporal", "text", "similarity", "subqueries", "tpch_rest",
    "udf_surface", "jobs", "multimodal", "sql_api", "relational",
    "reference_ops", "llmdata", "events", "dedup", "analytics",
)


def _ordered_names() -> list[str]:
    load_all()
    missing = [n for n in _PRIORITY if n not in QUERIES]
    if missing:
        raise KeyError(f"_PRIORITY names not registered: {missing}")
    head = list(_PRIORITY)
    in_head = set(head)
    mod_rank = {m: i for i, m in enumerate(_MODULE_ORDER)}
    rest = [n for n in QUERIES if n not in in_head]
    reg_rank = {n: i for i, n in enumerate(QUERIES)}
    rest.sort(
        key=lambda n: (
            mod_rank.get(QUERIES[n].__module__.rsplit(".", 1)[-1], len(mod_rank)),
            reg_rank[n],
        )
    )
    return head + rest


def all_queries() -> dict[str, QueryFn]:
    return {n: QUERIES[n] for n in _ordered_names()}


def all_oracles() -> dict[str, str]:
    return {n: ORACLES[n] for n in _ordered_names() if n in ORACLES}


def coverage() -> dict[str, Any]:
    load_all()
    return {
        n: {"oracle": n in ORACLES, "covers": COVERS[n]} for n in _ordered_names()
    }
