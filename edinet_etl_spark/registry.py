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
        graph,
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
# Round-9 rotation (VERDICT r8 tasks 1+3): the head carries the
# hard-signal names — the KM-family re-proof FIRST (the grid is now
# calendar-free epoch-day integer arithmetic; these 4 were the
# registry's only reds for 3 rounds, plus the new pre-grid probe
# km_obs_probe), then the round-9 net-new graph family (first driver
# rows), then the two queries whose code changed this round
# (rrf_fusion_topk join restructure, lsh_recall_curve sample dial).
# The backfill rotates in ALL 19 names whose only driver row is from
# ROUND 1 (closing the r1-only ledger entirely) and then the oldest
# 20 of the round-2 cohort; the remaining r2 names lead the
# behind-window section and rotate in next round.
_PRIORITY: tuple[str, ...] = (
    # ---- 1-5: KM-family re-proof (calendar-free grid, r9 task 1) ----
    "kaplan_meier_conversion", "km_grid_probe", "km_obs_probe",
    "km_factor_probe", "nelson_aalen_hazard",
    # ---- round-9 net-new: graph analytics (first driver rows) ----
    "label_propagation_communities", "copurchase_degree_stats",
    "copurchase_assortativity", "copurchase_modularity",
    "embedding_cluster_assignments", "textrank_corpus_keywords",
    # ---- code changed this round (re-proof) ----
    "rrf_fusion_topk", "lsh_recall_curve",
    # ---- backfill: the whole remaining r1-only cohort ----
    "benchmark_contamination", "corpus_common_ngrams",
    "delta_dedup_against_corpus", "event_funnel_conversion",
    "event_transition_counts", "event_type_map_roundtrip",
    "eventtype_hourly_pivot", "first_event_per_user_type",
    "multires_time_rollup", "neardup_canonical_docs",
    "neardup_components", "quality_filter_funnel",
    "sliding_30m_windows", "stratified_doc_sample",
    "train_test_split_counts", "tumbling_hourly_stats",
    "user_retention_cohorts", "user_sessions",
    "weighted_mixture_sample",
    # ---- backfill: oldest 20 of the round-2 cohort ----
    "asof_latest_order_per_event", "best_order_per_customer",
    "cast_failure_skip", "cms_heavy_hitters",
    "corpus_curation_pipeline", "cosine_topk_bruteforce",
    "customers_without_orders", "data_quality_checks",
    "date_functions", "date_range_generation",
    "deterministic_top_orders", "distinct_nation_segments",
    "dynamic_value_filter", "filtered_customer_projection",
    "flag_dispatch", "forecast_revenue_change",
    "largest_lineitem_per_order",
    # ---- behind the window: the rest of the round-2 cohort, so a
    # wider sweep (or the r10 head) picks them up first ----
    "local_supplier_volume", "lsh_bucket_ann", "multimodal_decode",
    "nation_balance_full_join", "nullsafe_segment_match",
    "order_priority_check", "order_union_all",
    "pandas_udf_clipped_balances", "part_membership_filters",
    "pii_scrub_customers", "pq_adc_topk",
    "price_neighbor_pairs_binned", "props_json_decode",
    "region_nation_cross", "returnflag_multiset_ops",
    "segment_intersect", "source_mix_report",
    "sql_lateral_top2_orders", "sql_top_nation_per_region",
    "streaming_purchase_attribution", "streaming_tumbling_hourly",
    "streaming_user_totals", "string_functions",
    "suppliers_kept_waiting", "table_counts", "text_stats",
    "token_budget_pack", "top_unshipped_orders",
    "triangle_count_copurchase", "udtf_char_ngrams",
    "year_offset_decode",
)

# Tail order for queries not in _PRIORITY: still-unproven families
# first, round-1-green modules last.
_MODULE_ORDER: tuple[str, ...] = (
    "graph", "sketches", "pii", "quality", "temporal", "text", "similarity", "subqueries", "tpch_rest",
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
