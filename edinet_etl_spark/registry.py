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
# Round-10 rotation (VERDICT r9 task 1: retire the stale driver
# cohort).  The head carries the round-10 net-news (first driver
# rows, per r8/r9 practice), this round's code-changed re-proofs
# (copurchase_assortativity NULLIF zero-guard, textrank checkpoint
# restructure, and the FIVE queries the new window-boundedness lint
# caught serializing linear grains — all rewired through
# prefix.range_prefix_sum, all plan-hash changes), then ALL 30 names
# whose latest driver row is ROUND 2 (the oldest evidence in the
# registry — the KM saga proved only a driver row retires engine-pair
# environment-divergence risk), then the oldest r3 names with the
# four timestamp-touching risk-class queries FIRST
# (gapfill_locf_hourly, hourly_ohlc_bars, late_shipment_priorities,
# lineitem_ship_lag_range — exactly the KM risk class), then the r3
# cohort alphabetically up to the 50-name window.
_PRIORITY: tuple[str, ...] = (
    # ---- round-10 net-new (first driver rows) ----
    "largestar_smallstar_components", "streaming_neardup_dedup",
    # ---- code changed this round (re-proof): advice fixes ----
    "copurchase_assortativity", "textrank_corpus_keywords",
    # ---- code changed this round (re-proof): lint-caught serial
    # windows rewired through the range-partitioned prefix scan ----
    "spearman_rank_corr", "mannwhitney_value_by_type",
    "value_distribution_ks", "decile_lift_table",
    "split_conformal_coverage",
    # ---- backfill: the ENTIRE round-2-latest cohort (30) ----
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
    # ---- oldest of the round-3 cohort: timestamp risk class first ----
    "gapfill_locf_hourly", "hourly_ohlc_bars",
    "late_shipment_priorities", "lineitem_ship_lag_range",
    # ---- then alphabetically ----
    "bilateral_trade_volume", "binned_quantile_sketch",
    "bloom_filter_bitmap", "bloom_prejoin_reduction",
    "bracketed_quantity_revenue", "cms_sketch_counts",
    "copurchase_lift_pairs",
    # ---- behind the window: the rest of the round-3 cohort, so a
    # wider sweep (or the r11 head) picks them up first ----
    "customer_order_distribution", "customer_spend_trend",
    "embedding_neardup_blocked", "grouped_map_user_zscore",
    "hard_negative_mining", "heavy_promo_suppliers",
    "important_part_value",
    "inactive_rich_customers", "ivf_ann_topk", "ivf_recall_at3",
    "jl_projection_recall", "kcore_copurchase_peel",
    "kmeans_train_step", "kmv_distinct_estimate",
    "kmv_sketch_merge", "large_volume_customers",
    "min_price_supplier_per_part", "nation_market_share",
    "pagerank_event_graph", "part_price_band_join",
    "parttype_profit_by_nation_year", "pq_recall_at3",
    "promo_revenue_share", "returned_item_top_customers",
    "seasonal_hourly_anomalies", "semdedup_prune",
    "small_quantity_revenue", "sql_recursive_paydown",
    "sql_udf_band_totals", "streaming_attribution_left_outer",
    "streaming_cdc_snapshot", "streaming_dedup_events",
    "supplier_count_by_part", "time_weighted_avg_value",
    "top_supplier_by_revenue", "trailing_hour_user_avg",
    "udaf_median_acctbal_by_nation", "udtf_dynamic_word_columns",
    "zorder_locality_stats",
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
