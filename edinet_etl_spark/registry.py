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
# Round-3 rotation: after r1+r2 the cumulative driver-tested union is
# 99/183 (98 green; CORRECTNESS_r01/r02.json).  The head below is 50
# NEVER-driver-tested names — whole still-unproven families first
# (sketches/graph, the TPC-H subquery + rest shapes, temporal,
# UDF/UDAF surface), then similarity's IVF/PQ/semdedup legs and three
# unproven streaming jobs — pushing the cumulative union to ~149/183.
# Positions 51–84 hold the remaining never-tested names (round-4
# rotation candidates; they ride a wider window if one exists).
_PRIORITY: tuple[str, ...] = (
    # sketches / graph (9)
    "bloom_prejoin_reduction", "pagerank_event_graph", "cms_sketch_counts",
    "bloom_filter_bitmap", "copurchase_lift_pairs", "kmv_distinct_estimate",
    "binned_quantile_sketch", "kmv_sketch_merge", "kcore_copurchase_peel",
    # TPC-H subquery shapes: Q2/Q8/Q11/Q13/Q14/Q15/Q17/Q18/Q22 (9)
    "small_quantity_revenue", "large_volume_customers",
    "customer_order_distribution", "promo_revenue_share",
    "top_supplier_by_revenue", "inactive_rich_customers",
    "important_part_value", "min_price_supplier_per_part",
    "nation_market_share",
    # TPC-H rest: Q5-variant/Q9/Q10/Q12/Q16/Q19/Q20 (7)
    "bilateral_trade_volume", "parttype_profit_by_nation_year",
    "returned_item_top_customers", "late_shipment_priorities",
    "supplier_count_by_part", "bracketed_quantity_revenue",
    "heavy_promo_suppliers",
    # temporal: band/range joins, gap-fill, time-weighted, OHLC (6)
    "part_price_band_join", "lineitem_ship_lag_range",
    "gapfill_locf_hourly", "time_weighted_avg_value",
    "hourly_ohlc_bars", "trailing_hour_user_avg",
    # UDF surface: UDAF, grouped-map, SQL UDF, dynamic UDTF (4)
    "udaf_median_acctbal_by_nation", "grouped_map_user_zscore",
    "sql_udf_band_totals", "udtf_dynamic_word_columns",
    # SQL API: recursive CTE
    "sql_recursive_paydown",
    # analytics: layout + regression trend
    "zorder_locality_stats", "customer_spend_trend",
    # events: seasonal decomposition
    "seasonal_hourly_anomalies",
    # similarity: IVF/PQ/semdedup/kmeans/JL legs (8)
    "semdedup_prune", "ivf_ann_topk", "ivf_recall_at3", "pq_recall_at3",
    "kmeans_train_step", "embedding_neardup_blocked",
    "hard_negative_mining", "jl_projection_recall",
    # streaming: CDC sink, left-outer stream-stream join, exact dedup (3)
    "streaming_cdc_snapshot", "streaming_attribution_left_outer",
    "streaming_dedup_events",
    # ---- positions 51+: the other 34 never-tested names ----
    "ivf_ann_nprobe2", "lsh_hyperplane_buckets",
    "embedding_sq8_recon_error", "pq_codebook_recon_error",
    "tfidf_top_terms", "language_id_heuristic", "token_count_estimate",
    "document_fingerprints", "quality_scores",
    "boilerplate_segment_removal", "bigram_novelty_scores",
    "doc_rarity_scores",
    "doc_chunk_windows", "token_budget_pack_partitioned",
    "source_overlap_matrix", "bpe_top_merges",
    "canonical_minhash_candidates", "lsh_band_bucket_stats",
    "jaccard_verify_candidates", "minhash_jaccard_estimate_error",
    "props_variant_stats", "event_sequence_trigrams",
    "rolling_7d_active_users", "incremental_agg_maintenance",
    "multimodal_frame_sample", "multimodal_features",
    "multimodal_audio_energy",
    "pii_redaction_report", "table_profile_orders",
    "fulfilled_only_customers_except", "suppliers_with_shipments",
    "streaming_user_sessions", "streaming_nation_hourly",
    "streaming_quality_monitor",
    # ---- positions 85+: round-3 additions (rotation queue after the
    # never-tested tail above; all driver-mirror-verified locally) ----
    "source_temperature_sampling", "training_shard_assignment",
    "bpe_train_steps", "kmv_jaccard_intersection",
    "matryoshka_prefix_recall", "lsh_recall_curve",
    "duplicate_span_scrub", "training_mix_manifest",
    "cdc_apply_changes", "schema_evolution_read",
    "streaming_cms_heavy_hitters", "cms_join_size_estimate",
    "hashed_tf_cosine_topk", "observed_scan_metrics",
    "csv_corrupt_records_audit", "ivf_partitioned_index_topk",
    "corpus_drift_report", "value_distribution_ks",
    "dynamic_partition_pruned_join", "copurchase_bfs_hops",
    "fuzzy_name_linkage", "value_cusum_changepoint",
    "length_rebalance_sample", "gopher_repetition_flags",
    "value_distribution_ks_binned", "prefix_filter_jaccard_join",
    "pareto_frontier_orders", "bm25_retrieval_topk",
    "value_mad_outliers",
    "priority_weighted_sample", "value_acf_lags", "fd_violation_audit",
    "sorted_neighborhood_pairs", "linear_touch_attribution",
    "weighted_median_price", "eventmix_chi2_drift",
    "nation_supplier_hhi", "segment_spend_gini",
    "join_key_skew_profile", "exact_group_percentiles",
    "embedding_centroid_drift", "table_checksum_audit",
    "sample_budget_apportionment", "inverted_index_postings",
    "gapfill_linear_interp", "user_profile_snapshot",
    "compaction_bin_packing", "cogrouped_asof_pandas",
    "multimodal_resize", "duplicate_cluster_histogram",
    "winsorized_segment_stats", "dictionary_encoding_stats",
    "event_interarrival_stats", "arrow_token_totals",
    "pii_pseudonymize_customers", "business_day_ship_lag",
    "kanon_release_segment_stats", "maxmin_fair_token_caps",
    "region_nation_revenue_shares", "clamped_running_balance",
    "order_total_reconciliation", "benford_first_digit_audit",
    "spend_quartile_mobility", "orc_roundtrip_stats",
    "jsonl_roundtrip_stats", "funnel_7d_conversion",
    "interpolated_quartiles", "mannwhitney_value_by_type",
    "spearman_rank_corr", "longest_purchase_streak",
    "session_entry_exit_pairs", "modal_quantity_per_flag",
    "doc_top_token_arrayonly", "peak_open_orders",
    "hourly_value_bands", "nation_revenue_rank_shift",
    "daily_new_vs_returning", "session_eventtype_lift",
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
