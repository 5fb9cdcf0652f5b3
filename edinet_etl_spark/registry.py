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
# Round-7 rotation (VERDICT r6 tasks 1+3): after r1..r6 the cumulative
# driver-tested union is 293/299 green plus ONE red
# (kaplan_meier_conversion, r06 hash-mismatch — oracle rewritten this
# round to an order-pinned recursive CTE).  The head below front-loads
# the 6 hard-signal names: the KM re-proof plus the 5 round-6 net-new
# queries that postdate the r06 window staging and have never had a
# driver row.  Round-7 net-new queries slot directly after (each needs
# a driver row this round), and driver-proven heavies backfill the
# 50-slot window as environment re-confirmation.  A green 50-window
# closes cumulative driver-proven coverage at 100% of the registry.
_PRIORITY: tuple[str, ...] = (
    # ---- 1-6: hard-signal — KM re-proof + round-6 net-new ----
    "kaplan_meier_conversion",
    "bloom_semijoin_prefilter_audit", "edit_distance_near_pairs",
    "kcenter_coreset_selection", "mmr_diversified_topk",
    "zorder_data_skipping_audit",
    # ---- round-7 net-new queries (each needs a driver row) ----
    "winnowing_fingerprints", "column_stats_histogram",
    "rrf_fusion_topk", "embedding_covariance_matrix",
    "decile_lift_table", "max_drawdown_per_user",
    "incremental_join_maintenance", "mutual_nn_matching",
    "seasonal_naive_backtest",
    # ---- backfill: driver-proven, environment re-confirmation ----
    "pricing_summary", "revenue_by_nation_year", "repetition_scores",
    "lsh_recall_curve", "exact_duplicate_mapping",
    "approx_distinct_parts", "png_roundtrip_decode_stats",
    "inverted_index_postings", "gapfill_linear_interp",
    "user_profile_snapshot", "compaction_bin_packing",
    "multimodal_resize", "duplicate_cluster_histogram",
    "winsorized_segment_stats", "dictionary_encoding_stats",
    "event_interarrival_stats", "arrow_token_totals",
    "business_day_ship_lag", "kanon_release_segment_stats",
    "maxmin_fair_token_caps", "region_nation_revenue_shares",
    "clamped_running_balance", "order_total_reconciliation",
    "benford_first_digit_audit", "spend_quartile_mobility",
    "orc_roundtrip_stats", "jsonl_roundtrip_stats", "funnel_7d_conversion",
    "interpolated_quartiles", "mannwhitney_value_by_type",
    "spearman_rank_corr", "longest_purchase_streak",
    "session_entry_exit_pairs", "modal_quantity_per_flag",
    "doc_top_token_arrayonly", "peak_open_orders", "hourly_value_bands",
    "nation_revenue_rank_shift", "daily_new_vs_returning",
    "session_eventtype_lift",
    "asof_tolerance_enrich",
    "poisson_bootstrap_mean_ci", "ece_calibration_bins",
    "mann_kendall_trend", "theil_sen_slope",
    "token_gini_diversity", "dsir_importance_weights",
    "epsilon_greedy_allocation", "quality_quantile_normalize",
    # ---- behind the window: round-5 head (all driver-proven in r5),
    # kept in priority order so a wider sweep still front-loads one
    # representative per family ----
    "simhash_hamming_near_pairs", "containment_verify_candidates",
    "did_estimator", "cuped_variance_reduction", "target_encoding_loo",
    "split_conformal_coverage", "knn_label_accuracy",
    "rank_biased_overlap_eval", "skipgram_training_pairs",
    "bpe_apply_per_source", "streaming_asof_enrich",
    "xml_roundtrip_stats", "ab_assignment_srm_check",
    "value_anova_by_event_type", "vocab_coverage_oov_rate",
    "embedding_top_pc_power_iteration", "embedding_label_outliers",
    "l_diversity_audit", "ewma_user_value_halflife",
    "retrieval_mrr_eval", "copurchase_link_prediction",
    "streaming_cms_heavy_hitters", "observed_scan_metrics",
    "csv_corrupt_records_audit", "corpus_drift_report",
    "value_distribution_ks", "copurchase_bfs_hops",
    "value_cusum_changepoint", "length_rebalance_sample",
    "gopher_repetition_flags", "prefix_filter_jaccard_join",
    "pareto_frontier_orders", "bm25_retrieval_topk", "value_mad_outliers",
    "priority_weighted_sample", "value_acf_lags", "fd_violation_audit",
    "sorted_neighborhood_pairs", "linear_touch_attribution",
    "weighted_median_price", "eventmix_chi2_drift", "nation_supplier_hhi",
    "segment_spend_gini", "join_key_skew_profile",
    "exact_group_percentiles", "embedding_centroid_drift",
    "table_checksum_audit", "sample_budget_apportionment",
    "cogrouped_asof_pandas", "pii_pseudonymize_customers",
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
