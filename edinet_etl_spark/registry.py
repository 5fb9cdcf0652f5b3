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
# Round-4 rotation: after r1+r2+r3 the cumulative driver-tested union
# is 149/261 (all green; CORRECTNESS_r0{1,2,3}.json).  The head below
# is 50 NEVER-driver-tested names — the 34 queued at round-3 positions
# 51-84 (text/similarity tails, curation, multimodal, streaming) plus
# 16 round-3 additions — pushing the cumulative union to ~199/261.
# Positions 51-112 hold the remaining 62 never-tested names (round-5
# rotation queue); new round-4 queries append after them.
_PRIORITY: tuple[str, ...] = (
    # ---- head: 50 never-driver-tested names (round-4 window) ----
    "ivf_ann_nprobe2", "lsh_hyperplane_buckets",
    "embedding_sq8_recon_error", "pq_codebook_recon_error",
    "tfidf_top_terms", "language_id_heuristic", "token_count_estimate",
    "document_fingerprints", "quality_scores",
    "boilerplate_segment_removal", "bigram_novelty_scores",
    "doc_rarity_scores", "doc_chunk_windows",
    "token_budget_pack_partitioned", "source_overlap_matrix",
    "bpe_top_merges", "canonical_minhash_candidates",
    "lsh_band_bucket_stats", "jaccard_verify_candidates",
    "minhash_jaccard_estimate_error", "props_variant_stats",
    "event_sequence_trigrams", "rolling_7d_active_users",
    "incremental_agg_maintenance", "multimodal_frame_sample",
    "multimodal_features", "multimodal_audio_energy",
    "pii_redaction_report", "table_profile_orders",
    "fulfilled_only_customers_except", "suppliers_with_shipments",
    "streaming_user_sessions", "streaming_nation_hourly",
    "streaming_quality_monitor", "duplicate_span_scrub",
    "training_mix_manifest", "ivf_partitioned_index_topk",
    "value_distribution_ks_binned", "fuzzy_name_linkage",
    "source_temperature_sampling", "training_shard_assignment",
    "bpe_train_steps", "kmv_jaccard_intersection",
    "matryoshka_prefix_recall", "lsh_recall_curve", "cdc_apply_changes",
    "schema_evolution_read", "cms_join_size_estimate",
    "hashed_tf_cosine_topk", "dynamic_partition_pruned_join",
    # ---- positions 51+: remaining 62 never-tested (round-5 queue) ----
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
    "inverted_index_postings", "gapfill_linear_interp",
    "user_profile_snapshot", "compaction_bin_packing",
    "cogrouped_asof_pandas", "multimodal_resize",
    "duplicate_cluster_histogram", "winsorized_segment_stats",
    "dictionary_encoding_stats", "event_interarrival_stats",
    "arrow_token_totals", "pii_pseudonymize_customers",
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
    # ---- round-4 additions (queue behind all never-tested names) ----
    "l_diversity_audit", "ewma_user_value_halflife",
    "retrieval_mrr_eval", "copurchase_link_prediction",
    "containment_verify_candidates", "vocab_coverage_oov_rate",
    "embedding_top_pc_power_iteration",
    "embedding_label_outliers", "simhash_hamming_near_pairs",
    "value_anova_by_event_type", "cuped_variance_reduction",
    "bpe_apply_per_source", "streaming_asof_enrich",
    "xml_roundtrip_stats", "skipgram_training_pairs",
    "target_encoding_loo", "ab_assignment_srm_check",
    "split_conformal_coverage", "knn_label_accuracy",
    "did_estimator", "rank_biased_overlap_eval",
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
