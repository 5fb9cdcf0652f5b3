"""Partition-shape invariance: the 1000-executor claim, tested.

Every float aggregate in this repo goes through the decimal `dsum`
discipline or array-local fixed folds precisely so that the ANSWER
does not depend on how many partitions the shuffle used — i.e. on
cluster shape.  This suite reruns representative float-bearing
queries under two very different `spark.sql.shuffle.partitions`
settings (5 vs 37, both co-prime to the data) and asserts the
canonical result hash is BIT-IDENTICAL.

A failure here means some aggregate silently depends on partial-agg
tree shape — exactly the class of bug that only shows up when the
job moves from laptop to cluster.
"""

from __future__ import annotations

import hashlib

import pytest

from edinet_etl_spark import registry
from tests.conftest import SF_DIR

pytestmark = pytest.mark.deep  # inner loop: -m "not deep" (see pytest.ini)

registry.load_all()

# float-heavy representatives across families (dsum, windows, fixed
# folds, iterative, stateful streaming excluded only for runtime cost)
CASES = [
    "pricing_summary",
    "revenue_by_nation_year",
    "running_customer_spend",
    "tumbling_hourly_stats",
    "time_weighted_avg_value",
    "cosine_topk_bruteforce",
    "pq_adc_topk",
    "kmeans_train_step",
    "salted_returnflag_totals",
    "price_quantity_corr",
    "streaming_quality_monitor",
    "priority_weighted_sample",
    "value_acf_lags",
    "linear_touch_attribution",
    "weighted_median_price",
    "nation_supplier_hhi",
    "segment_spend_gini",
    "join_key_skew_profile",
    "embedding_centroid_drift",
    "gapfill_linear_interp",
    "user_profile_snapshot",
    "winsorized_segment_stats",
    "event_interarrival_stats",
    "region_nation_revenue_shares",
    "interpolated_quartiles",
    # round-4 float-bearing additions: two-level decimal sums (ANOVA),
    # decimal-native products (CUPED), dsum of rationals (RA link
    # prediction), iterative per-coordinate decimal sums (power
    # iteration), bit-shift weighted EWMA
    "value_anova_by_event_type",
    "cuped_variance_reduction",
    "copurchase_link_prediction",
    "embedding_top_pc_power_iteration",
    "ewma_user_value_halflife",
    "retrieval_mrr_eval",
    "target_encoding_loo",
    "split_conformal_coverage",
    "knn_label_accuracy",
    # round-5 float-bearing additions: ordered left-fold products (KM
    # survival), integer-weight decimal sums (Poisson bootstrap),
    # integer-ratio chains (ECE, Gini, epsilon-greedy), day-grid pair
    # math on dsum'd series (MK / Theil-Sen), decimal sums of single
    # divisions (DSIR), within-partition percent_rank (quantile norm)
    "kaplan_meier_conversion",
    "poisson_bootstrap_mean_ci",
    "ece_calibration_bins",
    "mann_kendall_trend",
    "theil_sen_slope",
    "token_gini_diversity",
    "dsir_importance_weights",
    "epsilon_greedy_allocation",
    "quality_quantile_normalize",
    # round-6 float-bearing additions: fixed-fold squared distances
    # with per-round argmax (k-center), greedy λ-blend of fixed-fold
    # cosines (MMR), single-division rates (Bloom audit), bounded-band
    # DP distance ratio (edit distance)
    "kcenter_coreset_selection",
    "mmr_diversified_topk",
    "bloom_semijoin_prefilter_audit",
    "edit_distance_near_pairs",
    # round-8 float-bearing additions: decimal window-sum of single
    # divisions (Nelson-Aalen), per-key sweep ratio (interval union),
    # bitmap popcount ratios (distinct rollup / retention), moments
    # expression tree off exact power sums, VAD silence ratio
    "nelson_aalen_hazard",
    "interval_union_coverage",
    "bitmap_distinct_rollup",
    "rolling_7d_active_bitmap",
    "bitmap_retention_pairs",
    "quantity_moment_stats",
    "audio_silence_segments",
    # round-9 float-bearing additions: node_frac single division over
    # a window total (degree stats), the shared IEEE expression tree
    # off exact BIGINT power sums (assortativity); LPA is all-integer
    # but its per-round argmin-struct must not depend on partitioning
    "copurchase_degree_stats",
    "copurchase_assortativity",
    "label_propagation_communities",
    "copurchase_modularity",
    "embedding_cluster_assignments",
    "textrank_corpus_keywords",
]


def _canon_hash(df) -> str:
    cols = df.columns
    order = sorted(range(len(cols)), key=lambda i: cols[i])

    def cell(v):
        return v.hex() if isinstance(v, float) else str(v)

    lines = sorted(
        ",".join(cell(r[i]) for i in order) for r in df.collect()
    )
    return hashlib.sha256("\n".join(lines).encode()).hexdigest()


@pytest.mark.parametrize("name", CASES)
def test_result_invariant_to_shuffle_partitions(spark, name):
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "5")
        h5 = _canon_hash(registry.QUERIES[name](spark, SF_DIR))
        spark.conf.set("spark.sql.shuffle.partitions", "37")
        h37 = _canon_hash(registry.QUERIES[name](spark, SF_DIR))
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    assert h5 == h37, f"{name}: result depends on shuffle partitioning"
