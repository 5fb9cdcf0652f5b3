"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query is forced end-to-end with the noop sink (full computation of
every operator, no driver-side collect, no output I/O skew).  The
headline set spans the engine's families: scan/filter/agg, multi-join,
window dedup, event-time windows, LSH dedup, similarity, text.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

from edinet_etl_spark import registry
from edinet_etl_spark.planhash import plan_hash
from edinet_etl_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")

HEADLINE = [
    "pricing_summary",
    "revenue_by_nation_year",
    "top_unshipped_orders",
    "local_supplier_volume",
    "forecast_revenue_change",
    "best_order_per_customer",
    "top3_orders_per_priority",
    "tumbling_hourly_stats",
    "user_sessions",
    "exact_dedup",
    "minhash_lsh_candidates",
    "simhash_signatures",
    "cosine_topk_bruteforce",
    "lsh_hyperplane_buckets",
    "ivf_ann_topk",
    "text_stats",
    "token_count_estimate",
    "asof_latest_order_per_event",
    "part_price_band_join",
    "salted_returnflag_totals",
    "sql_top_nation_per_region",
    "tfidf_top_terms",
    "neardup_components",
    "multires_time_rollup",
    # subquery/decorrelation family
    "small_quantity_revenue",
    "suppliers_kept_waiting",
    # TPC-H completion set (Q7/Q10 representatives)
    "bilateral_trade_volume",
    "returned_item_top_customers",
    # curation additions: zero-shuffle per-doc scoring + corpus n-grams
    "repetition_scores",
    "corpus_common_ngrams",
    # timeseries regularization
    "gapfill_locf_hourly",
    "time_weighted_avg_value",
    # LLM-data curation
    "benchmark_contamination",
    "train_test_split_counts",
    # round-2 continuation: compressed-domain ANN + corpus rarity + PII
    "pq_adc_topk",
    "doc_rarity_scores",
    "pii_scrub_customers",
    # round-3: corpus boilerplate cleaning + mergeable-sketch quantiles
    # + materialized-aggregate maintenance
    "boilerplate_segment_removal",
    "binned_quantile_sketch",
    "incremental_agg_maintenance",
    # round-4: the composed curation flagship + rolling engagement
    "corpus_curation_pipeline",
    "rolling_7d_active_users",
    # round-5: mixture sampling, shard shuffle, iterative BPE,
    # sketch intersection, MRL truncation ANN, LSH S-curve eval
    "source_temperature_sampling",
    "training_shard_assignment",
    "bpe_train_steps",
    "kmv_jaccard_intersection",
    "matryoshka_prefix_recall",
    "lsh_recall_curve",
    "duplicate_span_scrub",
    "training_mix_manifest",
    "cdc_apply_changes",
    # round-6: text-native similarity, sketch join-size, monitoring
    # statistics, storage pruning, record linkage
    "hashed_tf_cosine_topk",
    "cms_join_size_estimate",
    "value_distribution_ks",
    "value_cusum_changepoint",
    "dynamic_partition_pruned_join",
    "ivf_partitioned_index_topk",
    "fuzzy_name_linkage",
    # round-7: grouped Gopher repetition gate + the constant-state
    # binned KS (scale companion to the exact form above)
    "gopher_repetition_flags",
    "value_distribution_ks_binned",
    # round-8: skew observability + exact grouped selection (the
    # weighted median is the probe-driven distinct-collapse rewrite)
    "join_key_skew_profile",
    "exact_group_percentiles",
    "weighted_median_price",
    # round-8 cont.: golden record, search-index build, linear interp
    # (the reversed-cumulative rewrite), ledger reconciliation
    "user_profile_snapshot",
    "inverted_index_postings",
    "gapfill_linear_interp",
    "order_total_reconciliation",
]


def main() -> None:
    registry.load_all()
    spark = get_spark("edinet-etl-spark-bench", cpus=CPUS)
    sf_match = re.search(r"sf([\d.]+)", SF_DIR)
    sf = float(sf_match.group(1)) if sf_match else -1.0

    # Warm-up: run every headline query once at the smallest SF so the
    # JVM JITs each plan's generated code off the clock.  Plan shapes
    # are identical across SFs, so this measures steady-state execution
    # (what a long-lived cluster sees), not first-call codegen+JIT.
    warm_dir = SF_DIR.replace("sf0.1", "sf0.001") if "sf0.1" in SF_DIR else SF_DIR
    for name in HEADLINE:
        registry.QUERIES[name](spark, warm_dir).write.format("noop").mode(
            "overwrite"
        ).save()

    # best-of-N at the target SF: one timed run still carries GC /
    # first-shuffle-fetch noise; the min of the reps is the steady-state
    # figure a resident engine delivers.  Two reps normally; when they
    # disagree by >25% the number is noise-dominated, so take up to two
    # more — stabilizes the recorded figure without 2× cost on the
    # well-behaved majority.
    timings: dict[str, float] = {}
    plan_hashes: dict[str, str] = {}
    for name in HEADLINE:
        runs: list[float] = []
        while True:
            # construction inside the timer: iterative operators
            # (eager checkpoints) do real work before the sink runs
            t0 = time.perf_counter()
            df = registry.QUERIES[name](spark, SF_DIR)
            df.write.format("noop").mode("overwrite").save()
            runs.append(time.perf_counter() - t0)
            if len(runs) >= 2 and (
                len(runs) >= 4 or max(runs[-2:]) <= 1.25 * min(runs[-2:])
            ):
                break
        timings[name] = round(min(runs), 3)
        # plan hash from the df just timed (driver-side only, ~ms):
        # equal across rounds ⇒ a timing delta is environment drift;
        # unequal ⇒ the plan changed and the delta is attributable.
        plan_hashes[name] = plan_hash(df)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_runtime",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
                "plan_hashes": plan_hashes,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    sys.exit(main())
