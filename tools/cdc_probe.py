"""Measure the partitioned-snapshot cost law directly.

The generic 10× probe can't show it: the replicated event feed puts
every user in every micro-batch, so each batch touches all buckets and
both schemes rewrite everything.  The partitioned rewrite's claim is
about the OTHER regime — a large snapshot receiving key-localized
batches (the common CDC shape: most keys cold, updates clustered) —
so this probe builds exactly that: a SNAP_KEYS-key snapshot, then
BATCHES update batches each confined to a single hash bucket, timed
under (a) the whole-rewrite merge and (b) the partitioned merge.

Run: PYTHONPATH=. python tools/cdc_probe.py
Findings land in SCALE.md.
"""

from __future__ import annotations

import shutil
import tempfile
import time

from pyspark.sql import functions as F

from edinet_etl_spark.numeric import dec
from edinet_etl_spark.session import get_spark
from edinet_etl_spark.streaming import jobs

import os

SNAP_KEYS = int(os.environ.get("CDC_PROBE_KEYS", 2_000_000))
BATCH_KEYS = 20_000
BATCHES = 8


def build_updates(batch_df):
    return batch_df.groupBy("user_id").agg(
        F.count("*").alias("n_events"),
        F.sum(dec(F.col("value"))).cast("string").alias("total_dec"),
    )


def merge(base, updates):
    return (
        base.unionByName(updates)
        .groupBy("user_id")
        .agg(
            F.sum("n_events").alias("n_events"),
            F.sum(F.col("total_dec").cast("decimal(38,8)"))
            .cast("string")
            .alias("total_dec"),
        )
    )


def run(spark, make_upsert) -> tuple[float, float]:
    snap = tempfile.mkdtemp(prefix="cdc_probe_")
    try:
        upsert = make_upsert(snap)
        seed = spark.range(SNAP_KEYS).select(
            F.col("id").alias("user_id"), F.lit(1.0).alias("value")
        )
        t0 = time.perf_counter()
        upsert(seed, 0)
        t_seed = time.perf_counter() - t0
        t0 = time.perf_counter()
        for b in range(1, BATCHES + 1):
            batch = (
                spark.range(SNAP_KEYS)
                .filter(
                    F.pmod(F.xxhash64(F.col("id")), F.lit(jobs._N_SNAP_BUCKETS))
                    == b % jobs._N_SNAP_BUCKETS
                )
                .limit(BATCH_KEYS)
                .select(F.col("id").alias("user_id"), F.lit(2.0).alias("value"))
            )
            upsert(batch, b)
        t_batches = time.perf_counter() - t0
        n = jobs.read_snapshot(spark, snap).count()
        assert n == SNAP_KEYS, n
        return t_seed, t_batches
    finally:
        shutil.rmtree(snap, ignore_errors=True)


def changelog_probe() -> None:
    """Measure the bucket-aware change-data-feed read: a SNAP_KEYS
    snapshot takes one single-bucket update, then the v1→v2 diff is
    timed (a) manifest-pruned (`snapshot_changelog`) vs (b) forced
    full-read (`snapshot_changelog_frame` over both full versions).
    Findings land in SCALE.md."""
    spark = get_spark("cdc-probe", cpus="8")
    snap = tempfile.mkdtemp(prefix="cdf_probe_")
    try:
        upsert = jobs.make_partitioned_additive_upsert(
            snap, build_updates, merge, key="user_id", keep_versions=2
        )
        seed = spark.range(SNAP_KEYS).select(
            F.col("id").alias("user_id"), F.lit(1.0).alias("value")
        )
        upsert(seed, 1)
        batch = (
            spark.range(SNAP_KEYS)
            .filter(
                F.pmod(F.xxhash64(F.col("id")), F.lit(jobs._N_SNAP_BUCKETS))
                == 3
            )
            .limit(BATCH_KEYS)
            .select(F.col("id").alias("user_id"), F.lit(2.0).alias("value"))
        )
        upsert(batch, 2)
        t0 = time.perf_counter()
        n_pruned = jobs.snapshot_changelog(spark, snap, "user_id", 1, 2).count()
        t_pruned = time.perf_counter() - t0
        t0 = time.perf_counter()
        n_full = jobs.snapshot_changelog_frame(
            jobs.read_snapshot(spark, snap, at=1),
            jobs.read_snapshot(spark, snap, at=2),
            "user_id",
        ).count()
        t_full = time.perf_counter() - t0
        assert n_pruned == n_full, (n_pruned, n_full)
        print(
            f"changelog over {SNAP_KEYS} keys, 1/{jobs._N_SNAP_BUCKETS} "
            f"buckets touched: pruned {t_pruned:5.2f}s vs full "
            f"{t_full:5.2f}s ({t_full / t_pruned:4.1f}x) — {n_pruned} rows"
        )
    finally:
        shutil.rmtree(snap, ignore_errors=True)
    spark.stop()


def main() -> None:
    import sys

    if "--changelog" in sys.argv:
        changelog_probe()
        return
    spark = get_spark("cdc-probe", cpus="8")

    def whole(snap):
        return jobs.make_additive_upsert(snap, build_updates, merge)

    def part(snap):
        return jobs.make_partitioned_additive_upsert(
            snap, build_updates, merge, key="user_id"
        )

    for label, mk in [("whole-rewrite", whole), ("partitioned", part)]:
        t_seed, t_batches = run(spark, mk)
        print(
            f"{label:>14}: seed {t_seed:5.2f}s, {BATCHES} one-bucket batches "
            f"{t_batches:5.2f}s ({t_batches / BATCHES:5.2f}s/batch)"
        )
    spark.stop()


if __name__ == "__main__":
    main()
