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


def main() -> None:
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
