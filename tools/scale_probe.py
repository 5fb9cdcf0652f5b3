"""10× scale probe: replicate sf0.1 into a synthetic sf1 (PKs shifted,
FKs intact, multi-file layout) and time queries at both scales.

The ratios answer the question the small fixtures can't: does each
plan's cost grow with data (good — the cluster absorbs it) or with
coordination (bad — a driver/skew bottleneck)?  Findings land in
SCALE.md.

Run: PYTHONPATH=. python tools/scale_probe.py [query ...]
(default: the probe set below).  The sf1 directory is cached in /tmp.
"""

from __future__ import annotations

import os
import sys
import time

import duckdb

SRC = "/root/testdata/sf0.1"
# Default: the ×10 replica (sf1).  SPARK_GRAFT_PROBE_REPLICAS=100
# builds the ×100 stretch replica instead (sf10, ~2.4 GB in /tmp) —
# the 100×-over-bench-scale evidence rung; DST is derived so both
# replicas can coexist cached.
REPLICAS = int(os.environ.get("SPARK_GRAFT_PROBE_REPLICAS", "10"))
DST = f"/tmp/sparkgraft_sf{REPLICAS // 10}"

# table -> {column: stride-key table}  (FK shifts follow their PK)
SHIFTS: dict[str, dict[str, str]] = {
    "region": {},
    "nation": {},
    "customer": {"c_custkey": "customer"},
    "supplier": {"s_suppkey": "supplier"},
    "part": {"p_partkey": "part"},
    "orders": {"o_orderkey": "orders", "o_custkey": "customer"},
    "lineitem": {
        "l_orderkey": "orders",
        "l_partkey": "part",
        "l_suppkey": "supplier",
    },
    "events": {"event_id": "events", "user_id": "_events_user"},
    "documents": {"doc_id": "documents"},
    "embeddings": {"vec_id": "embeddings"},
}

PK_OF = {
    "customer": "c_custkey",
    "supplier": "s_suppkey",
    "part": "p_partkey",
    "orders": "o_orderkey",
    "events": "event_id",
    "documents": "doc_id",
    "embeddings": "vec_id",
}

PROBE = [
    "suppliers_kept_waiting",
    "bilateral_trade_volume",
    "returned_item_top_customers",
    "late_shipment_priorities",
    "hourly_ohlc_bars",
    "trailing_hour_user_avg",
    "repetition_scores",
    "corpus_common_ngrams",
    "weighted_mixture_sample",
    "kmeans_train_step",
    # round-2 salting/IVF regression sentinels: these were the measured
    # super-linear offenders (14.6×/13.2×/25.1×/14.0×) before the
    # sub-bucket salts and the fixed-K seed stride; keep them in the
    # default probe so a regression is caught by the default run
    "minhash_lsh_candidates",
    "delta_dedup_against_corpus",
    "semdedup_prune",
    "embedding_neardup_blocked",
    "canonical_minhash_candidates",
    "jaccard_verify_candidates",
]


def build_sf1() -> None:
    if os.path.exists(os.path.join(DST, "_DONE")):
        return
    os.makedirs(DST, exist_ok=True)
    con = duckdb.connect()
    strides: dict[str, int] = {}
    for t, pk in PK_OF.items():
        strides[t] = (
            con.execute(
                f"SELECT MAX({pk}) + 1 FROM read_parquet('{SRC}/{t}.parquet')"
            ).fetchone()[0]
        )
    strides["_events_user"] = (
        con.execute(
            f"SELECT MAX(user_id) + 1 FROM read_parquet('{SRC}/events.parquet')"
        ).fetchone()[0]
    )
    for t, shifts in SHIFTS.items():
        d = os.path.join(DST, f"{t}.parquet")
        os.makedirs(d, exist_ok=True)
        cols = [
            c[0]
            for c in con.execute(
                f"DESCRIBE SELECT * FROM read_parquet('{SRC}/{t}.parquet')"
            ).fetchall()
        ]
        n_rep = 1 if not shifts else REPLICAS  # dims without PKs stay 1×
        for i in range(n_rep):
            sel = ", ".join(
                f"{c} + {i * strides[shifts[c]]} AS {c}" if c in shifts else c
                for c in cols
            )
            con.execute(
                f"COPY (SELECT {sel} FROM read_parquet('{SRC}/{t}.parquet'))"
                f" TO '{d}/part-{i:02d}.parquet' (FORMAT PARQUET)"
            )
    open(os.path.join(DST, "_DONE"), "w").close()


def main() -> None:
    build_sf1()
    from pyspark.sql import SparkSession

    from edinet_etl_spark import registry

    registry.load_all()
    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.shuffle.partitions", "32")
        # local-mode executors live in the driver JVM; the 1g default
        # cannot hold 32 concurrent sf1 task working sets
        .config("spark.driver.memory", "48g")
        .getOrCreate()
    )
    names = sys.argv[1:] or PROBE
    big = f"sf{REPLICAS // 10}"
    print(f"{'query':35s} {'sf0.1':>7s} {big:>8s} {'ratio':>6s}")
    for n in names:
        fn = registry.QUERIES[n]
        fn(spark, "/root/testdata/sf0.001").collect()  # warm/JIT
        times = {}
        for label, d in (("sf0.1", SRC), (big, SRC if REPLICAS == 1 else DST)):
            best = None
            for _ in range(2):
                t0 = time.time()
                fn(spark, d).write.format("noop").mode("overwrite").save()
                dt = time.time() - t0
                best = dt if best is None else min(best, dt)
            times[label] = best
        print(
            f"{n:35s} {times['sf0.1']:7.2f} {times[big]:8.2f}"
            f" {times[big] / times['sf0.1']:6.1f}×"
        )


if __name__ == "__main__":
    main()
