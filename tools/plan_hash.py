"""Emit stable plan hashes for the bench headline queries (or names
given on argv) as one JSON line — the cross-revision attribution tool
behind the `plan_hashes` field bench.py now embeds in BENCH_r{N}.json.

Usage:
  PYTHONPATH=/root/repo python tools/plan_hash.py [query ...]
  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 python tools/plan_hash.py

Compare two runs (e.g. current tree vs a git worktree at an older
round's commit) with any JSON diff; equal hash ⇒ timing delta is
environment drift, unequal ⇒ the plan changed.
"""

from __future__ import annotations

import json
import os
import sys

from edinet_etl_spark import registry
from edinet_etl_spark.planhash import plan_hash
from edinet_etl_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    registry.load_all()
    import bench

    names = sys.argv[1:] or bench.HEADLINE
    spark = get_spark("plan-hash", cpus=os.environ.get("SPARK_GRAFT_CPUS", "8"))
    out: dict[str, str] = {}
    for name in names:
        try:
            out[name] = plan_hash(registry.QUERIES[name](spark, SF_DIR))
        except Exception as ex:  # noqa: BLE001 — report, keep hashing the rest
            out[name] = f"error:{str(ex)[:60]}"
    print(json.dumps({"sf_dir": SF_DIR, "plan_hashes": out}))
    spark.stop()


if __name__ == "__main__":
    main()
