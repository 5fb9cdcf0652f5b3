"""Driver-window rotation ledger: per-query latest driver observation.

The driver hash-checks a ~50-name prefix of registry order each round
(CORRECTNESS_r{N}.json).  Planning the next round's `_PRIORITY` needs
the union of those windows: which names have never been driver-tested,
and which carry the OLDEST evidence.  This tool prints exactly that —
run it at round start before editing `registry._PRIORITY`.

Run: PYTHONPATH=. python tools/rotation_ledger.py [--cohorts]
"""

from __future__ import annotations

import glob
import json
import sys
from collections import defaultdict


def ledger() -> tuple[dict[str, int], list[str]]:
    from edinet_etl_spark import registry

    registry.load_all()
    names = list(registry.QUERIES)
    latest: dict[str, int] = {}
    latest_red: dict[str, int] = {}
    for f in sorted(glob.glob("CORRECTNESS_r*.json")):
        rnd = int(f.split("_r")[1].split(".")[0])
        for n, row in json.load(open(f)).items():
            if n in registry.QUERIES:
                latest[n] = rnd
                # only a red LATEST observation is an open defect —
                # earlier reds superseded by a green row are history
                if not row.get("hash_match", True):
                    latest_red[n] = rnd
                else:
                    latest_red.pop(n, None)
    for n, rnd in sorted(latest_red.items()):
        print(f"  !! {n}: latest observation (r{rnd}) is RED")
    never = [n for n in names if n not in latest]
    return latest, never


def main() -> None:
    latest, never = ledger()
    print(f"registry: {len(latest) + len(never)} queries")
    print(f"never driver-tested ({len(never)}): {never}")
    by_round: dict[int, list[str]] = defaultdict(list)
    for n, r in latest.items():
        by_round[r].append(n)
    for r in sorted(by_round):
        print(f"latest=r{r}: {len(by_round[r])}")
    if "--cohorts" in sys.argv:
        for r in sorted(by_round):
            print(f"\n-- r{r} cohort ({len(by_round[r])}):")
            for n in sorted(by_round[r]):
                print(f"   {n}")


if __name__ == "__main__":
    main()
