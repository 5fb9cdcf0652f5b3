"""Pure-Python model replay of the KM risk grid (VERDICT r8 task 6).

Replays the calendar-free (t, d, c, n_at_risk) grid from raw fixture
rows with stdlib ints — no Spark, no DuckDB, no floats — and asserts
equality with BOTH engines tri-scale (sf0.001/sf0.01/sf0.1, commit
6b593c2).  This makes any
future driver red attributable in one glance: model==Spark==DuckDB
locally means a red is an engine-pair divergence in the driver's
environment, not a repo bug; model!=engine points at the engine (and
which one).

The model mirrors `_KM_RISK_CTE` / `_km_risk_frame`
(edinet_etl_spark/operators/temporal.py) stage by stage:
ns→µs truncation (the `_load_events` `div 1000` / DuckDB ns→µs
narrowing), µs→epoch-day floor division, per-user MIN aggregation,
censor-at-horizon observation times, the day grid, and the
total-minus-prefix risk set.  All instants are post-1970 so floor and
truncating division agree everywhere.
"""

from __future__ import annotations

from collections import defaultdict

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from edinet_etl_spark import registry
from edinet_etl_spark.operators.temporal import _KM_RISK_CTE, _km_risk_frame

pytestmark = pytest.mark.deep  # inner loop: -m "not deep" (see pytest.ini)

registry.load_all()

_US_PER_DAY = 86_400_000_000
# all three driver scales: the KM family is the registry's only
# driver-red history, so the model pin runs tri-scale in CI
SF_DIRS = [
    "/root/testdata/sf0.001",
    "/root/testdata/sf0.01",
    "/root/testdata/sf0.1",
]


def _epoch_days(sf_dir: str) -> tuple[list[int], list[int], list[str]]:
    """Raw fixture → (user_id, epoch_day, event_type) with stdlib ints."""
    tb = pq.read_table(
        f"{sf_dir}/events.parquet", columns=["user_id", "ts", "event_type"]
    )
    t = tb.schema.field("ts").type
    raw = tb.column("ts").cast(pa.int64()).to_pylist()
    if pa.types.is_timestamp(t):
        unit = t.unit
    else:
        unit = "ns"  # raw int64 nanos encoding
    scale = {"ns": 1000, "us": 1}[unit]
    days = [(v // scale) // _US_PER_DAY for v in raw]
    return tb.column("user_id").to_pylist(), days, tb.column(
        "event_type"
    ).to_pylist()


def model_grid(sf_dir: str) -> list[tuple[int, int, int, int]]:
    """Stdlib-int replay of the grid: ordered (t, d, c, n_at_risk)."""
    users, days, types = _epoch_days(sf_dir)
    first: dict[int, int] = {}
    purch: dict[int, int] = {}
    horizon = None
    for u, day, et in zip(users, days, types):
        if u not in first or day < first[u]:
            first[u] = day
        if et == "purchase" and (u not in purch or day < purch[u]):
            purch[u] = day
        if horizon is None or day > horizon:
            horizon = day
    d_at: dict[int, int] = defaultdict(int)
    c_at: dict[int, int] = defaultdict(int)
    for u, d0 in first.items():
        if u in purch:
            d_at[purch[u] - d0] += 1
        else:
            c_at[horizon - d0] += 1
    ts = sorted(set(d_at) | set(c_at))
    total = len(first)
    out, prefix = [], 0
    for t in ts:
        d, c = d_at[t], c_at[t]
        out.append((t, d, c, total - prefix))
        prefix += d + c
    return out


def _spark_grid(spark, sf_dir: str) -> list[tuple[int, int, int, int]]:
    rows = _km_risk_frame(spark, sf_dir).orderBy("t").collect()
    return [(r["t"], r["d"], r["c"], r["n_at_risk"]) for r in rows]


def _duckdb_grid(sf_dir: str) -> list[tuple[int, int, int, int]]:
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM '{sf_dir}/events.parquet'"
    )
    rows = con.execute(
        f"WITH {_KM_RISK_CTE} SELECT t, d, c, n_at_risk FROM risk ORDER BY t"
    ).fetchall()
    con.close()
    return [tuple(int(v) for v in r) for r in rows]


@pytest.mark.parametrize("sf_dir", SF_DIRS)
def test_km_grid_model_matches_both_engines(spark, sf_dir):
    model = model_grid(sf_dir)
    assert model, "model grid empty — fixture missing?"
    assert _spark_grid(spark, sf_dir) == model, "Spark grid != model"
    assert _duckdb_grid(sf_dir) == model, "DuckDB grid != model"


@pytest.mark.parametrize("sf_dir", SF_DIRS)
def test_km_grid_invariants(sf_dir):
    grid = model_grid(sf_dir)
    # risk set is the suffix count and telescopes to zero after the end
    assert grid[0][3] == sum(d + c for _, d, c, _ in grid)
    for (t0, d0, c0, n0), (t1, _, _, n1) in zip(grid, grid[1:]):
        assert t0 < t1
        assert n1 == n0 - d0 - c0
    last = grid[-1]
    assert last[3] == last[1] + last[2]
    # every t is a non-negative day delta bounded by the horizon span
    assert all(t >= 0 for t, *_ in grid)
