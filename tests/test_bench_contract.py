"""Guard the bench stdout contract (round-3 postmortem).

The driver captures only the last 2000 chars of stdout; round 3's bench
line grew past it and the round recorded no performance figure
(BENCH_r03.json parsed: null).  This test builds the exact payload
bench.py would print with worst-case-width timings and asserts it fits
with margin, so adding a headline query that would blow the window
fails CI instead of the round.
"""

from __future__ import annotations

import bench
from edinet_etl_spark import registry


def test_bench_line_fits_driver_tail_window():
    # worst realistic widths: every per-query timing three digits before
    # the point ("999.999"), total five ("99999.999")
    timings = {name: 999.999 for name in bench.HEADLINE}
    payload = bench.line_bytes(timings, 99999.999, 0.1)
    assert len(payload) <= bench.MAX_LINE_BYTES, (
        f"{len(payload)}B worst-case bench line exceeds the "
        f"{bench.MAX_LINE_BYTES}B budget (driver tail window is 2000)"
    )


def test_bench_headline_names_registered():
    registry.load_all()
    missing = [n for n in bench.HEADLINE if n not in registry.QUERIES]
    assert not missing, f"bench HEADLINE references unknown queries: {missing}"
    assert len(set(bench.HEADLINE)) == len(bench.HEADLINE)


def test_registry_has_no_rows_only_queries():
    """Round-6 guarantee: every registered query carries a full-value
    DuckDB oracle (the driver's strongest signal). A new rows-only
    registration silently weakens the correctness gate — fail here
    instead."""
    registry.load_all()
    rows_only = set(registry.QUERIES) - set(registry.ORACLES)
    assert not rows_only, f"rows-only queries reintroduced: {sorted(rows_only)}"


def test_registry_priority_rotation_is_well_formed():
    """The driver checks a 50-query prefix of registration order; the
    rotation list must stay duplicate-free, fully registered (enforced
    at lookup too, but fail HERE with a readable message), and large
    enough to pin the whole window explicitly."""
    registry.load_all()
    prio = registry._PRIORITY
    dupes = {n for n in prio if prio.count(n) > 1}
    assert not dupes, f"duplicate names in _PRIORITY: {dupes}"
    missing = [n for n in prio if n not in registry.QUERIES]
    assert not missing, f"_PRIORITY references unknown queries: {missing}"
    assert len(prio) >= 50, "driver window (50) no longer fully pinned"
