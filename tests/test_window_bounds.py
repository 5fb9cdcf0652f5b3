"""Repo-wide boundedness lint for UNPARTITIONED window frames
(VERDICT r9 task 3).

A `Window.orderBy(...)` / `OVER ()` with no partition spec funnels its
whole input through ONE task.  That is fine on a collapsed grid (25
nations, a degree distribution, a day grid) and a silent serialization
cliff on a linear grain — and nothing structural distinguishes the
two: a "distinct-value collapse" stops collapsing the moment the
column is near-unique.  Round-10's first run of this lint proved the
point: of the 31 registered queries with unpartitioned windows, FIVE
were windowing ~linear grains (worst: `spearman_rank_corr`'s 59,821
distinct prices at sf0.01, 10.0× its sf0.001 count).  All five now
ride `edinet_etl_spark.prefix`'s range-partitioned two-level scan.

The lint walks every registered query's optimized logical plan,
materializes the CHILD of every window node with an empty partition
spec, counts its rows at SF_DIR, and asserts the count against an
ANNOTATED per-query bound.  Queries not in the allowlist get
_DEFAULT_BOUND — so a future operator that windows an unbounded grain
fails here with instructions, instead of sailing through on a small
fixture.  Windows the `prefix` helpers synthesize internally (their
O(P) partition-offset frames, recognizable by their `_rp_*`-only
output) are auto-bounded by the shuffle-partition count.
"""

from __future__ import annotations

import pytest

from edinet_etl_spark import registry
from tests.conftest import SF_DIR

pytestmark = pytest.mark.deep  # inner loop: -m "not deep" (see pytest.ini)

registry.load_all()

# Queries allowed an unpartitioned window over MORE than
# _DEFAULT_BOUND rows at sf0.01, each with the measured count and why
# the frame is bounded (sf0.001→sf0.01 growth in parentheses — the
# one-off round-10 investigation; sublinear or flat for every entry).
# Bounds are ~3× the sf0.01 measurement, so organic fixture drift
# passes but a grain change (≥10× = linear) fails.
_BOUNDS: dict[str, int] = {
    # distinct order open/close boundary instants inside the fixed
    # simulation horizon (1631→2499, 1.5×: saturating toward the
    # horizon-bounded slot count)
    "peak_open_orders": 7_500,
    # file-size histogram of the compaction planner: one row per
    # candidate file group (1094→2399, 2.2×, bin-bounded)
    "compaction_bin_packing": 7_500,
    # fixed-size deterministic document sample (500→500, flat cap)
    "token_budget_pack": 1_500,
    # fixed hash-sampled slope-pair grid (435→435, flat cap)
    "theil_sen_slope": 1_300,
    # order cost/value frontier candidates after dominance pruning
    # (150→206, 1.4×)
    "pareto_frontier_orders": 650,
    # fixed value-histogram bins (81→141, saturating at _KSB bins)
    "value_distribution_ks_binned": 450,
    # degree-VALUE distribution, bounded by max degree (59→125, 2.1×)
    "copurchase_degree_stats": 400,
    # source×quality grid (99→97, flat)
    "source_mix_report": 300,
}
# Everything else: a collapsed grid must stay collapsed.  Covers the
# 25-nation frames, day grids, decile/bin frames, k-distinct collapses
# (all ≤ 51 measured at sf0.01) and the prefix helpers' O(P) offset
# frames (P = spark.sql.shuffle.partitions, 8 in tests / 32 in bench).
_DEFAULT_BOUND = 128


def _iter_nodes(node):
    yield node
    for i in range(node.children().size()):
        yield from _iter_nodes(node.children().apply(i))


def _out_names(plan) -> list[str]:
    out = plan.output()
    return [out.apply(i).name() for i in range(out.size())]


def test_unpartitioned_windows_are_grid_bounded(spark):
    jvm = spark._jvm
    counts: dict[int, int] = {}  # semanticHash -> measured rows
    violations: list[str] = []
    n_sites = 0
    for name, fn in registry.QUERIES.items():
        df = fn(spark, SF_DIR)
        plan = df._jdf.queryExecution().optimizedPlan()
        for node in _iter_nodes(plan):
            if node.getClass().getSimpleName() != "Window":
                continue
            if not node.partitionSpec().isEmpty():
                continue
            n_sites += 1
            child = node.child()
            names = _out_names(child)
            if names and all(n.startswith("_rp_") for n in names):
                # prefix-helper offset frame: one row per shuffle
                # partition by construction
                bound = 4 * int(
                    spark.conf.get("spark.sql.shuffle.partitions")
                )
            elif any(n.startswith("_rp_") for n in names):
                # prefix-helper SERIAL branch (round-10 size gate):
                # taken only when the helper MEASURED the checkpointed
                # grid at <= spark.edinet.prefix.serialGridMax rows,
                # so the frame is runtime-bounded by that dial — the
                # gate, not this lint, is what enforces it at scale
                bound = int(
                    spark.conf.get(
                        "spark.edinet.prefix.serialGridMax", "131072"
                    )
                )
            else:
                bound = _BOUNDS.get(name, _DEFAULT_BOUND)
            h = child.semanticHash()
            if h not in counts:
                counts[h] = jvm.org.apache.spark.sql.classic.Dataset.ofRows(
                    spark._jsparkSession, child
                ).count()
            if counts[h] > bound:
                violations.append(
                    f"{name}: unpartitioned window over {counts[h]} rows"
                    f" (bound {bound}; child output {names[:6]})"
                )
    assert n_sites > 0, "lint walked no unpartitioned windows — walker broken?"
    assert not violations, (
        "unpartitioned window frames exceeding their grid bound "
        "(serialization cliff at scale).  Fix: partition the window, "
        "spell the cumulative/rank via edinet_etl_spark.prefix, or — "
        "only if the frame is provably sublinear in SF — add an "
        "annotated bound to _BOUNDS:\n  " + "\n  ".join(violations)
    )


def test_known_linear_grains_use_prefix_helpers():
    """The five round-10 catches must keep riding the two-level scan:
    their plans must contain the helper's `_rp_pid` marker column."""
    import edinet_etl_spark.operators.analytics as analytics
    import edinet_etl_spark.operators.events as events
    import edinet_etl_spark.operators.quality as quality
    import inspect

    for mod, fname in [
        (analytics, "spearman_rank_corr"),
        (analytics, "decile_lift_table"),
        (analytics, "split_conformal_coverage"),
        (events, "mannwhitney_u"),
        (quality, "value_distribution_ks"),
    ]:
        src = inspect.getsource(getattr(mod, fname))
        assert "range_prefix_sum" in src or "range_row_number" in src, (
            f"{fname} no longer uses the prefix helpers"
        )
