"""Invariant tests for the round-9 graph operators (beyond the oracle
differential): a stdlib-int model replay of synchronous label
propagation, exact power-sum replay of the assortativity coefficient,
and degree-distribution conservation laws.  Same philosophy as
tests/test_km_model.py — model==Spark separates repo-wrong from
engine-pair divergence in one glance.
"""

from __future__ import annotations

from collections import Counter, defaultdict

import pyarrow.parquet as pq
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from edinet_etl_spark import registry
from edinet_etl_spark.operators.graph import _LPA_ROUNDS, lpa_rounds_over
from tests.conftest import SF_DIR

pytestmark = pytest.mark.deep  # inner loop: -m "not deep" (see pytest.ini)

registry.load_all()

MODEL_SF = "/root/testdata/sf0.001"


def _edges(sf_dir: str) -> set[tuple[int, int]]:
    """Symmetrized distinct co-purchase edge set with stdlib types."""
    tb = pq.read_table(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_partkey"]
    )
    per_order: dict[int, set[int]] = defaultdict(set)
    for ok, pk in zip(
        tb.column("l_orderkey").to_pylist(), tb.column("l_partkey").to_pylist()
    ):
        per_order[ok].add(pk)
    out: set[tuple[int, int]] = set()
    for parts in per_order.values():
        ps = sorted(parts)
        for i, u in enumerate(ps):
            for v in ps[i + 1 :]:
                out.add((u, v))
                out.add((v, u))
    return out


def _model_lpa(edges: set[tuple[int, int]], rounds: int) -> dict[int, int]:
    nbrs: dict[int, list[int]] = defaultdict(list)
    for u, v in edges:
        nbrs[u].append(v)
    labels = {n: n for n in nbrs}
    for _ in range(rounds):
        nxt = {}
        for n, nb in nbrs.items():
            votes = Counter(labels[x] for x in nb)
            # most frequent, ties to smallest label
            nxt[n] = min(votes, key=lambda lab: (-votes[lab], lab))
        labels = nxt
    return labels


def test_lpa_matches_python_model(spark):
    edges = _edges(MODEL_SF)
    model = _model_lpa(edges, _LPA_ROUNDS)
    sizes = Counter(model.values())
    rows = registry.QUERIES["label_propagation_communities"](
        spark, MODEL_SF
    ).collect()
    got = {r["part_id"]: (r["community"], r["community_size"]) for r in rows}
    assert got == {n: (lab, sizes[lab]) for n, lab in model.items()}


def test_lpa_labels_are_member_part_keys(spark):
    """Every community label is itself a node of the graph (labels are
    part keys propagated from seeds, never synthetic)."""
    rows = registry.QUERIES["label_propagation_communities"](
        spark, SF_DIR
    ).collect()
    nodes = {r["part_id"] for r in rows}
    assert {r["community"] for r in rows} <= nodes
    # community sizes partition the node set
    sizes = {}
    for r in rows:
        sizes.setdefault(r["community"], set()).add(r["part_id"])
    for r in rows:
        assert r["community_size"] == len(sizes[r["community"]])


def test_assortativity_matches_exact_power_sums(spark):
    edges = _edges(MODEL_SF)
    deg = Counter(u for u, _ in edges)
    m = len(edges)
    sx = sum(deg[u] for u, _ in edges)
    sxy = sum(deg[u] * deg[v] for u, v in edges)
    sxx = sum(deg[u] * deg[u] for u, _ in edges)
    mu = sx / m
    expect = (sxy / m - mu * mu) / (sxx / m - mu * mu)
    [row] = registry.QUERIES["copurchase_assortativity"](
        spark, MODEL_SF
    ).collect()
    assert row["n_nodes"] == len(deg)
    assert row["n_edges"] == m // 2
    assert row["avg_degree"] == m / len(deg)
    # identical IEEE expression tree → bit equality, not approx
    assert row["assortativity"] == expect
    assert -1.0 <= row["assortativity"] <= 1.0


# random undirected graphs: edge list over a small node universe
_rand_edges = st.sets(
    st.tuples(st.integers(0, 11), st.integers(0, 11)).filter(
        lambda t: t[0] != t[1]
    ),
    min_size=1,
    max_size=30,
)


@given(_rand_edges)
@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_lpa_core_matches_model_on_random_graphs(spark, raw):
    """`lpa_rounds_over` == the stdlib-int model on hypothesis-random
    graphs — catches tie-break or self-loop mistakes the single dense
    fixture can't."""
    sym = {(u, v) for u, v in raw} | {(v, u) for u, v in raw}
    edges = spark.createDataFrame(sorted(sym), "u long, v long")
    got = {
        (r["node"], r["lab"])
        for r in lpa_rounds_over(edges, 3).collect()
    }
    assert got == set(_model_lpa(sym, 3).items())


def test_modularity_matches_python_model(spark):
    """Replay Q = Σ_c e_c/m − (d_c/m)² with stdlib ints + the repo's
    decimal quantize-then-sum float discipline."""
    from decimal import ROUND_HALF_UP, Decimal

    edges = _edges(MODEL_SF)
    labels = _model_lpa(edges, _LPA_ROUNDS)
    m = len(edges)
    d_c: dict[int, int] = defaultdict(int)
    e_c: dict[int, int] = defaultdict(int)
    for u, v in edges:
        d_c[labels[u]] += 1
        if labels[u] == labels[v]:
            e_c[labels[u]] += 1
    q = Decimal(0)
    for c in d_c:
        term = e_c[c] / m - (d_c[c] / m) * (d_c[c] / m)
        q += Decimal(repr(term)).quantize(
            Decimal("1e-8"), rounding=ROUND_HALF_UP
        )
    [row] = registry.QUERIES["copurchase_modularity"](
        spark, MODEL_SF
    ).collect()
    assert row["n_communities"] == len(d_c)
    assert row["m_directed_edges"] == m
    assert row["modularity"] == float(str(q))
    # Q is bounded: [-1/2, 1) for any partition
    assert -0.5 <= row["modularity"] < 1.0


def test_embedding_clusters_cover_exactly_the_candidate_graph(spark):
    """Every clustered vector has ≥1 near-dup candidate edge, labels
    are member vec_ids, and cluster sizes partition the node set —
    the composition contract between `embedding_neardup_blocked` and
    the LPA core (each independently oracle-proven)."""
    from edinet_etl_spark.operators.similarity import (
        embedding_neardup_blocked,
    )

    pairs = embedding_neardup_blocked(spark, MODEL_SF).collect()
    nodes = {r["vec_a"] for r in pairs} | {r["vec_b"] for r in pairs}
    rows = registry.QUERIES["embedding_cluster_assignments"](
        spark, MODEL_SF
    ).collect()
    assert {r["vec_id"] for r in rows} == nodes
    assert {r["cluster"] for r in rows} <= nodes
    members: dict[int, set[int]] = defaultdict(set)
    for r in rows:
        members[r["cluster"]].add(r["vec_id"])
    for r in rows:
        assert r["cluster_size"] == len(members[r["cluster"]])
    # LPA with candidate edges never merges across connected
    # components: each cluster's members are linked in the pair graph
    nbrs: dict[int, set[int]] = defaultdict(set)
    for p in pairs:
        nbrs[p["vec_a"]].add(p["vec_b"])
        nbrs[p["vec_b"]].add(p["vec_a"])
    for c, mem in members.items():
        seen, stack = {next(iter(mem))}, [next(iter(mem))]
        while stack:
            x = stack.pop()
            for y in nbrs[x]:
                if y in mem and y not in seen:
                    seen.add(y)
                    stack.append(y)
        assert seen == mem, f"cluster {c} spans disconnected vectors"


def test_textrank_matches_python_model(spark):
    """Replay the full TextRank pipeline (tokenize → windowed
    co-occurrence → symmetric edges → 3 damped PageRank hops with the
    decimal quantize-then-exact-sum discipline → top-20) with stdlib
    types and assert bit-equality with the Spark query."""
    from decimal import ROUND_HALF_UP, Decimal

    from edinet_etl_spark.operators.graph import (
        _TR_DAMP,
        _TR_ITERS,
        _TR_MINLEN,
        _TR_TOP,
        _TR_WIN,
    )

    tb = pq.read_table(
        f"{MODEL_SF}/documents.parquet", columns=["doc_id", "text"]
    )
    cooc: set[tuple[str, str]] = set()
    for text in tb.column("text").to_pylist():
        words = text.split(" ")
        keep = {i for i, w in enumerate(words) if len(w) >= _TR_MINLEN}
        for i in keep:
            for off in range(1, _TR_WIN + 1):
                j = i + off
                if j in keep and words[i] != words[j]:
                    cooc.add((words[i], words[j]))
    edges = cooc | {(v, u) for u, v in cooc}
    deg = Counter(u for u, _ in edges)
    inbound: dict[str, list[str]] = defaultdict(list)
    for u, v in edges:
        inbound[v].append(u)
    n = len(deg)
    rank = {w: 1.0 / n for w in deg}
    q8 = Decimal("1e-8")
    for _ in range(_TR_ITERS):
        nxt = {}
        for w in deg:
            s = Decimal(0)
            for src in inbound[w]:
                s += Decimal(repr(rank[src] / deg[src])).quantize(
                    q8, rounding=ROUND_HALF_UP
                )
            nxt[w] = 0.15 / n + _TR_DAMP * float(str(s))
        rank = nxt
    top = sorted(rank.items(), key=lambda kv: (-kv[1], kv[0]))[:_TR_TOP]
    expect = [(w, deg[w], r) for w, r in top]
    rows = registry.QUERIES["textrank_corpus_keywords"](
        spark, MODEL_SF
    ).collect()
    got = [(r["word"], r["degree"], r["rank"]) for r in rows]
    assert got == expect


def test_degree_stats_conservation(spark):
    edges = _edges(MODEL_SF)
    deg = Counter(u for u, _ in edges)
    dist = Counter(deg.values())
    rows = registry.QUERIES["copurchase_degree_stats"](
        spark, MODEL_SF
    ).collect()
    assert {r["degree"]: r["n_nodes"] for r in rows} == dict(dist)
    # fractions are n/total with the same denominator everywhere
    total = sum(dist.values())
    for r in rows:
        assert r["node_frac"] == r["n_nodes"] / total
    assert sum(r["n_nodes"] for r in rows) == total
    # handshake: sum(degree * count) = |directed edges|
    assert sum(r["degree"] * r["n_nodes"] for r in rows) == len(edges)
