"""Round-6 additions: semantic property tests.

`mmr_diversified_topk` — the greedy loop must equal an independent
pure-Python MMR re-computation over the same pool (same cosine, same
tie rules).  `edit_distance_near_pairs` — threshold/canonicality
invariants plus a cross-engine Levenshtein spot-check (Spark vs DuckDB
vs a reference DP) on adversarial strings.
"""

from __future__ import annotations

import math
import os

import duckdb
import pytest

pytestmark = pytest.mark.deep  # inner loop: -m "not deep" (see pytest.ini)

_SF = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.01")


# ------------------------------------------------------------- MMR
def _cos(a, b):
    dot = 0.0
    na = 0.0
    nb = 0.0
    # same left-to-right fold as dot_exact
    for x, y in zip(a, b):
        dot += float(x) * float(y)
    for x in a:
        na += float(x) * float(x)
    for y in b:
        nb += float(y) * float(y)
    return dot / (math.sqrt(na) * math.sqrt(nb))


def test_mmr_matches_pure_python_greedy(spark):
    from edinet_etl_spark.operators.similarity import (
        _MMR_K,
        _MMR_POOL,
        _MMR_QUERIES,
        mmr_diversified_topk,
    )

    got = {
        (r["query_id"], r["round"]): (r["cand_id"], r["mmr_score"])
        for r in mmr_diversified_topk(spark, _SF).collect()
    }
    assert len(got) == _MMR_QUERIES * _MMR_K

    emb = {
        r[0]: r[1]
        for r in duckdb.connect()
        .execute(f"SELECT vec_id, embedding FROM '{_SF}/embeddings.parquet'")
        .fetchall()
    }
    for qid in range(_MMR_QUERIES):
        rel = {
            cid: _cos(emb[qid], v) for cid, v in emb.items() if cid != qid
        }
        pool = sorted(rel, key=lambda c: (-rel[c], c))[:_MMR_POOL]
        sel: list[int] = []
        for rnd in range(1, _MMR_K + 1):
            if rnd == 1:
                best = min(pool, key=lambda c: (-rel[c], c))
                score = rel[best]
            else:
                rem = [c for c in pool if c not in sel]
                def mmr(c):
                    ms = max(_cos(emb[c], emb[s]) for s in sel)
                    return 0.7 * rel[c] - 0.3 * ms
                best = min(rem, key=lambda c: (-mmr(c), c))
                score = mmr(best)
            assert got[(qid, rnd)][0] == best, (qid, rnd)
            assert got[(qid, rnd)][1] == pytest.approx(score, abs=1e-12)
            sel.append(best)


def test_mmr_first_pick_is_pure_relevance(spark):
    """Round 1 must equal cosine_topk_bruteforce's rank-1 neighbor for
    the shared queries (same kernel, same tie-break)."""
    from edinet_etl_spark.operators.similarity import (
        _MMR_QUERIES,
        cosine_topk_bruteforce,
        mmr_diversified_topk,
    )

    mmr1 = {
        r["query_id"]: r["cand_id"]
        for r in mmr_diversified_topk(spark, _SF)
        .filter("round = 1")
        .collect()
    }
    top1: dict[int, int] = {}
    for r in cosine_topk_bruteforce(spark, _SF).collect():
        if r["query_id"] < _MMR_QUERIES and r["query_id"] not in top1:
            top1[r["query_id"]] = r["neighbor_id"]
    # cosine_topk rows come back unordered; recompute rank-1 per query
    best: dict[int, tuple[float, int]] = {}
    for r in cosine_topk_bruteforce(spark, _SF).collect():
        q = r["query_id"]
        if q >= _MMR_QUERIES:
            continue
        key = (-r["cosine"], r["neighbor_id"])
        if q not in best or key < best[q]:
            best[q] = key
    for q, (_, nid) in best.items():
        assert mmr1[q] == nid


def test_mmr_selects_distinct_candidates(spark):
    from edinet_etl_spark.operators.similarity import mmr_diversified_topk

    rows = mmr_diversified_topk(spark, _SF).collect()
    per_q: dict[int, list[int]] = {}
    for r in rows:
        per_q.setdefault(r["query_id"], []).append(r["cand_id"])
    for q, cands in per_q.items():
        assert len(cands) == len(set(cands)), q


# -------------------------------------------------- edit distance
def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(
                min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
            )
        prev = cur
    return prev[-1]


def test_levenshtein_cross_engine_parity(spark):
    """Spark, DuckDB, and the reference DP must agree on ASCII —
    including empty strings and transposition-heavy cases (Levenshtein
    has no transposition op: 'ab'->'ba' costs 2).  On NON-ASCII the
    engines measurably diverge (Spark: codepoints; DuckDB: UTF-8
    bytes) — asserted below so a silent engine change is caught — and
    the oracle only holds because the corpus is pure ASCII at every
    SF, asserted here too."""
    cases = [
        ("kitten", "sitting"),
        ("", ""),
        ("", "abc"),
        ("abc", ""),
        ("ab", "ba"),
        ("abcd", "badc"),
        ("aaaa", "aa"),
    ]
    con = duckdb.connect()
    for a, b in cases:
        want = _lev(a, b)
        duck = con.execute("SELECT levenshtein(?, ?)", [a, b]).fetchone()[0]
        sp = spark.sql(
            "SELECT levenshtein(:a, :b) AS d", args={"a": a, "b": b}
        ).collect()[0]["d"]
        assert duck == want, (a, b)
        assert sp == want, (a, b)
    # the documented divergence: codepoints (Spark) vs bytes (DuckDB)
    a, b = "日本語のテキスト", "日本語テキスト"
    assert _lev(a, b) == 1
    assert (
        spark.sql(
            "SELECT levenshtein(:a, :b) AS d", args={"a": a, "b": b}
        ).collect()[0]["d"]
        == 1
    )
    assert con.execute("SELECT levenshtein(?, ?)", [a, b]).fetchone()[0] == 3
    # oracle precondition: the corpus is ASCII at every scale
    n = con.execute(
        f"""SELECT COUNT(*) FROM '{_SF}/documents.parquet'
            WHERE octet_length(CAST(text AS BLOB)) <> length(text)"""
    ).fetchone()[0]
    assert n == 0


def test_edit_distance_pairs_invariants(spark):
    from edinet_etl_spark.operators.dedup import edit_distance_near_pairs

    rows = edit_distance_near_pairs(spark, _SF).collect()
    assert rows, "threshold should admit pairs at sf0.01"
    con = duckdb.connect()
    keepers = {
        r[0]
        for r in con.execute(
            f"""SELECT MIN(doc_id) FROM '{_SF}/documents.parquet'
                GROUP BY md5(text)"""
        ).fetchall()
    }
    texts = {
        r[0]: r[1]
        for r in con.execute(
            f"SELECT doc_id, text FROM '{_SF}/documents.parquet'"
        ).fetchall()
    }
    for r in rows:
        assert r["doc_a"] < r["doc_b"]
        # pairs are over canonical (keeper) doc_ids only
        assert r["doc_a"] in keepers and r["doc_b"] in keepers
        # 20% relative threshold, integer cross-multiplied
        assert r["edit_distance"] * 5 <= r["max_len"]
        assert r["rel_edit"] == pytest.approx(
            r["edit_distance"] / r["max_len"], abs=1e-15
        )
    # spot-verify the distances themselves against the reference DP
    for r in rows[:5]:
        assert r["edit_distance"] == _lev(texts[r["doc_a"]], texts[r["doc_b"]])
        assert r["max_len"] == max(
            len(texts[r["doc_a"]]), len(texts[r["doc_b"]])
        )
