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


# ------------------------------------------- k-center coreset
def _sqdist(a, b):
    # same left-to-right fold as dot_exact over the zip_with diff
    acc = 0.0
    for x, y in zip(a, b):
        d = float(x) - float(y)
        acc += d * d
    return acc


def test_kcenter_matches_pure_python_greedy(spark):
    from edinet_etl_spark.operators.similarity import (
        _KCENTER_K,
        kcenter_coreset_selection,
    )

    got = [
        (r["round"], r["center_id"], r["radius2"])
        for r in kcenter_coreset_selection(spark, _SF).collect()
    ]
    assert len(got) == _KCENTER_K

    emb = dict(
        duckdb.connect()
        .execute(f"SELECT vec_id, embedding FROM '{_SF}/embeddings.parquet'")
        .fetchall()
    )
    seed = min(emb)
    mind = {vid: _sqdist(v, emb[seed]) for vid, v in emb.items()}
    expected = []
    for r in range(1, _KCENTER_K + 1):
        pick = max(mind, key=lambda vid: (mind[vid], -vid))
        expected.append((r, pick, mind[pick]))
        for vid, v in emb.items():
            d = _sqdist(v, emb[pick])
            if d < mind[vid]:
                mind[vid] = d
    assert got == expected


def test_kcenter_radius_non_increasing(spark):
    from edinet_etl_spark.operators.similarity import kcenter_coreset_selection

    radii = [
        r["radius2"]
        for r in kcenter_coreset_selection(spark, _SF).orderBy("round").collect()
    ]
    assert all(a >= b for a, b in zip(radii, radii[1:]))
    assert all(r > 0 for r in radii)


# ------------------------------------------- bloom prefilter
def test_bloom_prefilter_no_false_negatives(spark):
    """Bloom filters may pass non-members but must NEVER drop a member:
    every member row passes, so pass = members + false positives."""
    from edinet_etl_spark.operators.sketches import bloom_semijoin_prefilter_audit

    row = bloom_semijoin_prefilter_audit(spark, _SF).collect()[0]
    assert row["n_pass_rows"] == row["n_member_rows"] + row["n_false_pos"]
    assert 0 < row["n_member_rows"] < row["n_rows"]
    assert 0.0 <= row["fp_rate"] < 1.0


# ------------------------------------------- z-order layout
def test_morton_interleave_matches_python_model():
    from edinet_etl_spark.operators.analytics import _Z_GRID_BITS, _morton

    def model(x, y):
        z = 0
        for i in range(_Z_GRID_BITS):
            z |= ((x >> i) & 1) << (2 * i)
            z |= ((y >> i) & 1) << (2 * i + 1)
        return z

    con = duckdb.connect()
    cases = [(0, 0), (1, 0), (0, 1), (65535, 65535), (12345, 54321), (40000, 7)]
    for x, y in cases:
        got = con.execute(f"SELECT {_morton(str(x), str(y), '//')}").fetchone()[0]
        assert got == model(x, y), (x, y)


def test_zorder_skips_more_than_linear_on_2d_boxes(spark):
    """The operator's whole point: for predicates constraining BOTH
    dimensions (3, 5) and for y-only ones (2), the z-order layout must
    scan no more files than the linear layout — strictly fewer for the
    quarter box at this data size."""
    from edinet_etl_spark.operators.analytics import zorder_data_skipping_audit

    rows = {
        (r["pred_id"], r["layout"]): r["files_scanned"]
        for r in zorder_data_skipping_audit(spark, _SF).collect()
    }
    for pred in (2, 3, 5):
        assert rows[(pred, "zorder")] <= rows[(pred, "linear")]
    assert rows[(3, "zorder")] < rows[(3, "linear")]
