"""Round-4 property tests: independent Python/numpy models for the new
novel-math operators (same doctrine as tests/test_properties.py —
invariants the DuckDB oracle can't express, plus cross-checks of the
oracle-checked math against a third implementation).

- power iteration == numpy's Gram-matrix power steps to float
  tolerance (and its bit-exactness claim is already covered by the
  oracle differential; here we check the MATH is right, not just
  engine-consistent).
- simhash Hamming banding is recall-LOSSLESS at radius 2: every pair
  within distance 2 shares at least one of the 3 bands (pigeonhole,
  checked exhaustively over random signatures).
- RA link prediction == a networkx-free brute-force dict model on a
  random sparse graph.
- EWMA integer-weight closed form == the recursive definition.
"""

from __future__ import annotations

from decimal import ROUND_HALF_UP, Decimal

import numpy as np
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
import pytest

pytestmark = pytest.mark.deep  # inner loop: -m "not deep" (see pytest.ini)

_SETTINGS = dict(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


# ------------------------------------------------- power iteration
def test_power_iteration_matches_numpy_model(spark):
    from edinet_etl_spark.operators.similarity import (
        _PC_DIM,
        _PC_V0,
        embedding_top_pc_power_iteration,
    )

    rows = embedding_top_pc_power_iteration(
        spark, "/root/testdata/sf0.001"
    ).collect()
    assert [r["dim_pos"] for r in rows] == list(range(_PC_DIM))
    got = np.array([r["pc_loading"] for r in rows])

    import duckdb

    con = duckdb.connect()
    X = np.array(
        con.execute(
            "SELECT embedding FROM "
            "read_parquet('/root/testdata/sf0.001/embeddings.parquet') "
            "ORDER BY vec_id"
        ).fetchnumpy()["embedding"].tolist(),
        dtype=np.float64,
    )
    v = np.full(_PC_DIM, _PC_V0)
    for _ in range(2):
        w = X.T @ (X @ v)
        v = w / np.sqrt(w @ w)
    # engine uses decimal-quantized sums; numpy doesn't — tolerance,
    # not bit equality (bit equality vs DuckDB is the oracle test)
    np.testing.assert_allclose(got, v, rtol=1e-6)
    # unit norm; and the iterate is closing on the fixed point
    # (2 steps from v0 need not have converged — spectrum-dependent —
    # but alignment must already dominate and beat the start vector's)
    assert abs(np.linalg.norm(got) - 1.0) < 1e-9
    w = X.T @ (X @ got)
    cos = (w @ got) / np.sqrt(w @ w)
    v0 = np.full(_PC_DIM, _PC_V0)
    w0 = X.T @ (X @ v0)
    cos0 = (w0 @ v0) / np.sqrt(w0 @ w0)
    assert cos > 0.95 and cos > cos0


# ------------------------------------------- simhash band pigeonhole
@given(st.data())
@settings(max_examples=50, deadline=None)
def test_simhash_banding_lossless_at_radius_2(data):
    from edinet_etl_spark.operators.dedup import (
        _SIMHASH_BANDS,
        _SIMHASH_MAX_HAMMING,
    )

    sig = data.draw(
        st.text(alphabet="01", min_size=16, max_size=16), label="sig"
    )
    flips = data.draw(
        st.lists(
            st.integers(0, 15), max_size=_SIMHASH_MAX_HAMMING, unique=True
        ),
        label="flips",
    )
    other = list(sig)
    for i in flips:
        other[i] = "1" if other[i] == "0" else "0"
    other = "".join(other)
    shares_band = any(
        sig[start - 1 : start - 1 + ln] == other[start - 1 : start - 1 + ln]
        for start, ln in _SIMHASH_BANDS
    )
    assert shares_band  # pigeonhole: <=2 flips cannot touch all 3 bands


# ------------------------------------------------ RA link prediction
def test_ra_link_prediction_matches_dict_model(spark):
    from edinet_etl_spark.numeric import DEC_SCALE
    from edinet_etl_spark.operators.sketches import (
        _RA_DEG_CAP,
        _RA_MIN_SUPPORT,
        _RA_TOPK,
        copurchase_link_prediction,
    )

    got = {
        (r["u"], r["v"]): (r["common_capped"], r["ra_score"])
        for r in copurchase_link_prediction(
            spark, "/root/testdata/sf0.001"
        ).collect()
    }

    import duckdb

    con = duckdb.connect()
    li = con.execute(
        "SELECT l_orderkey, l_partkey FROM "
        "read_parquet('/root/testdata/sf0.001/lineitem.parquet')"
    ).fetchall()
    by_order: dict[int, set[int]] = {}
    for ok, pk in li:
        by_order.setdefault(ok, set()).add(pk)
    support: dict[tuple[int, int], int] = {}
    for parts in by_order.values():
        ps = sorted(parts)
        for i in range(len(ps)):
            for j in range(i + 1, len(ps)):
                support[(ps[i], ps[j])] = support.get((ps[i], ps[j]), 0) + 1
    edges = {p for p, s in support.items() if s >= _RA_MIN_SUPPORT}
    adj: dict[int, set[int]] = {}
    for u, v in edges:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    scores: dict[tuple[int, int], tuple[int, Decimal]] = {}
    q = Decimal(1).scaleb(-DEC_SCALE)
    for z, nbrs in adj.items():
        if len(nbrs) > _RA_DEG_CAP:
            continue
        contrib = Decimal(repr(1.0 / len(nbrs))).quantize(q, ROUND_HALF_UP)
        ns = sorted(nbrs)
        for i in range(len(ns)):
            for j in range(i + 1, len(ns)):
                pair = (ns[i], ns[j])
                if pair in edges:
                    continue
                c, s = scores.get(pair, (0, Decimal(0)))
                scores[pair] = (c + 1, s + contrib)
    model_sorted = sorted(
        scores.items(), key=lambda kv: (-kv[1][1], kv[0])
    )[:_RA_TOPK]
    model = {p: (c, float(str(s))) for p, (c, s) in model_sorted}
    assert got == model


# ------------------------------------------------------------- EWMA
@given(
    st.lists(
        st.decimals(
            min_value=0, max_value=500, places=2, allow_nan=False
        ),
        min_size=1,
        max_size=30,
    )
)
@settings(max_examples=25, deadline=None)
def test_ewma_closed_form_matches_recursive_model(values):
    """Σ v·2^(K-1-lag) / Σ 2^(K-1-lag) over the last K == the textbook
    recursion e_t = (v_t + e_{t-1}·(2^n - 1)... i.e. exact binary EWMA
    with α=1/2 and a K-term horizon — checked as exact fractions."""
    from fractions import Fraction

    from edinet_etl_spark.operators.temporal import _EWMA_K

    vals = [float(v) for v in values]
    recent = vals[-_EWMA_K:][::-1]  # lag 0 = newest
    num = sum(
        Fraction(v) * (1 << (_EWMA_K - 1 - lag))
        for lag, v in enumerate(recent)
    )
    den = sum(1 << (_EWMA_K - 1 - lag) for lag in range(len(recent)))
    closed = num / den
    # recursive definition: weights halve with each step back
    rec_num = Fraction(0)
    rec_den = Fraction(0)
    w = Fraction(1)
    for v in recent:
        rec_num += Fraction(v) * w
        rec_den += w
        w /= 2
    assert closed == rec_num / rec_den


def test_ewma_query_matches_python_model(spark):
    from edinet_etl_spark.operators.temporal import (
        _EWMA_K,
        ewma_user_value_halflife,
    )

    got = {
        r["user_id"]: (
            r["n_events_used"],
            r["ewma_value"],
            r["latest_value"],
        )
        for r in ewma_user_value_halflife(
            spark, "/root/testdata/sf0.001"
        ).collect()
    }

    import duckdb

    con = duckdb.connect()
    ev = con.execute(
        "SELECT user_id, value, ts, event_id FROM "
        "read_parquet('/root/testdata/sf0.001/events.parquet') "
        "ORDER BY user_id, ts DESC, event_id DESC"
    ).fetchall()
    q = Decimal("1E-8")
    model: dict[int, tuple[int, float, float]] = {}
    by_user: dict[int, list[float]] = {}
    for uid, val, _, _ in ev:
        by_user.setdefault(uid, []).append(val)
    for uid, vals in by_user.items():
        recent = vals[:_EWMA_K]
        num = Decimal(0)
        den = 0
        for lag, v in enumerate(recent):
            wt = 1 << (_EWMA_K - 1 - lag)
            # mirrors the engine: quantize the VALUE, multiply exactly
            num += Decimal(repr(v)).quantize(q, ROUND_HALF_UP) * wt
            den += wt
        model[uid] = (
            len(recent),
            float(str(num)) / float(den),
            float(str(Decimal(repr(recent[0])).quantize(q, ROUND_HALF_UP))),
        )
    assert got == model
