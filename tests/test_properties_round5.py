"""Round-5 property tests: independent Python models for the new
novel-math operators (same doctrine as test_properties_round4.py —
invariants the DuckDB oracle can't express, plus cross-checks of the
oracle-checked math against a third implementation).

- Kaplan-Meier == a brute-force per-subject Python model (risk sets
  recomputed by scanning the raw observation list, survival as a
  sequential product) at sf0.001.
- KM invariants: survival non-increasing in time, in (0, 1], and with
  ZERO censoring equals the plain empirical survivor function.
- Poisson bootstrap weights: the hardcoded `_POIS_HEX` thresholds are
  exactly floor(CDF(k)*16^4) for Poisson(1), and the empirical weight
  distribution over the fixture matches the CDF to a 2% tolerance
  (draws are disjoint 4-hex slices — 8 per md5).
- Mann-Kendall on hand-built series: strictly increasing -> S =
  n(n-1)/2 and z > 0; constant -> S = 0, ties zero the variance.
- Theil-Sen robustness: one arbitrarily corrupted day moves the
  fitted slope by < the corruption / D (the breakdown property that
  motivates the operator), on a hand-built series via a Python model.
- ECE: per-bin |acc - conf| terms from a Python model over the same
  md5 scores reproduce the operator's rows at sf0.001.
"""

from __future__ import annotations

import hashlib
import math
from collections import Counter

import pytest

pytestmark = pytest.mark.deep  # inner loop: -m "not deep" (see pytest.ini)

_SF = "/root/testdata/sf0.001"


def _md5_prefix_int(s: str, k: int) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:k], 16)


# ------------------------------------------------- Kaplan-Meier
def _km_python(obs: list[tuple[int, int]]) -> dict[int, float]:
    """Brute-force KM: obs = [(time, event)]; returns survival at each
    event time, folding factors sequentially in time order."""
    times = sorted({t for t, ev in obs if ev == 1})
    surv = {}
    s = 1.0
    for t in times:
        n_at_risk = sum(1 for tt, _ in obs if tt >= t)
        d = sum(1 for tt, ev in obs if tt == t and ev == 1)
        s = s * ((n_at_risk - d) / n_at_risk)
        surv[t] = s
    return surv


def _load_obs():
    import duckdb

    con = duckdb.connect()
    rows = con.execute(
        f"""
        WITH per_user AS (
          SELECT user_id, MIN(ts) AS t_first,
                 MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS t_p
          FROM read_parquet('{_SF}/events.parquet') GROUP BY user_id
        ), h AS (SELECT MAX(ts) AS h FROM read_parquet('{_SF}/events.parquet'))
        SELECT CASE WHEN t_p IS NOT NULL
                    THEN date_diff('day', CAST(t_first AS DATE), CAST(t_p AS DATE))
                    ELSE date_diff('day', CAST(t_first AS DATE), CAST(h.h AS DATE))
               END AS t,
               CASE WHEN t_p IS NOT NULL THEN 1 ELSE 0 END AS ev
        FROM per_user, h
        """
    ).fetchall()
    return [(int(t), int(ev)) for t, ev in rows]


def test_kaplan_meier_matches_python_model(spark):
    from edinet_etl_spark.operators.temporal import kaplan_meier_conversion

    got = {
        r["time_days"]: (r["n_at_risk"], r["n_events_at"], r["survival"])
        for r in kaplan_meier_conversion(spark, _SF).collect()
    }
    obs = _load_obs()
    want = _km_python(obs)
    assert set(got) == set(want)
    from decimal import ROUND_HALF_UP, Decimal

    for t, s in want.items():
        n_at_risk = sum(1 for tt, _ in obs if tt >= t)
        d = sum(1 for tt, ev in obs if tt == t and ev == 1)
        assert got[t][0] == n_at_risk
        assert got[t][1] == d
        # the query publishes survival QUANTIZED through DECIMAL(18,8)
        # (round-8 driver-env hardening) — mirror it on the model side
        s_q = float(
            str(Decimal(repr(s)).quantize(Decimal("1e-8"), ROUND_HALF_UP))
        )
        assert got[t][2] == s_q


def test_kaplan_meier_invariants(spark):
    from edinet_etl_spark.operators.temporal import kaplan_meier_conversion

    rows = kaplan_meier_conversion(spark, _SF).collect()
    surv = [r["survival"] for r in rows]
    # S hits exactly 0 iff the last grid time converts everyone at risk
    assert all(0.0 <= s <= 1.0 for s in surv)
    assert all(a >= b for a, b in zip(surv, surv[1:]))
    # risk sets strictly decrease along the grid
    risk = [r["n_at_risk"] for r in rows]
    assert all(a > b for a, b in zip(risk, risk[1:]))


def test_km_random_inputs_hold_invariants():
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=50, deadline=None)
    @given(
        st.lists(
            st.tuples(st.integers(0, 40), st.integers(0, 1)),
            min_size=1,
            max_size=60,
        )
    )
    def run(obs):
        surv = _km_python(obs)
        vals = [surv[t] for t in sorted(surv)]
        assert all(0.0 <= s <= 1.0 for s in vals)
        assert all(a >= b for a, b in zip(vals, vals[1:]))
        # with every observation an event, KM equals 1 - ECDF
        if all(ev == 1 for _, ev in obs):
            n = len(obs)
            for t, s in surv.items():
                frac = sum(1 for tt, _ in obs if tt > t) / n
                assert s == pytest.approx(frac, abs=1e-9)
        # censoring can only RAISE the curve vs treating censored rows
        # as events at the same time
        as_events = _km_python([(t, 1) for t, _ in obs])
        for t in surv:
            assert surv[t] >= as_events[t] - 1e-9

    run()


def test_km_no_censoring_equals_empirical_survivor():
    # all-event observations: KM == 1 - ECDF at each event time
    obs = [(t, 1) for t in [1, 1, 2, 3, 3, 3, 7]]
    surv = _km_python(obs)
    n = len(obs)
    for t, s in surv.items():
        frac_beyond = sum(1 for tt, _ in obs if tt > t) / n
        assert s == pytest.approx(frac_beyond, abs=1e-12)


# ------------------------------------------------- Poisson bootstrap
def test_pois_hex_thresholds_are_poisson1_cdf():
    from edinet_etl_spark.operators.analytics import _POIS_HEX

    cum = 0.0
    for k, lit in enumerate(_POIS_HEX):
        cum += math.exp(-1) / math.factorial(k)
        assert lit == format(int(cum * 16**4), "04x")


def test_bootstrap_weight_distribution_matches_cdf():
    from edinet_etl_spark.operators.analytics import _POIS_HEX

    # hash-draw weights for 20k synthetic ids across 4 resamples; the
    # empirical distribution must track Poisson(1) within 2%
    counts: Counter[int] = Counter()
    n = 0
    # all 16 (tag, slice) combinations — both boot tags and all 8 md5
    # slice positions; 10k ids each keeps the runtime of the old 4×20k
    # loop while the 2% tolerance stays >16σ at n=160k
    for b in range(16):
        tag = "bootA" if b < 8 else "bootB"
        pos = 4 * (b % 8)
        for i in range(10_000):
            h = hashlib.md5(f"{tag}:{i}".encode()).hexdigest()
            u = h[pos:pos + 4]
            w = 5
            for k, t in enumerate(_POIS_HEX):
                if u < t:
                    w = k
                    break
            counts[w] += 1
            n += 1
    for k in range(3):
        want = math.exp(-1) / math.factorial(k)
        assert abs(counts[k] / n - want) < 0.02


def test_bootstrap_means_bracket_grand_mean(spark):
    from edinet_etl_spark.operators.analytics import poisson_bootstrap_mean_ci

    rows = poisson_bootstrap_mean_ci(spark, _SF).collect()
    assert len(rows) == 16
    assert sorted(r["rank_by_mean"] for r in rows) == list(range(1, 17))
    means = [r["mean_boot"] for r in rows]
    import duckdb

    grand = duckdb.connect().execute(
        f"SELECT AVG(value) FROM read_parquet('{_SF}/events.parquet')"
    ).fetchone()[0]
    # the resample spread must contain the point estimate
    assert min(means) <= grand <= max(means)


# ------------------------------------------------- Mann-Kendall
def _daily_totals_model(sf_dir: str) -> list[float]:
    """Day-ordered exact daily totals (the decimal-grid sum both
    engines use), via DuckDB — the series the trend operators run on."""
    import duckdb

    rows = duckdb.connect().execute(
        f"""
        SELECT CAST(CAST(SUM(CAST(value AS DECIMAL(18,8))) AS VARCHAR)
                    AS DOUBLE)
        FROM read_parquet('{sf_dir}/events.parquet')
        GROUP BY CAST(ts AS DATE) ORDER BY CAST(ts AS DATE)
        """
    ).fetchall()
    return [r[0] for r in rows]


def _mk_python(ys: list[float]) -> tuple[int, float]:
    n = len(ys)
    s = sum(
        (ys[j] > ys[i]) - (ys[j] < ys[i])
        for i in range(n)
        for j in range(i + 1, n)
    )
    ties = Counter(ys)
    corr = sum(t * (t - 1) * (2 * t + 5) for t in ties.values() if t > 1)
    var = (n * (n - 1) * (2 * n + 5) - corr) / 18
    return s, var


def test_mann_kendall_hand_series():
    s, var = _mk_python([1.0, 2.0, 3.0, 4.0, 5.0])
    assert s == 10  # n(n-1)/2: every pair concordant
    s2, var2 = _mk_python([2.0, 2.0, 2.0, 2.0])
    assert s2 == 0 and var2 == 0.0  # full ties zero the variance


def test_mann_kendall_matches_python_model(spark):
    from edinet_etl_spark.operators.analytics import mann_kendall_trend

    row = mann_kendall_trend(spark, _SF).collect()[0]
    ys = _daily_totals_model(_SF)
    s, var = _mk_python(ys)
    assert row["s_stat"] == s
    assert row["n_days"] == len(ys)
    assert row["var_s"] == pytest.approx(var, rel=1e-12)
    if s > 0:
        assert row["z_stat"] == pytest.approx((s - 1) / math.sqrt(var), rel=1e-12)


# ------------------------------------------------- Theil-Sen
def _ts_python(ys: list[float]) -> float:
    slopes = sorted(
        (ys[j] - ys[i]) / (j - i)
        for i in range(len(ys))
        for j in range(i + 1, len(ys))
    )
    m = len(slopes)
    lo, hi = slopes[(m - 1) // 2], slopes[m // 2]
    return (lo + hi) / 2


def test_theil_sen_matches_python_model(spark):
    from edinet_etl_spark.operators.analytics import theil_sen_slope

    row = theil_sen_slope(spark, _SF).collect()[0]
    ys = _daily_totals_model(_SF)
    assert row["n_days"] == len(ys)
    assert row["n_pairs"] == len(ys) * (len(ys) - 1) // 2
    assert row["slope_median"] == pytest.approx(_ts_python(ys), rel=1e-12)


def test_theil_sen_robust_to_one_outlier():
    base = [float(i) for i in range(30)]  # slope exactly 1
    assert _ts_python(base) == pytest.approx(1.0)
    corrupted = base.copy()
    corrupted[7] = 1e9
    # one wild day cannot move the median slope far (OLS would explode)
    assert abs(_ts_python(corrupted) - 1.0) < 0.2


# ------------------------------------------------- ECE
def test_ece_bins_match_python_model(spark):
    from edinet_etl_spark.operators.analytics import ece_calibration_bins

    import duckdb

    ev = duckdb.connect().execute(
        f"SELECT event_id, event_type FROM read_parquet('{_SF}/events.parquet')"
    ).fetchall()
    per_bin: dict[int, list[tuple[int, int]]] = {}
    for eid, etype in ev:
        h = _md5_prefix_int(f"cal:{eid}", 6)
        per_bin.setdefault(h * 10 // 16777216, []).append(
            (h, 1 if etype == "purchase" else 0)
        )
    total = len(ev)
    rows = ece_calibration_bins(spark, _SF).collect()
    assert len(rows) == len(per_bin)
    for r in rows:
        hs = per_bin[r["bin"]]
        n = len(hs)
        conf = sum(h for h, _ in hs) / (n * 16777216)
        acc = sum(y for _, y in hs) / n
        assert r["n"] == n
        assert r["mean_confidence"] == pytest.approx(conf, rel=1e-12)
        assert r["accuracy"] == pytest.approx(acc, rel=1e-12)
        assert r["ece_term"] == pytest.approx(abs(acc - conf) * n / total, rel=1e-12)
