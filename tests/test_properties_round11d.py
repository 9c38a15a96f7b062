"""Round-11 property differentials, fourth batch: smoothing folds,
frequency re-estimation, weighted quantiles, and best-split search vs
independent Python references."""


from __future__ import annotations

import pytest

from collections import Counter

from hypothesis import HealthCheck, given, settings, strategies as st
from pyspark.sql import functions as F

from weather_api_automate_etl_spark.operators import stats, timeseries
from weather_api_automate_etl_spark.operators.textops import good_turing_counts

SETTINGS = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


# ---------------------------------------------------------------------------
# holt_linear vs python fold
# ---------------------------------------------------------------------------


@given(
    ys=st.lists(st.integers(-50, 50), min_size=2, max_size=20),
    alpha=st.sampled_from([0.2, 0.5, 0.8]),
    beta=st.sampled_from([0.1, 0.25, 0.6]),
)
@SETTINGS
def test_holt_linear_matches_python_fold(spark, ys, alpha, beta):
    df = spark.createDataFrame(
        [("s", i, float(y)) for i, y in enumerate(ys)],
        "g string, o int, y double",
    )
    (r,) = timeseries.holt_linear(df, "g", "o", "y", alpha, beta).collect()
    lvl, trd = float(ys[0]), float(ys[1] - ys[0])
    for y in ys[1:]:
        new_lvl = alpha * y + (1 - alpha) * (lvl + trd)
        trd = beta * (new_lvl - lvl) + (1 - beta) * trd
        lvl = new_lvl
    assert r["n_points"] == len(ys)
    assert abs(r["level"] - lvl) < 1e-6
    assert abs(r["trend"] - trd) < 1e-6
    assert abs(r["forecast_1"] - (lvl + trd)) < 1e-6


# ---------------------------------------------------------------------------
# good_turing vs python frequency-of-frequencies
# ---------------------------------------------------------------------------


@given(
    words=st.lists(
        st.sampled_from("abcdefghij"), min_size=1, max_size=60
    ),
)
@SETTINGS
def test_good_turing_matches_python(spark, words):
    df = spark.createDataFrame([(" ".join(words),)], "text string")
    got = {
        r["r"]: (r["s_r"], r["s_r_next"], r["r_star"], r["unseen_mass"])
        for r in good_turing_counts(df, "text", max_r=10).collect()
    }
    counts = Counter(words)
    fof = Counter(counts.values())
    n = sum(words.count(w) for w in counts)  # == len(words)
    s1 = fof.get(1, 0)
    for r_val, s_r in fof.items():
        if r_val > 10:
            continue
        s_next = fof.get(r_val + 1, 0)
        want_star = (
            round((r_val + 1) * s_next / s_r, 6) if s_next else None
        )
        assert got[r_val][0] == s_r and got[r_val][1] == s_next
        assert got[r_val][2] == want_star
        assert got[r_val][3] == round(s1 / n, 6)
    assert set(got) == {r_ for r_ in fof if r_ <= 10}


# ---------------------------------------------------------------------------
# weighted_quantiles vs python left-continuous inverse CDF
# ---------------------------------------------------------------------------


@given(
    rows=st.lists(
        st.tuples(st.integers(0, 20), st.integers(0, 5)),
        min_size=1,
        max_size=30,
    ),
    qs=st.lists(
        st.sampled_from([0.1, 0.25, 0.5, 0.75, 0.9, 1.0]),
        min_size=1,
        max_size=4,
        unique=True,
    ),
)
@SETTINGS
def test_weighted_quantiles_matches_python(spark, rows, qs):
    df = spark.createDataFrame(
        [("g", float(v), float(w)) for v, w in rows],
        "g string, v double, w double",
    )
    got = {
        r["q"]: r["quantile"]
        for r in stats.weighted_quantiles(df, "g", "v", "w", qs).collect()
    }
    pooled: dict[float, float] = {}
    for v, w in rows:
        pooled[v] = pooled.get(v, 0.0) + w
    tw = sum(pooled.values())
    if tw == 0:
        assert got == {}
        return
    vals = sorted(pooled)
    for q in qs:
        cw = 0.0
        want = None
        for v in vals:
            cw += pooled[v]
            if cw >= q * tw:
                want = v
                break
        assert got[q] == want


# ---------------------------------------------------------------------------
# decision_stump vs brute-force best split
# ---------------------------------------------------------------------------


@given(
    rows=st.lists(
        st.tuples(st.integers(0, 8), st.integers(0, 10)),
        min_size=2,
        max_size=30,
    ),
)
@SETTINGS
def test_decision_stump_matches_brute_force(spark, rows):
    xs = {x for x, _ in rows}
    if len(xs) < 2:
        return  # no split exists; operator returns empty, trivially fine
    df = spark.createDataFrame(
        [("g", x, y) for x, y in rows], "g string, x int, y long"
    )
    (r,) = stats.decision_stump(df, "g", "x", "y").collect()
    best = None
    for t in sorted(xs)[:-1]:  # rightmost value is not a threshold
        left = [y for x, y in rows if x <= t]
        right = [y for x, y in rows if x > t]
        gain = sum(left) ** 2 / len(left) + sum(right) ** 2 / len(right)
        # argmax ties break to the SMALLER threshold: strict >
        if best is None or gain > best[0] + 1e-9:
            best = (gain, t, left, right)
    gain, t, left, right = best
    assert r["split_x"] == t
    assert r["n_left"] == len(left) and r["n_right"] == len(right)
    assert abs(r["gain"] - gain) < 1e-4
    assert r["mean_left"] == round(sum(left) / len(left), 6)
    assert r["mean_right"] == round(sum(right) / len(right), 6)


# ---------------------------------------------------------------------------
# psi_drift / js_divergence vs python binning
# ---------------------------------------------------------------------------


@given(
    old=st.lists(st.integers(0, 100), min_size=1, max_size=30),
    new=st.lists(st.integers(0, 100), min_size=1, max_size=30),
)
@SETTINGS
@pytest.mark.slow
def test_psi_and_js_match_python(spark, old, new):
    import math

    edges = [25.0, 50.0, 75.0]
    do = spark.createDataFrame([(float(v),) for v in old], "v double")
    dn = spark.createDataFrame([(float(v),) for v in new], "v double")
    eps = 1e-6

    def bins(vals):
        c = Counter(sum(v >= e for e in edges) for v in vals)
        return [c.get(i, 0) for i in range(4)]

    bo, bn = bins(old), bins(new)
    to, tn = sum(bo), sum(bn)

    psi = {
        r["bin_id"]: (r["n_old"], r["n_new"], r["psi_term"])
        for r in stats.psi_drift(do, dn, "v", edges).collect()
    }
    js = {
        r["bin_id"]: r["js_term"]
        for r in stats.js_divergence(do, dn, "v", edges).collect()
    }
    assert set(psi) == set(js) == {0, 1, 2, 3}
    for i in range(4):
        p = max(bo[i] / to, eps)
        q = max(bn[i] / tn, eps)
        assert psi[i][0] == bo[i] and psi[i][1] == bn[i]
        assert abs(psi[i][2] - (q - p) * math.log(q / p)) < 1e-6
        m = (p + q) / 2
        want_js = 0.5 * p * math.log(p / m) + 0.5 * q * math.log(q / m)
        assert abs(js[i] - want_js) < 1e-6
