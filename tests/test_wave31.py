"""Wave-31 operator tests: one-way ANOVA and Holt-Winters additive."""

from __future__ import annotations

import pytest

from weather_api_automate_etl_spark.operators import stats, timeseries


# ---------------------------------------------------------------------------
# one-way ANOVA
# ---------------------------------------------------------------------------


def _anova(spark, groups):
    rows = [(g, int(v)) for g, vals in groups.items() for v in vals]
    df = spark.createDataFrame(rows, "g string, y long")
    (r,) = stats.anova_oneway(df, "g", "y").collect()
    return r


def _ref_anova(groups):
    allv = [v for vals in groups.values() for v in vals]
    n, k = len(allv), len(groups)
    grand = sum(allv) / n
    ssb = sum(len(v) * (sum(v) / len(v) - grand) ** 2 for v in groups.values())
    ssw = sum(
        (x - sum(v) / len(v)) ** 2 for v in groups.values() for x in v
    )
    f = (ssb / (k - 1)) / (ssw / (n - k)) if ssw > 0 and k > 1 else None
    return ssb, ssw, f


def test_anova_hand_computed(spark):
    groups = {"a": [1, 2, 3], "b": [4, 5, 6], "c": [9, 10, 11]}
    r = _anova(spark, groups)
    ssb, ssw, f = _ref_anova(groups)
    assert r["k"] == 3 and r["n"] == 9
    assert r["ssb"] == pytest.approx(ssb, abs=1e-6)
    assert r["ssw"] == pytest.approx(ssw, abs=1e-6)
    assert r["f_stat"] == pytest.approx(f, abs=1e-5)


def test_anova_equal_means_f_near_zero(spark):
    groups = {"a": [1, 5, 9], "b": [5, 9, 1], "c": [9, 1, 5]}
    r = _anova(spark, groups)
    assert r["ssb"] == pytest.approx(0.0, abs=1e-9)
    assert r["f_stat"] == pytest.approx(0.0, abs=1e-9)


def test_anova_zero_within_variance_null_f(spark):
    groups = {"a": [2, 2, 2], "b": [7, 7, 7]}
    r = _anova(spark, groups)
    assert r["ssw"] == pytest.approx(0.0, abs=1e-9)
    assert r["f_stat"] is None
    assert r["ssb"] == pytest.approx(_ref_anova(groups)[0], abs=1e-6)


def test_anova_single_group_null_f(spark):
    r = _anova(spark, {"a": [1, 2, 3, 4]})
    assert r["k"] == 1 and r["f_stat"] is None


# ---------------------------------------------------------------------------
# Holt-Winters additive
# ---------------------------------------------------------------------------


def _hw(spark, series, **kw):
    rows = [(g, i, float(v)) for g, vals in series.items()
            for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "g string, o int, y double")
    out = timeseries.holt_winters_additive(df, "g", "o", "y", **kw)
    return {r["g"]: r for r in out.collect()}


def _ref_hw(ys, m, a, b, g):
    l = sum(ys[:m]) / m
    t = (sum(ys[m:2 * m]) / m - sum(ys[:m]) / m) / m
    s = [y - l for y in ys[:m]]
    for y in ys[m:]:
        shat = s.pop(0)
        lnew = a * (y - shat) + (1 - a) * (l + t)
        t = b * (lnew - l) + (1 - b) * t
        s.append(g * (y - lnew) + (1 - g) * shat)
        l = lnew
    return l, t, s[0]


def test_hw_matches_python_reference(spark):
    ys = [((i * 13) % 7) + 0.5 * i + ((i * 29) % 5) for i in range(25)]
    got = _hw(spark, {"g": ys}, season=7)["g"]
    l, t, sn = _ref_hw(ys, 7, 0.5, 0.25, 0.25)
    assert got["level"] == pytest.approx(l, abs=1e-6)
    assert got["trend"] == pytest.approx(t, abs=1e-6)
    assert got["season_next"] == pytest.approx(sn, abs=1e-6)
    assert got["forecast_1"] == pytest.approx(l + t + sn, abs=1e-6)
    assert got["n_points"] == 25


def test_hw_pure_seasonal_recovers_pattern(spark):
    """Exact weekly pattern, no trend: trend ~ 0 and the one-step
    forecast equals the next period's true value."""
    pattern = [10.0, 20.0, 30.0, 25.0, 15.0, 5.0, 0.0]
    ys = pattern * 4  # 28 points
    got = _hw(spark, {"g": ys}, season=7)["g"]
    assert got["trend"] == pytest.approx(0.0, abs=1e-9)
    # next point is pattern[0] = 10
    assert got["forecast_1"] == pytest.approx(10.0, abs=1e-6)


def test_hw_constant_series(spark):
    got = _hw(spark, {"g": [4.0] * 20}, season=5)["g"]
    assert got["level"] == pytest.approx(4.0, abs=1e-9)
    assert got["trend"] == pytest.approx(0.0, abs=1e-9)
    assert got["season_next"] == pytest.approx(0.0, abs=1e-9)


def test_hw_short_series_dropped(spark):
    got = _hw(spark, {"short": [1.0] * 13, "ok": [1.0] * 14}, season=7)
    assert set(got) == {"ok"}


def test_hw_rejects_bad_season(spark):
    import pyspark

    df = pyspark.sql.SparkSession.getActiveSession().createDataFrame(
        [("g", 0, 1.0)], "g string, o int, y double"
    )
    with pytest.raises(ValueError, match="season"):
        timeseries.holt_winters_additive(df, "g", "o", "y", season=1)


def test_anova_survives_int64_scale_sums(spark):
    """Σy² and the per-group s² fold must not wrap int64: with values
    near 4e9 a single y² ≈ 1.6e19 > 2^63−1, so a long-accumulated Σy²
    wraps negative, SSW turns negative, and f_stat silently NULLs (the
    cuped/roc_auc decimal discipline). Spread the groups wide so the
    double assembly keeps ~3 significant digits of SSW — the wrap is
    the only failure mode under test."""
    from fractions import Fraction as Fr

    ys_a = [0, 4_000_000_000]
    ys_b = [1_000_000_000, 3_500_000_000]
    rows = [("a", v) for v in ys_a] + [("b", v) for v in ys_b]
    df = spark.createDataFrame(rows, "g string, y long")
    (r,) = stats.anova_oneway(df, "g", "y").collect()
    n, k = 4, 2
    t_term = Fr(sum(ys_a)) ** 2 / 2 + Fr(sum(ys_b)) ** 2 / 2
    corr = Fr(sum(ys_a) + sum(ys_b)) ** 2 / n
    q = sum(Fr(v) ** 2 for v in ys_a + ys_b)
    ssb, ssw = t_term - corr, q - t_term
    f = (ssb / (k - 1)) / (ssw / (n - k))
    assert r["k"] == 2 and r["n"] == 4
    assert r["f_stat"] == pytest.approx(float(f), abs=1e-6)  # round-6 output
    assert r["ssw"] == pytest.approx(float(ssw), rel=1e-6)
