"""Wave-33 operator tests: decision stump and seasonal-naive backtest."""

from __future__ import annotations

import pytest

from weather_api_automate_etl_spark.operators import stats, timeseries


# ---------------------------------------------------------------------------
# decision stump
# ---------------------------------------------------------------------------


def _stump(spark, rows):
    df = spark.createDataFrame(rows, "g string, x double, y int")
    return {
        r["g"]: r
        for r in stats.decision_stump(df, "g", "x", "y").collect()
    }


def test_stump_finds_clean_step(spark):
    """y jumps from 1 to 9 at x > 0.3: the stump must split at 0.3."""
    rows = [("g", x / 10, 1) for x in range(4)]          # x in 0..0.3 -> y=1
    rows += [("g", x / 10, 9) for x in range(4, 8)]      # x .4-.7 -> y=9
    r = _stump(spark, rows)["g"]
    assert r["split_x"] == pytest.approx(0.3)
    assert r["mean_left"] == pytest.approx(1.0)
    assert r["mean_right"] == pytest.approx(9.0)
    assert (r["n_left"], r["n_right"]) == (4, 4)


def test_stump_gain_matches_brute_force(spark):
    ys = {0.0: [3, 4], 0.1: [5], 0.2: [10, 11], 0.3: [12]}
    rows = [("g", x, y) for x, vals in ys.items() for y in vals]
    r = _stump(spark, rows)["g"]
    xs = sorted(ys)
    best = None
    for t in xs[:-1]:
        left = [y for x, vals in ys.items() if x <= t for y in vals]
        right = [y for x, vals in ys.items() if x > t for y in vals]
        gain = sum(left) ** 2 / len(left) + sum(right) ** 2 / len(right)
        if best is None or gain > best[1] + 1e-12:
            best = (t, gain)
    assert r["split_x"] == pytest.approx(best[0])
    assert r["gain"] == pytest.approx(best[1], abs=1e-6)


def test_stump_constant_y_ties_break_low(spark):
    """All gains equal when y is constant: pick the smallest threshold."""
    rows = [("g", float(x), 5) for x in range(4)]
    r = _stump(spark, rows)["g"]
    assert r["split_x"] == pytest.approx(0.0)
    assert r["mean_left"] == r["mean_right"] == pytest.approx(5.0)


def test_stump_single_feature_value_empty(spark):
    """One distinct x -> no valid threshold -> no row for the group."""
    rows = [("g", 1.0, 2), ("g", 1.0, 8), ("h", 0.0, 1), ("h", 1.0, 9)]
    got = _stump(spark, rows)
    assert set(got) == {"h"}


# ---------------------------------------------------------------------------
# seasonal-naive backtest
# ---------------------------------------------------------------------------


def _bt(spark, series, season=7, horizon=5):
    rows = [(g, p) for g, counts in series.items()
            for p, c in enumerate(counts) for _ in range(c)]
    df = spark.createDataFrame(rows, "g string, p int")
    out = timeseries.backtest_seasonal_naive(
        df, "g", "p", season=season, horizon=horizon
    )
    return {r["g"]: r for r in out.collect()}


def test_backtest_perfect_seasonality_skill_zero(spark):
    """Exact weekly repetition: seasonal-naive error 0, last-value
    error > 0 -> skill = 0."""
    pattern = [5, 9, 3, 7, 2, 8, 4]
    got = _bt(spark, {"g": pattern * 4})["g"]
    assert got["mae_seasonal"] == pytest.approx(0.0)
    assert got["mae_naive"] > 0
    assert got["skill"] == pytest.approx(0.0)


def test_backtest_hand_computed_errors(spark):
    """Series of 16 points, season 4, horizon 2: test points are the
    last two periods with both lags defined."""
    counts = [1, 2, 3, 4, 1, 2, 3, 4, 1, 2, 3, 4, 1, 2, 9, 4]
    got = _bt(spark, {"g": counts}, season=4, horizon=2)["g"]
    # test periods: p=14 (y=9, ys=3, y1=2), p=15 (y=4, ys=4, y1=9)
    assert got["n_test"] == 2
    assert got["mae_seasonal"] == pytest.approx((6 + 0) / 2)
    assert got["mae_naive"] == pytest.approx((7 + 5) / 2)
    assert got["skill"] == pytest.approx(3.0 / 6.0)


def test_backtest_short_series_dropped(spark):
    """A series whose horizon window lacks the season lag is dropped."""
    got = _bt(spark, {"short": [1] * 8, "ok": [1] * 14}, season=7,
              horizon=5)
    assert set(got) == {"ok"}


def test_backtest_validates_args(spark):
    import pyspark

    df = pyspark.sql.SparkSession.getActiveSession().createDataFrame(
        [("g", 0)], "g string, p int"
    )
    with pytest.raises(ValueError, match="backtest"):
        timeseries.backtest_seasonal_naive(df, "g", "p", season=0)
