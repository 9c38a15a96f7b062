"""Wave-35 operator tests: longest streaks and control charts."""

from __future__ import annotations

import datetime as dt

import pytest

from weather_api_automate_etl_spark.operators import timeseries, windows


# ---------------------------------------------------------------------------
# longest streak
# ---------------------------------------------------------------------------


def _streak(spark, rows):
    data = [(u, dt.date(2024, 1, d)) for (u, d) in rows]
    df = spark.createDataFrame(data, "k int, d date")
    return {
        r["k"]: r for r in windows.longest_streak(df, "k", "d").collect()
    }


def test_streak_finds_longest_island(spark):
    """User 1: days 1-3 then 10-15 -> longest 6 starting Jan 10."""
    rows = [(1, d) for d in (1, 2, 3, 10, 11, 12, 13, 14, 15)]
    r = _streak(spark, rows)[1]
    assert r["longest_streak"] == 6
    assert r["streak_start"] == dt.date(2024, 1, 10)
    assert r["n_active_days"] == 9


def test_streak_duplicate_events_one_day_counted_once(spark):
    rows = [(1, 5), (1, 5), (1, 5), (1, 6)]
    r = _streak(spark, rows)[1]
    assert r["n_active_days"] == 2 and r["longest_streak"] == 2


def test_streak_tie_breaks_to_earliest(spark):
    """Two 2-day runs: report the earlier one's start."""
    rows = [(1, 1), (1, 2), (1, 10), (1, 11)]
    r = _streak(spark, rows)[1]
    assert r["longest_streak"] == 2
    assert r["streak_start"] == dt.date(2024, 1, 1)


def test_streak_isolated_days_are_length_one(spark):
    rows = [(1, 1), (1, 3), (1, 5)]
    r = _streak(spark, rows)[1]
    assert r["longest_streak"] == 1 and r["n_active_days"] == 3


# ---------------------------------------------------------------------------
# control chart
# ---------------------------------------------------------------------------


def _cc(spark, series, n_sigma=3.0):
    rows = [(g, p) for g, counts in series.items()
            for p, c in enumerate(counts) for _ in range(c)]
    df = spark.createDataFrame(rows, "g string, p int")
    out = timeseries.control_chart(df, "g", "p", n_sigma=n_sigma)
    return sorted(
        (r for r in out.collect()), key=lambda r: (r["g"], r["p"])
    )


def test_control_chart_flags_the_spike(spark):
    counts = [10, 11, 9, 10, 10, 11, 9, 10, 40, 10, 11, 9]
    got = _cc(spark, {"g": counts})
    flags = [r["out_of_control"] for r in got]
    assert flags[8] is True
    assert sum(flags) == 1
    center = got[0]["center"]
    assert center == pytest.approx(sum(counts) / len(counts), abs=1e-6)


def test_control_chart_limits_hand_computed(spark):
    import math
    counts = [4, 6, 5, 5]
    got = _cc(spark, {"g": counts}, n_sigma=2.0)
    mean = 5.0
    sd = math.sqrt(((16 + 36 + 25 + 25) - 400 / 4) / 3)
    assert got[0]["ucl"] == pytest.approx(mean + 2 * sd, abs=1e-6)
    assert got[0]["lcl"] == pytest.approx(mean - 2 * sd, abs=1e-6)
    assert not any(r["out_of_control"] for r in got)


def test_control_chart_stable_series_all_in_control(spark):
    got = _cc(spark, {"g": [7, 8, 7, 8, 7, 8, 7, 8]})
    assert not any(r["out_of_control"] for r in got)


def test_control_chart_rejects_bad_sigma(spark):
    import pyspark

    df = pyspark.sql.SparkSession.getActiveSession().createDataFrame(
        [("g", 0)], "g string, p int"
    )
    with pytest.raises(ValueError, match="n_sigma"):
        timeseries.control_chart(df, "g", "p", n_sigma=0)
