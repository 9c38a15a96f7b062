"""Wave-28 operator tests: linear attribution and Theil-Sen trend."""

from __future__ import annotations

import datetime as dt

import pytest

from weather_api_automate_etl_spark.operators import stats


# ---------------------------------------------------------------------------
# linear multi-touch attribution
# ---------------------------------------------------------------------------


def _ev(spark, rows):
    """rows: (user, type, day, event_id) with day -> 2024-01-<day>."""
    data = [
        (u, ty, dt.datetime(2024, 1, d, 12, 0, 0), i)
        for (u, ty, d, i) in rows
    ]
    return spark.createDataFrame(
        data, "user_id int, event_type string, ts timestamp, event_id int"
    )


def _attr(spark, rows, window_days=7):
    df = _ev(spark, rows)
    return {
        r["channel"]: r
        for r in stats.linear_attribution(
            df, "user_id", "event_type", "ts", "event_id",
            "purchase", ("click", "view"), window_days
        ).collect()
    }


def test_attribution_splits_credit_equally(spark):
    """One purchase after 1 click + 3 views: click 0.25, view 0.75."""
    rows = [(1, "click", 2, 1), (1, "view", 3, 2), (1, "view", 4, 3),
            (1, "view", 5, 4), (1, "purchase", 6, 5)]
    got = _attr(spark, rows)
    assert got["click"]["credit"] == pytest.approx(0.25)
    assert got["view"]["credit"] == pytest.approx(0.75)
    assert got["view"]["n_touchpoints"] == 3
    assert got["view"]["n_conversions"] == 1
    assert "(direct)" not in got


def test_attribution_total_credit_equals_conversions(spark):
    """Invariant: Σ credit over all channels (incl. direct) = #purchases."""
    rows = [(1, "click", 1, 1), (1, "purchase", 3, 2),
            (2, "purchase", 5, 3),                     # no touches -> direct
            (3, "view", 2, 4), (3, "click", 4, 5), (3, "purchase", 6, 6),
            (3, "purchase", 8, 7)]
    got = _attr(spark, rows)
    assert sum(r["credit"] for r in got.values()) == pytest.approx(4.0)
    assert got["(direct)"]["n_conversions"] == 1


def test_attribution_window_excludes_stale_and_future_touches(spark):
    """Touch 8 days before and touch after the purchase both drop; the
    purchase lands in (direct)."""
    rows = [(1, "click", 1, 1), (1, "purchase", 9, 2), (1, "view", 10, 3)]
    got = _attr(spark, rows, window_days=7)
    assert set(got) == {"(direct)"}
    assert got["(direct)"]["credit"] == pytest.approx(1.0)
    # widening the window attributes the early click instead
    got_wide = _attr(spark, rows, window_days=10)
    assert set(got_wide) == {"click"}


def test_attribution_cross_user_touches_never_leak(spark):
    rows = [(1, "click", 2, 1), (2, "purchase", 3, 2)]
    got = _attr(spark, rows)
    assert set(got) == {"(direct)"}


def test_attribution_rejects_empty_touch_types(spark):
    df = _ev(spark, [(1, "purchase", 2, 1)])
    with pytest.raises(ValueError, match="touch_types"):
        stats.linear_attribution(
            df, "user_id", "event_type", "ts", "event_id", "purchase", ()
        )


# ---------------------------------------------------------------------------
# Theil-Sen trend
# ---------------------------------------------------------------------------


def _ts(spark, rows):
    """rows: (g, period, n_copies)."""
    flat = [(g, p) for (g, p, n) in rows for _ in range(n)]
    df = spark.createDataFrame(flat, "g string, p int")
    return {
        r["g"]: r for r in stats.theil_sen_trend(df, "g", "p").collect()
    }


def test_theil_sen_exact_line(spark):
    """counts 2,4,6,8 at periods 0..3: every pairwise slope is 2."""
    rows = [("g", p, 2 * (p + 1)) for p in range(4)]
    r = _ts(spark, rows)["g"]
    assert r["slope"] == pytest.approx(2.0)
    assert r["intercept"] == pytest.approx(2.0)
    assert r["n_periods"] == 4


def test_theil_sen_resists_single_outlier(spark):
    """Line y = x + 1 over 9 periods with one spiked day: the median
    slope stays 1 (breakdown ~29%), whereas OLS would tilt."""
    rows = [("g", p, p + 1) for p in range(9)]
    rows[4] = ("g", 4, 500)  # spike
    r = _ts(spark, rows)["g"]
    assert r["slope"] == pytest.approx(1.0)
    assert r["intercept"] == pytest.approx(1.0)


def test_theil_sen_even_pair_count_averages_middles(spark):
    """Periods 0,1,2,3 with counts 1,2,4,4: slopes = [1, 3/2, 1,
    2, 1, 0] sorted -> [0,1,1,1,1.5,2]; median = (1+1)/2 = 1."""
    rows = [("g", 0, 1), ("g", 1, 2), ("g", 2, 4), ("g", 3, 4)]
    r = _ts(spark, rows)["g"]
    assert r["slope"] == pytest.approx(1.0)


def test_theil_sen_negative_trend(spark):
    rows = [("g", p, 20 - 3 * p) for p in range(6)]
    r = _ts(spark, rows)["g"]
    assert r["slope"] == pytest.approx(-3.0)
    assert r["intercept"] == pytest.approx(20.0)
