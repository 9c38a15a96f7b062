"""Wave-54 operator tests: rolling actives and new-vs-returning."""

from __future__ import annotations

import datetime as dt

import pytest

from weather_api_automate_etl_spark.operators import windows


def _ev(spark, rows):
    # rows: (user, day-of-month)
    return spark.createDataFrame(
        [(u, dt.datetime(2024, 1, d, 12)) for u, d in rows],
        "user_id long, ts timestamp",
    )


def _actives(spark, rows, w=7):
    out = windows.rolling_active_users(_ev(spark, rows), "user_id", "ts", w)
    return {r["day"].isoformat(): r["n_active"] for r in out.collect()}


def test_rolling_actives_brute_force(spark):
    rows = [(1, 1), (1, 3), (2, 2), (3, 9), (2, 10)]
    got = _actives(spark, rows, w=7)
    days = {d for _, d in rows}
    for d in days:
        want = len(
            {u for u, a in rows if d - 6 <= a <= d}
        )
        assert got[f"2024-01-{d:02d}"] == want


def test_rolling_actives_user_counted_once_per_window(spark):
    # user 1 active twice inside one window → still 1 active
    rows = [(1, 1), (1, 2)]
    got = _actives(spark, rows, w=7)
    assert got["2024-01-02"] == 1


def test_rolling_actives_only_event_days_reported(spark):
    rows = [(1, 1)]
    got = _actives(spark, rows, w=7)
    assert list(got) == ["2024-01-01"]  # no phantom tail days


def test_rolling_actives_window_one_is_dau(spark):
    rows = [(1, 1), (2, 1), (1, 2)]
    got = _actives(spark, rows, w=1)
    assert got == {"2024-01-01": 2, "2024-01-02": 1}


def test_rolling_actives_rejects_bad_window(spark):
    with pytest.raises(ValueError):
        windows.rolling_active_users(
            _ev(spark, [(1, 1)]), "user_id", "ts", 0
        )


def _nvr(spark, rows):
    out = windows.new_vs_returning(_ev(spark, rows), "user_id", "ts")
    return {r["day"].isoformat(): r for r in out.collect()}


def test_new_vs_returning_split(spark):
    rows = [(1, 1), (2, 1), (1, 2), (3, 2)]
    got = _nvr(spark, rows)
    d1, d2 = got["2024-01-01"], got["2024-01-02"]
    assert d1["n_new"] == 2 and d1["n_returning"] == 0
    assert d2["n_new"] == 1 and d2["n_returning"] == 1
    assert d2["n_active"] == 2


def test_new_vs_returning_same_day_multiple_events_one_user_day(spark):
    rows = [(1, 1), (1, 1)]
    got = _nvr(spark, rows)
    assert got["2024-01-01"]["n_new"] == 1
    assert got["2024-01-01"]["n_active"] == 1
