"""Wave-55 operator tests: exact group percentiles and stickiness."""

from __future__ import annotations

import datetime as dt

import pytest

from pyspark.sql import functions as F

from weather_api_automate_etl_spark.operators import stats


def _pct(spark, rows, quantiles=(0.5, 0.95)):
    df = spark.createDataFrame(rows, "g string, v double")
    out = stats.group_percentiles_exact(df, "g", "v", quantiles)
    return {r["g"]: r for r in out.collect()}


def test_percentiles_nearest_rank(spark):
    vals = [float(v) for v in range(1, 11)]  # 1..10
    rows = [("a", v) for v in vals]
    got = _pct(spark, rows)["a"]
    # nearest rank: p50 → rank ceil(5.0)=5 → value 5; p95 → rank 10
    assert got["p_50"] == 5.0 and got["p_95"] == 10.0
    assert got["n"] == 10


def test_percentiles_are_actual_values(spark):
    vals = [3.25, 1.5, 9.75, 2.125, 7.0]
    rows = [("a", v) for v in vals]
    got = _pct(spark, rows, quantiles=(0.5, 0.9, 1.0))["a"]
    assert got["p_50"] in vals and got["p_90"] in vals
    assert got["p_100"] == max(vals)


def test_percentiles_singleton_group(spark):
    got = _pct(spark, [("a", 42.0)])["a"]
    assert got["p_50"] == 42.0 and got["p_95"] == 42.0


def test_percentiles_groups_independent(spark):
    rows = [("a", 1.0), ("a", 2.0), ("b", 100.0)]
    got = _pct(spark, rows)
    assert got["b"]["p_50"] == 100.0 and got["a"]["p_50"] == 1.0


def test_percentiles_column_naming(spark):
    got = _pct(spark, [("a", 1.0)], quantiles=(0.999,))["a"]
    assert "p_99_9" in got.asDict()


def test_percentiles_reject_bad_quantiles(spark):
    df = spark.createDataFrame([("a", 1.0)], "g string, v double")
    with pytest.raises(ValueError):
        stats.group_percentiles_exact(df, "g", "v", (0.0,))
    with pytest.raises(ValueError):
        stats.group_percentiles_exact(df, "g", "v", ())


def test_stickiness_bounds(spark):
    from weather_api_automate_etl_spark.operators import windows

    df = spark.createDataFrame(
        [(u, dt.datetime(2024, 1, d, 9)) for u, d in
         [(1, 1), (2, 1), (1, 2), (1, 3), (3, 3)]],
        "user_id long, ts timestamp",
    )
    dau = windows.rolling_active_users(df, "user_id", "ts", 1)
    wau = windows.rolling_active_users(df, "user_id", "ts", 7)
    j = {r["day"].day: (r["n_active"],) for r in dau.collect()}
    w = {r["day"].day: r["n_active"] for r in wau.collect()}
    for d, (n_dau,) in j.items():
        assert 0 < n_dau <= w[d]  # DAU never exceeds trailing WAU
    assert w[3] == 3  # all three users within the trailing week of day 3
