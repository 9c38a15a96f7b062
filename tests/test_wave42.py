"""Wave-42 operator tests: interval coalescing and cross-correlation."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from weather_api_automate_etl_spark.operators import timeseries, windows


def _merge(spark, rows):
    df = spark.createDataFrame(rows, "k string, s long, e long")
    out = windows.coalesce_intervals(df, "k", "s", "e")
    return sorted(
        (r["k"], r["island_seq"], r["island_start_us"],
         r["island_end_us"], r["n_intervals"], r["covered_us"])
        for r in out.collect()
    )


def test_coalesce_merges_overlap_and_touch(spark):
    rows = [("a", 0, 10), ("a", 5, 20), ("a", 20, 30), ("a", 40, 50)]
    got = _merge(spark, rows)
    # [0,10]∪[5,20]∪[20,30] merge (touch counts: start == running end),
    # [40,50] is its own island
    assert got == [("a", 1, 0, 30, 3, 30), ("a", 2, 40, 50, 1, 10)]


def test_coalesce_containment_needs_running_max(spark):
    # a long interval swallows a later short one; a naive lag(end)
    # comparison would wrongly reopen at (5, 8)
    rows = [("a", 0, 100), ("a", 5, 8), ("a", 50, 60), ("a", 150, 160)]
    got = _merge(spark, rows)
    assert got == [("a", 1, 0, 100, 3, 100), ("a", 2, 150, 160, 1, 10)]


def test_coalesce_keys_are_independent(spark):
    rows = [("a", 0, 10), ("b", 5, 15)]
    got = _merge(spark, rows)
    assert got == [("a", 1, 0, 10, 1, 10), ("b", 1, 5, 15, 1, 10)]


def _ccf(spark, days):
    # days: list of (date_str, x, y)
    df = spark.createDataFrame(
        [(d, float(x), float(y)) for d, x, y in days],
        "ts string, xv double, yv double",
    ).select(F.col("ts").cast("timestamp").alias("ts"), "xv", "yv")
    out = timeseries.cross_correlation(
        df, "ts", F.col("xv"), F.col("yv"), max_lag=1
    )
    return {r["lag"]: r for r in out.collect()}


def test_ccf_lag_zero_perfect_correlation(spark):
    days = [(f"2024-01-0{i}", i, 2 * i) for i in range(1, 8)]
    got = _ccf(spark, days)
    assert got[0]["r_xy"] == pytest.approx(1.0)
    assert got[0]["n_days"] == 7


def test_ccf_shifted_series_peaks_at_its_lag(spark):
    # y tomorrow equals x today → corr(x_t, y_{t+1}) = 1 at lag +1
    xs = [3.0, 1.0, 4.0, 1.0, 5.0, 9.0, 2.0]
    days = [
        (f"2024-01-0{i + 1}", xs[i], xs[i - 1] if i > 0 else 7.0)
        for i in range(7)
    ]
    got = _ccf(spark, days)
    assert got[1]["r_xy"] == pytest.approx(1.0)
    assert got[1]["n_days"] == 6
    assert abs(got[0]["r_xy"]) < 1.0


def test_ccf_constant_series_yields_null(spark):
    days = [(f"2024-01-0{i}", 5, i) for i in range(1, 8)]
    got = _ccf(spark, days)
    assert all(r["r_xy"] is None for r in got.values())


def test_ccf_rejects_bad_lag(spark):
    df = spark.createDataFrame(
        [("2024-01-01", 1.0, 1.0)], "ts string, xv double, yv double"
    )
    with pytest.raises(ValueError):
        timeseries.cross_correlation(
            df, "ts", F.col("xv"), F.col("yv"), max_lag=0
        )
