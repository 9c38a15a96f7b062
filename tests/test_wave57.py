"""Wave-57 operator tests: time-to-convert and MDE."""

from __future__ import annotations

import datetime as dt

import pytest

from weather_api_automate_etl_spark.operators import stats


def _ttc(spark, rows):
    # rows: (user, type, day, hour)
    df = spark.createDataFrame(
        [(u, ty, dt.datetime(2024, 1, d, h)) for u, ty, d, h in rows],
        "user_id long, event_type string, ts timestamp",
    )
    return stats.time_to_convert(
        df, "user_id", "event_type", "ts", "view", "purchase"
    ).collect()[0]


def test_ttc_counts_and_delays(spark):
    rows = [
        (1, "view", 1, 0), (1, "purchase", 1, 2),     # 2h delay
        (2, "view", 1, 0), (2, "purchase", 2, 0),     # 24h delay
        (3, "view", 1, 0),                            # never converts
        (4, "purchase", 1, 0), (4, "view", 1, 5),     # bought BEFORE view
    ]
    got = _ttc(spark, rows)
    assert got["n_from"] == 4 and got["n_converted"] == 2
    assert got["conv_rate"] == 0.5
    # delays {7200, 86400}: median = first value whose cum >= 1 → 7200
    assert got["median_delay_s"] == 7200
    assert got["p90_delay_s"] == 86400


def test_ttc_no_converters_null_delays(spark):
    rows = [(1, "view", 1, 0), (2, "view", 2, 0)]
    got = _ttc(spark, rows)
    assert got["n_converted"] == 0 and got["conv_rate"] == 0.0
    assert got["median_delay_s"] is None and got["p90_delay_s"] is None


def test_ttc_delay_is_order_statistic(spark):
    rows = []
    for u, hours in enumerate([1, 2, 3, 4, 5], start=1):
        rows += [(u, "view", 1, 0), (u, "purchase", 1, hours)]
    got = _ttc(spark, rows)
    assert got["median_delay_s"] == 3 * 3600  # 3rd of 5
    assert got["p90_delay_s"] == 5 * 3600     # ceil(0.9*5)=5th


def _mde(spark, rows):
    df = spark.createDataFrame(rows, "u long, v double")
    return stats.minimum_detectable_effect(df, "u", "v").collect()[0]


def test_mde_matches_closed_form(spark):
    import math

    rows = [(u, float(u % 7) + 1) for u in range(200)]
    got = _mde(spark, rows)
    se = math.sqrt(
        got["sd_a"] ** 2 / got["n_a"] + got["sd_b"] ** 2 / got["n_b"]
    )
    assert got["mde_abs"] == pytest.approx(2.801585 * se, abs=1e-5)
    assert got["mde_rel"] == pytest.approx(
        got["mde_abs"] / got["mean_a"], abs=1e-5
    )


def test_mde_shrinks_with_sample_size(spark):
    small = _mde(spark, [(u, float(u % 5)) for u in range(40)])
    large = _mde(spark, [(u, float(u % 5)) for u in range(400)])
    assert large["mde_abs"] < small["mde_abs"]


def test_mde_constant_metric_is_null(spark):
    got = _mde(spark, [(u, 5.0) for u in range(50)])
    assert got["mde_abs"] is None and got["mde_rel"] is None
