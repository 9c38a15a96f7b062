"""Wave-51 operator tests: order-statistic median CI."""

from __future__ import annotations

import math

import pytest

from weather_api_automate_etl_spark.operators import stats


def _ci(spark, rows, z=1.96):
    df = spark.createDataFrame(rows, "g string, v double")
    out = stats.median_ci(df, "g", "v", z=z)
    return {r["g"]: r for r in out.collect()}


def test_median_ci_hand_computed(spark):
    vals = list(range(1, 26))  # n = 25
    rows = [("a", float(v)) for v in vals]
    got = _ci(spark, rows)["a"]
    n = 25
    lo = max(math.floor(n / 2 - 1.96 * math.sqrt(n) / 2), 1)
    hi = min(math.ceil(n / 2 + 1 + 1.96 * math.sqrt(n) / 2), n)
    assert got["median"] == 13.0  # rank 13
    assert got["ci_lo"] == float(vals[lo - 1])
    assert got["ci_hi"] == float(vals[hi - 1])
    assert got["ci_lo"] <= got["median"] <= got["ci_hi"]


def test_median_ci_endpoints_are_data_values(spark):
    vals = [3.25, 1.5, 9.75, 2.125, 7.0, 4.5, 8.25]
    rows = [("a", v) for v in vals]
    got = _ci(spark, rows)["a"]
    assert got["median"] in vals
    assert got["ci_lo"] in vals and got["ci_hi"] in vals


def test_median_ci_singleton_collapses(spark):
    got = _ci(spark, [("a", 42.0)])["a"]
    assert got["median"] == got["ci_lo"] == got["ci_hi"] == 42.0
    assert got["n"] == 1


def test_median_ci_wider_z_widens_interval(spark):
    rows = [("a", float(v)) for v in range(1, 51)]
    narrow = _ci(spark, rows, z=1.0)["a"]
    wide = _ci(spark, rows, z=2.58)["a"]
    assert wide["ci_lo"] <= narrow["ci_lo"]
    assert wide["ci_hi"] >= narrow["ci_hi"]


def test_median_ci_groups_independent(spark):
    rows = [("a", 1.0), ("a", 2.0), ("a", 3.0), ("b", 100.0)]
    got = _ci(spark, rows)
    assert got["a"]["median"] == 2.0 and got["b"]["median"] == 100.0


def test_median_ci_rejects_bad_z(spark):
    df = spark.createDataFrame([("a", 1.0)], "g string, v double")
    with pytest.raises(ValueError):
        stats.median_ci(df, "g", "v", z=0.0)
