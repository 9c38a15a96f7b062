"""Wave-37 operator tests: SRM guardrail and lag features."""

from __future__ import annotations

import math

import pytest

from pyspark.sql import functions as F

from weather_api_automate_etl_spark.operators import stats, timeseries


# ---------------------------------------------------------------------------
# SRM check
# ---------------------------------------------------------------------------


def _srm(spark, rows, threshold=0.001):
    df = spark.createDataFrame(rows, "g string, u int")
    out = stats.srm_check(
        df, "g", "u", F.col("u") % 2, p_threshold=threshold
    )
    return {r["g"]: r for r in out.collect()}


def test_srm_balanced_split_passes(spark):
    rows = [("g", u) for u in range(100)]
    r = _srm(spark, rows)["g"]
    assert (r["n_0"], r["n_1"]) == (50, 50)
    assert r["z"] == 0.0 and r["p"] == pytest.approx(1.0)
    assert not r["srm"]


def test_srm_biased_split_flagged(spark):
    """900 even vs 100 odd units: z = 800/sqrt(1000) ~ 25 -> SRM."""
    rows = [("g", 2 * u) for u in range(900)]
    rows += [("g", 2 * u + 1) for u in range(100)]
    r = _srm(spark, rows)["g"]
    assert (r["n_0"], r["n_1"]) == (900, 100)
    assert r["z"] == pytest.approx(800 / math.sqrt(1000), abs=1e-6)
    assert r["srm"] and r["p"] == pytest.approx(0.0, abs=1e-6)


def test_srm_counts_units_not_events(spark):
    """One loud even user must not bias the unit ratio."""
    rows = [("g", 0)] * 500 + [("g", 1), ("g", 2), ("g", 3)]
    r = _srm(spark, rows)["g"]
    assert (r["n_0"], r["n_1"]) == (2, 2)
    assert not r["srm"]


def test_srm_rejects_bad_threshold(spark):
    df = spark.createDataFrame([("g", 1)], "g string, u int")
    with pytest.raises(ValueError, match="srm"):
        stats.srm_check(df, "g", "u", F.col("u") % 2, p_threshold=0.0)


# ---------------------------------------------------------------------------
# lag features
# ---------------------------------------------------------------------------


def _lag(spark, counts, **kw):
    rows = [("g", p) for p, c in enumerate(counts) for _ in range(c)]
    df = spark.createDataFrame(rows, "g string, p int")
    out = timeseries.lag_features(df, "g", "p", **kw)
    return sorted(out.collect(), key=lambda r: r["p"])


def test_lag_features_values_hand_checked(spark):
    counts = [1, 2, 3, 4, 5, 6, 7, 8, 9]
    got = _lag(spark, counts, lags=(1, 7), ma_window=7)
    # first dense row: p=7 (needs lag_7 and full 7-row MA ending at p>=6;
    # delta/lag_1 need p>=1) -> p=7, y=8
    assert got[0]["p"] == 7
    r = got[0]
    assert (r["y"], r["lag_1"], r["lag_7"], r["delta_1"]) == (8, 7, 1, 1)
    # ma_7 over p=1..7: (2+3+4+5+6+7+8)/7 = 5
    assert r["ma_7"] == pytest.approx(5.0)
    assert got[-1]["p"] == 8 and got[-1]["ma_7"] == pytest.approx(6.0)


def test_lag_features_warmup_dropped(spark):
    got = _lag(spark, [1] * 10, lags=(1, 3), ma_window=2)
    # need lag_3 -> first dense p = 3
    assert got[0]["p"] == 3
    assert all(r["lag_3"] == 1 and r["delta_1"] == 0 for r in got)


def test_lag_features_series_shorter_than_lags_empty(spark):
    got = _lag(spark, [1, 2, 3], lags=(7,), ma_window=2)
    assert got == []


def test_lag_features_validates_args(spark):
    import pyspark

    df = pyspark.sql.SparkSession.getActiveSession().createDataFrame(
        [("g", 0)], "g string, p int"
    )
    with pytest.raises(ValueError, match="lag_features"):
        timeseries.lag_features(df, "g", "p", lags=())
