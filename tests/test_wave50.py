"""Wave-50 operator tests: CUPED variance reduction."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from weather_api_automate_etl_spark.operators import stats


def _cuped(spark, rows, salt="s"):
    # rows: (user, val, post)
    df = spark.createDataFrame(rows, "u long, v long, post boolean")
    return stats.cuped_adjusted_lift(
        df, "u", F.col("v"), F.col("v"), F.col("post"), salt=salt
    ).collect()[0]


def _units(spark, per_unit, salt="s"):
    # per_unit: {user: (x, y)} → event rows
    rows = []
    for u, (x, y) in per_unit.items():
        rows.append((u, x, False))
        rows.append((u, y, True))
    return _cuped(spark, rows, salt=salt)


def test_cuped_perfect_covariate_kills_variance(spark):
    # y = x exactly for every unit → rho2 = 1, theta = 1,
    # and adj_diff collapses the raw arm difference to ~0
    per_unit = {u: (u * 3 + 1, u * 3 + 1) for u in range(1, 41)}
    got = _units(spark, per_unit)
    assert got["theta"] == pytest.approx(1.0, abs=1e-6)
    assert got["rho2"] == pytest.approx(1.0, abs=1e-6)
    assert got["adj_diff"] == pytest.approx(0.0, abs=1e-6)


def test_cuped_uncorrelated_covariate_changes_little(spark):
    # constant covariate → zero variance → theta/adjusted NULL (guarded)
    per_unit = {u: (7, u) for u in range(1, 21)}
    got = _units(spark, per_unit)
    assert got["theta"] is None and got["adj_diff"] is None
    assert got["raw_diff"] is not None


def test_cuped_moments_match_hand_computation(spark):
    per_unit = {1: (1, 2), 2: (2, 4), 3: (3, 7), 4: (4, 8), 5: (5, 9)}
    got = _units(spark, per_unit)
    xs = [v[0] for v in per_unit.values()]
    ys = [v[1] for v in per_unit.values()]
    n = len(xs)
    cov = n * sum(x * y for x, y in zip(xs, ys)) - sum(xs) * sum(ys)
    vx = n * sum(x * x for x in xs) - sum(xs) ** 2
    assert got["theta"] == pytest.approx(cov / vx, abs=1e-6)


def test_cuped_split_is_deterministic(spark):
    per_unit = {u: (u, u + 1) for u in range(1, 31)}
    a = _units(spark, per_unit)
    b = _units(spark, per_unit)
    assert a["n_a"] == b["n_a"] and a["adj_diff"] == b["adj_diff"]
    # a different salt produces a different (but valid) split
    c = _units(spark, per_unit, salt="other")
    assert c["n_a"] + c["n_b"] == a["n_a"] + a["n_b"] == 30


def test_cuped_units_missing_a_period_get_zero(spark):
    rows = [(1, 5, False), (1, 6, True), (2, 9, True)]  # user 2: no pre
    got = _cuped(spark, rows)
    assert got["n_a"] + got["n_b"] == 2


def test_cuped_second_moments_survive_int64_scale(spark):
    """Σx², Σxy, Σy² must accumulate exactly past int64: with per-unit
    covariates near 2^31, four units push Σx² to ~1.8e19 > 2^63−1 — a
    long-accumulated sum wraps negative and theta/rho2 turn garbage
    (the roc_auc/youden decimal(38,0) discipline, applied here)."""
    # x = u·1e9 spreads the covariate so var(x) is real signal (clears
    # the relative cancellation floor) while Σx² ≈ 2e20 ≫ 2^63−1
    per_unit = {u: (u * 1_000_000_000, u % 3) for u in range(1, 9)}
    got = _units(spark, per_unit)
    assert got["n_a"] + got["n_b"] == 8
    xs = [x for x, _ in per_unit.values()]
    ys = [y for _, y in per_unit.values()]
    n = len(xs)
    cov_n = n * sum(a * b for a, b in zip(xs, ys)) - sum(xs) * sum(ys)
    var_x = n * sum(a * a for a in xs) - sum(xs) ** 2  # exact python ints
    # a wrapped Σx² flips var_x's sign/magnitude → theta off by orders
    assert got["theta"] == pytest.approx(cov_n / var_x, abs=1e-6)
