"""Wave-27 operator tests: ridge normal equations and Mann-Kendall."""

from __future__ import annotations

import math

import pytest

from weather_api_automate_etl_spark.operators import stats


# ---------------------------------------------------------------------------
# ridge regression (2 features + unpenalized intercept, Cramer solve)
# ---------------------------------------------------------------------------


def _ridge(spark, rows, lam):
    df = spark.createDataFrame(rows, "g string, y double, x1 double, x2 double")
    return {
        r["g"]: r
        for r in stats.ridge_regression_2f(
            df, "g", "y", "x1", "x2", lam
        ).collect()
    }


def _numpy_ridge(rows, lam):
    import numpy as np

    X = np.array([[1.0, r[2], r[3]] for r in rows])
    y = np.array([r[1] for r in rows])
    A = X.T @ X + lam * np.diag([0.0, 1.0, 1.0])
    return np.linalg.solve(A, X.T @ y)


def test_ridge_lambda_zero_recovers_exact_ols(spark):
    """Noise-free plane y = 2 + 3x1 - x2, λ=0: OLS is exact."""
    rows = [("g", float(2 + 3 * a - b), float(a), float(b))
            for a in range(5) for b in range(4)]
    got = _ridge(spark, rows, 0.0)["g"]
    assert (got["b0"], got["b1"], got["b2"]) == (2.0, 3.0, -1.0)
    assert got["n_rows"] == 20


def test_ridge_matches_numpy_closed_form(spark):
    rows = [("g", 1.5 * a - 0.7 * b + 4 + ((a * 7 + b * 3) % 5 - 2) * 0.25,
             float(a), float(b))
            for a in range(6) for b in range(5)]
    got = _ridge(spark, rows, 2.5)["g"]
    want = _numpy_ridge(rows, 2.5)
    assert got["b0"] == pytest.approx(want[0], abs=2e-6)
    assert got["b1"] == pytest.approx(want[1], abs=2e-6)
    assert got["b2"] == pytest.approx(want[2], abs=2e-6)


def test_ridge_survives_collinear_features(spark):
    """x2 = 2*x1 exactly: OLS normal equations are singular, ridge with
    λ>0 still solves and splits the coefficient mass."""
    rows = [("g", 5.0 * a + 1.0, float(a), 2.0 * a) for a in range(8)]
    got = _ridge(spark, rows, 1.0)["g"]
    want = _numpy_ridge(rows, 1.0)
    assert got["b1"] == pytest.approx(want[1], abs=2e-6)
    assert got["b2"] == pytest.approx(want[2], abs=2e-6)
    # shrinkage splits ~5/unit slope across x1 + 2*x2 directions
    assert got["b1"] + 2 * got["b2"] == pytest.approx(5.0, abs=0.1)


def test_ridge_shrinks_toward_zero_as_lambda_grows(spark):
    rows = [("g", 3.0 * a + 0.5 * b, float(a), float(b))
            for a in range(5) for b in range(5)]
    lo = _ridge(spark, rows, 0.1)["g"]
    hi = _ridge(spark, rows, 1000.0)["g"]
    assert abs(hi["b1"]) < abs(lo["b1"])
    assert abs(hi["b2"]) < abs(lo["b2"])


def test_ridge_rejects_negative_lambda(spark):
    df = spark.createDataFrame(
        [("g", 1.0, 1.0, 1.0)], "g string, y double, x1 double, x2 double"
    )
    with pytest.raises(ValueError, match="lam"):
        stats.ridge_regression_2f(df, "g", "y", "x1", "x2", -1.0)


# ---------------------------------------------------------------------------
# Mann-Kendall trend test
# ---------------------------------------------------------------------------


def _mk(spark, rows):
    """rows: (g, period, n_copies) -> one raw row per copy, so the
    per-period count series is exactly n_copies."""
    flat = [(g, p) for (g, p, n) in rows for _ in range(n)]
    df = spark.createDataFrame(flat, "g string, p int")
    return {
        r["g"]: r for r in stats.mann_kendall_trend(df, "g", "p").collect()
    }


def test_mk_strictly_increasing_no_ties(spark):
    """counts 1..5: S = C(5,2) = 10, Var = 5*4*15/18, z=(10-1)/sqrt(V)."""
    rows = [("g", p, p + 1) for p in range(5)]
    r = _mk(spark, rows)["g"]
    assert r["n_periods"] == 5 and r["s"] == 10
    v = 5 * 4 * 15 / 18
    assert r["var_s"] == pytest.approx(v, abs=1e-6)
    assert r["z"] == pytest.approx(9 / math.sqrt(v), abs=1e-6)


def test_mk_constant_series_s_zero(spark):
    rows = [("g", p, 3) for p in range(6)]
    r = _mk(spark, rows)["g"]
    assert r["s"] == 0 and r["z"] == 0.0
    # all 6 values tied: Var = (6*5*17 - 6*5*17)/18 = 0
    assert r["var_s"] == pytest.approx(0.0, abs=1e-9)


def test_mk_tie_correction_hand_computed(spark):
    """counts [1,2,2,3]: S = sign sums = 5 up-pairs? pairs:
    (1,2)+ (1,2)+ (1,3)+ (2,2)0 (2,3)+ (2,3)+ -> S=5.
    ties: one run of 2 -> tie = 2*1*9 = 18; Var = (4*3*13 - 18)/18."""
    rows = [("g", 0, 1), ("g", 1, 2), ("g", 2, 2), ("g", 3, 3)]
    r = _mk(spark, rows)["g"]
    assert r["s"] == 5
    v = (4 * 3 * 13 - 18) / 18
    assert r["var_s"] == pytest.approx(v, abs=1e-6)
    assert r["z"] == pytest.approx(4 / math.sqrt(v), abs=1e-6)


def test_mk_decreasing_negative_z_and_symmetry(spark):
    up = [("u", p, p + 1) for p in range(8)]
    dn = [("d", p, 8 - p) for p in range(8)]
    got = _mk(spark, up + dn)
    assert got["u"]["s"] == -got["d"]["s"]
    assert got["u"]["z"] == pytest.approx(-got["d"]["z"], abs=1e-9)
    assert got["d"]["z"] < -2.0
