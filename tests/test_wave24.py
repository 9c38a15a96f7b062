"""Wave-24 operator tests: Wilcoxon signed-rank and weighted quantiles."""

from __future__ import annotations

import math

import pytest

from weather_api_automate_etl_spark.operators import stats


# ---------------------------------------------------------------------------
# Wilcoxon signed-rank
# ---------------------------------------------------------------------------


def _pairs(spark, rows):
    return spark.createDataFrame(rows, "g string, x int, y int")


def test_wilcoxon_hand_computed_with_ties(spark):
    """diffs [1,-2,3,2,-1,4] (+ one zero pair, dropped): |d| ranks
    1.5,3.5,5,3.5,1.5,6 -> W+ = 16, mean 10.5, var 22.5."""
    rows = [("g", 1, 0), ("g", 0, 2), ("g", 3, 0), ("g", 2, 0),
            ("g", 0, 1), ("g", 4, 0), ("g", 5, 5)]
    (r,) = stats.wilcoxon_signed_rank(_pairs(spark, rows), "g", "x", "y").collect()
    assert r["n"] == 6 and r["w_plus"] == 16.0
    assert r["z"] == pytest.approx((16 - 10.5) / math.sqrt(22.5), abs=1e-6)


def test_wilcoxon_symmetric_diffs_z_near_zero(spark):
    rows = [("g", i, 0) for i in range(1, 11)]
    rows += [("g", 0, i) for i in range(1, 11)]  # mirrored negatives
    (r,) = stats.wilcoxon_signed_rank(_pairs(spark, rows), "g", "x", "y").collect()
    assert r["n"] == 20
    # perfect symmetry with tie pairs: W+ = half the total rank mass
    assert r["w_plus"] == 20 * 21 / 4
    assert abs(r["z"]) < 1e-9


def test_wilcoxon_one_sided_shift_is_extreme(spark):
    rows = [("g", i + 5, i) for i in range(1, 30)]  # all diffs +5
    (r,) = stats.wilcoxon_signed_rank(_pairs(spark, rows), "g", "x", "y").collect()
    # every rank positive: W+ = n(n+1)/2, z at its maximum
    n = 29
    assert r["w_plus"] == n * (n + 1) / 2
    assert r["z"] > 4.0


def test_wilcoxon_all_zero_diffs_absent(spark):
    rows = [("g", 1, 1), ("g", 2, 2)]
    assert stats.wilcoxon_signed_rank(_pairs(spark, rows), "g", "x", "y").isEmpty()


# ---------------------------------------------------------------------------
# weighted quantiles
# ---------------------------------------------------------------------------


def _wq(spark, rows, qs):
    df = spark.createDataFrame(rows, "g string, v double, w int")
    return {
        (r["g"], r["q"]): r["quantile"]
        for r in stats.weighted_quantiles(df, "g", "v", "w", qs=qs).collect()
    }


def test_weighted_quantile_left_continuous_inverse_cdf(spark):
    rows = [("g", 1.0, 1), ("g", 2.0, 1), ("g", 3.0, 1), ("g", 4.0, 7)]
    got = _wq(spark, rows, (0.1, 0.25, 0.5, 1.0))
    assert got == {("g", 0.1): 1.0, ("g", 0.25): 3.0,
                   ("g", 0.5): 4.0, ("g", 1.0): 4.0}


def test_weighted_quantile_unit_weights_match_type1_percentile(spark):
    vals = [float(v) for v in (5, 1, 9, 3, 7, 2, 8, 4, 6, 10)]
    rows = [("g", v, 1) for v in vals]
    got = _wq(spark, rows, (0.3, 0.5, 0.9))
    s = sorted(vals)
    for q in (0.3, 0.5, 0.9):
        assert got[("g", q)] == s[math.ceil(q * len(s)) - 1]


def test_weighted_quantile_pools_tied_values_and_guards(spark):
    rows = [("g", 2.0, 3), ("g", 2.0, 3), ("g", 5.0, 4)]
    got = _wq(spark, rows, (0.5, 0.7))
    assert got[("g", 0.5)] == 2.0   # pooled weight 6 of 10 covers .5
    assert got[("g", 0.7)] == 5.0
    with pytest.raises(ValueError, match="quantile levels"):
        _wq(spark, rows, (0.0,))


def test_weighted_quantile_zero_weight_rows_are_inert(spark):
    rows = [("g", 1.0, 0), ("g", 9.0, 5)]
    got = _wq(spark, rows, (0.5,))
    assert got[("g", 0.5)] == 9.0  # the 0-weight value can't be a quantile
