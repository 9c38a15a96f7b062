"""Wave-52 operator tests: McNemar and Cohen's kappa."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from weather_api_automate_etl_spark.operators import stats


def _mcnemar(spark, rows):
    df = spark.createDataFrame(rows, "y boolean, a boolean, b boolean")
    return stats.mcnemar_test(
        df, F.col("y"), F.col("a"), F.col("b")
    ).collect()[0]


def test_mcnemar_hand_computed(spark):
    # 3 rows A-only correct, 1 row B-only correct, 2 both correct
    rows = (
        [(True, True, False)] * 3
        + [(True, False, True)] * 1
        + [(True, True, True)] * 2
    )
    got = _mcnemar(spark, rows)
    assert got["a_only_correct"] == 3 and got["b_only_correct"] == 1
    assert got["both_correct"] == 2 and got["both_wrong"] == 0
    assert got["chi2"] == pytest.approx((3 - 1) ** 2 / 4, abs=1e-6)


def test_mcnemar_identical_predictions_null(spark):
    rows = [(True, True, True), (False, True, True)]
    got = _mcnemar(spark, rows)
    assert got["chi2"] is None
    assert got["a_only_correct"] == 0 and got["b_only_correct"] == 0


def test_mcnemar_symmetric_discordance_is_zero(spark):
    rows = [(True, True, False), (True, False, True)]
    got = _mcnemar(spark, rows)
    assert got["chi2"] == 0.0


def _kappa(spark, rows):
    df = spark.createDataFrame(rows, "a boolean, b boolean")
    return stats.cohens_kappa(df, F.col("a"), F.col("b")).collect()[0]


def test_kappa_perfect_agreement(spark):
    rows = [(True, True)] * 3 + [(False, False)] * 3
    got = _kappa(spark, rows)
    assert got["p_o"] == 1.0 and got["kappa"] == pytest.approx(1.0)


def test_kappa_hand_computed(spark):
    # n11=20, n00=15, n10=5, n01=10 (the standard textbook example shape)
    rows = (
        [(True, True)] * 20 + [(False, False)] * 15
        + [(True, False)] * 5 + [(False, True)] * 10
    )
    got = _kappa(spark, rows)
    n = 50
    po = 35 / n
    pa1, pb1 = 25 / n, 30 / n
    pe = pa1 * pb1 + (1 - pa1) * (1 - pb1)
    assert got["p_o"] == pytest.approx(po, abs=1e-6)
    assert got["kappa"] == pytest.approx((po - pe) / (1 - pe), abs=1e-6)


def test_kappa_constant_raters_undefined(spark):
    rows = [(True, True)] * 4  # p_e = 1 → kappa undefined
    got = _kappa(spark, rows)
    assert got["kappa"] is None and got["p_o"] == 1.0


def test_kappa_chance_level_is_zero_ish(spark):
    # independent raters at 50/50: kappa ≈ 0 on a balanced 2x2 grid
    rows = [(True, True), (True, False), (False, True), (False, False)]
    got = _kappa(spark, rows)
    assert got["kappa"] == pytest.approx(0.0, abs=1e-6)
