"""Wave-48 operator tests: conformal calibration and Good-Turing."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from weather_api_automate_etl_spark.operators import stats, textops


# ---------------------------------------------------------------------------
# split-conformal calibration
# ---------------------------------------------------------------------------


def _conformal(spark, rows, alpha=0.1):
    df = spark.createDataFrame(rows, "g string, y double, cal boolean")
    out = stats.conformal_calibration(df, "g", "y", F.col("cal"), alpha=alpha)
    return {r["g"]: r for r in out.collect()}


def test_conformal_hand_computed_quantile(spark):
    # calibration 1..9: median pred = 5, residuals {0..4} each twice
    # except 0 → sorted [0,1,1,2,2,3,3,4,4]; k = ceil(10*0.9) = 9 → qhat 4
    cal = [("a", float(v), True) for v in range(1, 10)]
    tst = [("a", 5.0, False), ("a", 9.5, False), ("a", 20.0, False)]
    got = _conformal(spark, cal + tst)["a"]
    assert got["pred"] == 5.0 and got["qhat"] == 4.0
    assert got["n_cal"] == 9 and got["n_test"] == 3
    # |5-5|=0 ≤ 4 ok, |9.5-5|=4.5 > 4 out, |20-5| out → coverage 1/3
    assert got["coverage"] == pytest.approx(1 / 3, abs=1e-6)


def test_conformal_alpha_moves_the_quantile(spark):
    cal = [("a", float(v), True) for v in range(1, 10)]
    tight = _conformal(spark, cal + [("a", 1.0, False)], alpha=0.5)["a"]
    wide = _conformal(spark, cal + [("a", 1.0, False)], alpha=0.1)["a"]
    assert tight["qhat"] <= wide["qhat"]


def test_conformal_empty_test_slice_is_null_coverage(spark):
    cal = [("a", float(v), True) for v in range(1, 6)]
    got = _conformal(spark, cal)["a"]
    assert got["n_test"] == 0 and got["coverage"] is None


def test_conformal_groups_independent(spark):
    rows = [("a", 1.0, True), ("a", 2.0, True), ("a", 3.0, True),
            ("b", 100.0, True), ("b", 200.0, True), ("b", 300.0, True),
            ("a", 2.5, False), ("b", 150.0, False)]
    got = _conformal(spark, rows)
    assert got["a"]["pred"] == 2.0 and got["b"]["pred"] == 200.0


def test_conformal_rejects_bad_alpha(spark):
    df = spark.createDataFrame([("a", 1.0, True)], "g string, y double, cal boolean")
    with pytest.raises(ValueError):
        stats.conformal_calibration(df, "g", "y", F.col("cal"), alpha=1.5)


# ---------------------------------------------------------------------------
# Good-Turing
# ---------------------------------------------------------------------------


def _gt(spark, texts, **kw):
    df = spark.createDataFrame([(s,) for s in texts], "text string")
    out = textops.good_turing_counts(df, "text", **kw)
    return {r["r"]: r for r in out.collect()}


def test_good_turing_hand_computed(spark):
    # types: a×3, b×2, c×1, d×1 → S(1)=2, S(2)=1, S(3)=1, N=7
    texts = ["a a a b", "b c d"]
    got = _gt(spark, texts)
    assert got[1]["s_r"] == 2 and got[2]["s_r"] == 1 and got[3]["s_r"] == 1
    # r*=  (1+1)·S(2)/S(1) = 1.0 ; (2+1)·S(3)/S(2) = 3.0
    assert got[1]["r_star"] == pytest.approx(1.0)
    assert got[2]["r_star"] == pytest.approx(3.0)
    assert got[1]["unseen_mass"] == pytest.approx(2 / 7, abs=1e-6)


def test_good_turing_null_rstar_where_next_bucket_empty(spark):
    texts = ["x x x x x"]  # single type seen 5 times: S(5)=1, S(6)=0
    got = _gt(spark, texts)
    assert got[5]["r_star"] is None and got[5]["s_r_next"] == 0


def test_good_turing_shingle_types(spark):
    # two docs sharing one trigram: "a b c" appears twice, others once
    texts = ["a b c d", "z a b c"]
    got = _gt(spark, texts, shingle_k=3)
    # shingles: doc1 {a b c, b c d}, doc2 {z a b, a b c}
    assert got[2]["s_r"] == 1  # "a b c"
    assert got[1]["s_r"] == 2  # "b c d", "z a b"


def test_good_turing_rejects_bad_params(spark):
    df = spark.createDataFrame([("a",)], "text string")
    with pytest.raises(ValueError):
        textops.good_turing_counts(df, "text", max_r=0)
    with pytest.raises(ValueError):
        textops.good_turing_counts(df, "text", shingle_k=0)
