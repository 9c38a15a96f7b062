"""Wave-34 operator tests: median imputation, erf p-values, BH-FDR."""

from __future__ import annotations


import pytest

from pyspark.sql import functions as F

from weather_api_automate_etl_spark.operators import stats


# ---------------------------------------------------------------------------
# median imputation
# ---------------------------------------------------------------------------


def _imp(spark, rows):
    df = spark.createDataFrame(rows, "g string, v double")
    return stats.median_impute(df, "g", "v").collect()


def test_impute_fills_with_exact_group_median(spark):
    rows = [("a", 1.0), ("a", 9.0), ("a", 5.0), ("a", None),
            ("b", 2.0), ("b", 4.0), ("b", None)]
    got = _imp(spark, rows)
    by_g = {}
    for r in got:
        by_g.setdefault(r["g"], []).append(r)
    fills_a = [r for r in by_g["a"] if r["v_imputed"]]
    assert fills_a[0]["v_filled"] == 5.0        # odd count: middle
    fills_b = [r for r in by_g["b"] if r["v_imputed"]]
    assert fills_b[0]["v_filled"] == 3.0        # even count: mean of middles
    # observed rows untouched, flag false
    assert all(not r["v_imputed"] for r in got if r["v"] is not None)


def test_impute_all_null_group_stays_null(spark):
    rows = [("a", None), ("a", None), ("b", 7.0), ("b", None)]
    got = _imp(spark, rows)
    a_rows = [r for r in got if r["g"] == "a"]
    assert all(r["v_filled"] is None and not r["v_imputed"] for r in a_rows)
    b_fill = [r for r in got if r["g"] == "b" and r["v"] is None]
    assert b_fill[0]["v_filled"] == 7.0 and b_fill[0]["v_imputed"]


# ---------------------------------------------------------------------------
# normal p-values (A&S erf polynomial)
# ---------------------------------------------------------------------------


def test_normal_p_matches_reference_values(spark):
    df = spark.createDataFrame(
        [(0.0,), (1.0,), (1.959964,), (2.575829,), (-1.0,)], "z double"
    )
    got = [
        r["p"]
        for r in df.select(
            stats.normal_two_sided_p(F.col("z")).alias("p")
        ).collect()
    ]
    # reference: 2*(1-Phi(|z|))
    want = [1.0, 0.317311, 0.05, 0.01, 0.317311]
    for g, w in zip(got, want):
        assert g == pytest.approx(w, abs=2e-6)


# ---------------------------------------------------------------------------
# Benjamini-Hochberg
# ---------------------------------------------------------------------------


def _bh(spark, pvals, q=0.1):
    df = spark.createDataFrame(
        [(f"k{i}", p) for i, p in enumerate(pvals)], "k string, p double"
    )
    return {
        r["k"]: r for r in stats.bh_fdr(df, "k", "p", q=q).collect()
    }


def test_bh_textbook_example(spark):
    """Benjamini & Hochberg (1995) Table 1 p-values at q=0.1,
    m=10: thresholds k/100. Step-up: the LARGEST k with
    p_(k) <= k/m*q is k=6 (p_(6)=.06 <= .06, boundary inclusive),
    so the first six are rejected even though p_(3)=.039 > .03 and
    p_(4)=.041 > .04 individually."""
    ps = [0.001, 0.008, 0.039, 0.041, 0.042, 0.06, 0.074, 0.205, 0.212,
          0.216]
    got = _bh(spark, ps, q=0.1)
    sig = {k for k, r in got.items() if r["significant"]}
    assert sig == {f"k{i}" for i in range(6)}
    assert got["k5"]["rank"] == 6
    assert got["k5"]["threshold"] == pytest.approx(0.06)


def test_bh_step_up_rescues_below_rank(spark):
    """p_(2) above its threshold but p_(3) below ITS threshold:
    step-up marks all three significant (the property step-down
    procedures lack)."""
    ps = [0.01, 0.055, 0.056, 0.9]   # q=.1, m=4: thresholds .025,.05,.075,.1
    got = _bh(spark, ps, q=0.1)
    assert got["k1"]["significant"] and got["k2"]["significant"]
    assert not got["k3"]["significant"]


def test_bh_nothing_significant(spark):
    got = _bh(spark, [0.5, 0.7, 0.9], q=0.05)
    assert not any(r["significant"] for r in got.values())


def test_bh_everything_significant(spark):
    got = _bh(spark, [0.001, 0.002, 0.003], q=0.1)
    assert all(r["significant"] for r in got.values())


def test_bh_rejects_bad_q(spark):
    df = spark.createDataFrame([("k", 0.5)], "k string, p double")
    with pytest.raises(ValueError, match="bh_fdr"):
        stats.bh_fdr(df, "k", "p", q=1.5)


def test_bh_false_discovery_control_montecarlo(spark):
    """Deterministic pseudo-nulls: 50 uniform-ish null p-values plus 5
    tiny true signals; BH at q=.2 should recover the signals and admit
    few nulls."""
    nulls = [((i * 37) % 97 + 1) / 100.0 for i in range(50)]
    signals = [1e-8, 2e-8, 3e-8, 4e-8, 5e-8]
    got = _bh(spark, signals + nulls, q=0.2)
    sig_keys = {k for k, r in got.items() if r["significant"]}
    assert {f"k{i}" for i in range(5)} <= sig_keys
    assert len(sig_keys) <= 10
