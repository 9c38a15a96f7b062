"""Wave-36 operator tests: rare-category collapse and drift sweep."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from weather_api_automate_etl_spark.operators import stats


# ---------------------------------------------------------------------------
# rare-category collapse
# ---------------------------------------------------------------------------


def _collapse(spark, cats, min_frac):
    df = spark.createDataFrame([(c,) for c in cats], "c string")
    out = stats.rare_category_collapse(df, "c", min_frac=min_frac)
    return [
        (r["c"], r["c_collapsed"]) for r in out.collect()
    ]


def test_collapse_rare_levels_to_other(spark):
    cats = ["a"] * 50 + ["b"] * 45 + ["x"] * 3 + ["y"] * 2
    got = dict(_collapse(spark, cats, 0.05))
    assert got["a"] == "a" and got["b"] == "b"
    assert got["x"] == "__other__" and got["y"] == "__other__"


def test_collapse_boundary_is_strict_less_than(spark):
    """A level holding exactly min_frac stays (strict <)."""
    cats = ["a"] * 90 + ["b"] * 10
    got = dict(_collapse(spark, cats, 0.10))
    assert got["b"] == "b"


def test_collapse_null_category_passes_through(spark):
    cats = ["a"] * 9 + [None]
    got = _collapse(spark, cats, 0.5)
    nulls = [o for c, o in got if c is None]
    assert nulls == [None]
    assert dict((c, o) for c, o in got if c)["a"] == "a"


def test_collapse_rejects_bad_frac(spark):
    df = spark.createDataFrame([("a",)], "c string")
    with pytest.raises(ValueError, match="min_frac"):
        stats.rare_category_collapse(df, "c", min_frac=0.0)


# ---------------------------------------------------------------------------
# chi-square drift sweep + FDR
# ---------------------------------------------------------------------------


def _sweep(spark, rows, feats, q=0.1):
    df = spark.createDataFrame(rows, "i long, grp string")
    return {
        r["feature"]: r
        for r in stats.chi2_drift_fdr(
            df, feats, F.col("i") % 2, q=q
        ).collect()
    }


def test_drift_sweep_flags_dependent_feature_only(spark):
    rows = [(i, "a" if (i * 7) % 3 == 0 else "b") for i in range(600)]
    feats = {
        "independent": F.col("grp"),             # unrelated to parity
        "entangled": (F.col("i") % 6 < 3),       # 2:1 vs 1:2 parity odds
    }
    got = _sweep(spark, rows, feats)
    assert got["entangled"]["significant"]
    assert not got["independent"]["significant"]
    assert got["entangled"]["chi2"] > got["independent"]["chi2"]


def test_drift_sweep_chi2_matches_hand_computation(spark):
    """2×2 table with counts [[30,10],[10,30]]: chi2 = 80*... compute
    exactly: n=80, e=20 for every cell, chi2 = 4*(10²/20) = 20."""
    rows = []
    i_even = 0
    # construct: split 0 -> 30 'a', 10 'b'; split 1 -> 10 'a', 30 'b'
    seq = [("a", 0)] * 30 + [("b", 0)] * 10 + [("a", 1)] * 10 + [("b", 1)] * 30
    for idx, (g, s) in enumerate(seq):
        rows.append((2 * idx + s, g))   # i%2 == s
    got = _sweep(spark, rows, {"grp": F.col("grp")})
    r = got["grp"]
    assert r["chi2"] == pytest.approx(20.0, abs=1e-6)
    assert r["dof"] == 1 and r["significant"]


def test_drift_sweep_null_category_sentinel_coded(spark):
    """NULL feature values form a real '__null__' category whose
    observed counts enter the table — not o=0 ghost cells that
    inflate chi2 (the r8 advisor's null-unsafe-grid finding).

    Hand table: split 0 -> 20 'a', 10 NULL; split 1 -> 20 'a', 0 NULL.
    Totals: a=40 null=10; col0=30 col1=20; n=50 — identical to the
    densified-zero-cell case above, so the same chi2 must come out."""
    seq = [("a", 0)] * 20 + [("a", 1)] * 20 + [(None, 0)] * 10
    rows = [(2 * idx + s, g) for idx, (g, s) in enumerate(seq)]
    df = spark.createDataFrame(rows, "i long, grp string")
    got = {
        r["feature"]: r
        for r in stats.chi2_drift_fdr(
            df, {"grp": F.col("grp")}, F.col("i") % 2, q=0.1
        ).collect()
    }
    r = got["grp"]
    want = (20 - 24) ** 2 / 24 + (20 - 16) ** 2 / 16 \
        + (10 - 6) ** 2 / 6 + 4.0
    assert r["chi2"] == pytest.approx(want, abs=1e-6)
    assert r["dof"] == 1


def test_drift_sweep_multiarm_dof(spark):
    """Three split arms x three categories -> dof=(3-1)*(3-1)=4, not
    the binary ncat-1 the pre-fix code silently assumed."""
    seq = [(c, s) for c in ("a", "b", "c") for s in (0, 1, 2)] * 10
    rows = [(3 * idx + s, g) for idx, (g, s) in enumerate(seq)]
    df = spark.createDataFrame(rows, "i long, grp string")
    got = {
        r["feature"]: r
        for r in stats.chi2_drift_fdr(
            df, {"grp": F.col("grp")}, F.col("i") % 3, q=0.1
        ).collect()
    }
    r = got["grp"]
    assert r["dof"] == 4
    # perfectly balanced grid: every o == e, chi2 == 0, never flagged
    assert r["chi2"] == pytest.approx(0.0, abs=1e-9)
    assert not r["significant"]


def test_drift_sweep_zero_cells_densified(spark):
    """Category present in only one split: its zero cell contributes
    the full expected mass instead of being dropped."""
    seq = [("a", 0)] * 20 + [("a", 1)] * 20 + [("c", 0)] * 10
    rows = [(2 * idx + s, g) for idx, (g, s) in enumerate(seq)]
    got = _sweep(spark, rows, {"grp": F.col("grp")})
    r = got["grp"]
    # hand: totals row a=40 c=10; col0=30 col1=20; n=50
    # e(a,0)=24 e(a,1)=16 e(c,0)=6 e(c,1)=4; o(c,1)=0 term=4
    want = (20 - 24) ** 2 / 24 + (20 - 16) ** 2 / 16 \
        + (10 - 6) ** 2 / 6 + 4.0
    assert r["chi2"] == pytest.approx(want, abs=1e-6)
