"""Wave-38 operator tests: quality test suite and trimmed mean."""

from __future__ import annotations

import pytest

from weather_api_automate_etl_spark.operators import quality, stats


# ---------------------------------------------------------------------------
# test suite
# ---------------------------------------------------------------------------


def test_suite_reports_pass_and_fail_rows(spark):
    dup = spark.createDataFrame([(1,), (1,), (2,)], "k int")
    clean = spark.createDataFrame([(1,), (2,)], "k int")
    out = quality.test_suite(
        [
            ("unique", "dup.k", quality.unique_violations(dup, "k")),
            ("unique", "clean.k", quality.unique_violations(clean, "k")),
        ]
    ).collect()
    got = {r["target"]: r for r in out}
    assert got["dup.k"]["violations"] == 1 and not got["dup.k"]["passed"]
    assert got["clean.k"]["violations"] == 0 and got["clean.k"]["passed"]
    assert all(r["rule"] == "unique" for r in out)


def test_suite_mixed_rule_kinds(spark):
    df = spark.createDataFrame(
        [(1, "a"), (2, None), (3, "z")], "k int, v string"
    )
    ref = spark.createDataFrame([(1,), (2,)], "k int")
    out = quality.test_suite(
        [
            ("not_null", "t.v", quality.not_null_violations(df, "v")),
            (
                "accepted_values",
                "t.v",
                quality.accepted_values_violations(df, "v", ["a", "b"]),
            ),
            (
                "relationships",
                "t.k->ref.k",
                quality.relationships_violations(df, "k", ref, "k"),
            ),
        ]
    ).collect()
    got = {r["rule"]: r["violations"] for r in out}
    assert got == {"not_null": 1, "accepted_values": 1, "relationships": 1}


def test_suite_rejects_empty(spark):
    with pytest.raises(ValueError, match="test_suite"):
        quality.test_suite([])


# ---------------------------------------------------------------------------
# trimmed mean
# ---------------------------------------------------------------------------


def _tm(spark, vals, frac):
    rows = [("g", v) for v in vals]
    df = spark.createDataFrame(rows, "g string, y int")
    (r,) = stats.trimmed_mean(df, "g", "y", trim_frac=frac).collect()
    return r


def test_trimmed_mean_drops_outliers(spark):
    vals = [10, 11, 12, 13, 14, 15, 16, 17, 18, 1000]
    r = _tm(spark, vals, 0.1)
    # k = 1: drop 10 and 1000; mean of 11..18 = 14.5
    assert r["n_trimmed_each_side"] == 1
    assert r["mean_trimmed"] == pytest.approx(14.5)
    assert r["mean_raw"] == pytest.approx(sum(vals) / 10)


def test_trimmed_mean_zero_frac_is_plain_mean(spark):
    vals = [1, 2, 3, 4]
    r = _tm(spark, vals, 0.0)
    assert r["n_trimmed_each_side"] == 0
    assert r["mean_trimmed"] == r["mean_raw"] == pytest.approx(2.5)


def test_trimmed_mean_boundary_ties_are_stable(spark):
    """Tied boundary values: any dropped choice keeps the same kept
    multiset, so the result is deterministic."""
    vals = [5, 5, 5, 5, 6, 7, 8, 8, 8, 8]
    r = _tm(spark, vals, 0.2)  # k=2: drop two 5s, two 8s
    assert r["mean_trimmed"] == pytest.approx((5 + 5 + 6 + 7 + 8 + 8) / 6)


def test_trimmed_mean_null_values_shift_band_not_mass(spark):
    """NULL values occupy rank positions (NULLS FIRST, matching the old
    row-grain window) and count toward n, but never contribute to the
    kept sum or the kept count — pins the value-grain rewrite's NULL
    group against the per-row semantics it replaced."""
    rows = [("g", None), ("g", None), ("g", 10), ("g", 20), ("g", 30),
            ("g", 40), ("g", 50), ("g", 60), ("g", 70), ("g", 1000)]
    df = spark.createDataFrame(rows, "g string, y int")
    (r,) = stats.trimmed_mean(df, "g", "y", trim_frac=0.2).collect()
    # n=10, k=2: the two NULLs occupy positions 1-2 (dropped band);
    # kept band = positions 3..8 = values 10..60
    assert r["n"] == 10 and r["n_trimmed_each_side"] == 2
    assert r["mean_trimmed"] == pytest.approx((10 + 20 + 30 + 40 + 50 + 60) / 6)
    # mean_raw divides the non-null sum by ALL n rows (old behavior)
    assert r["mean_raw"] == pytest.approx(round(1280 / 10, 6))


def test_trimmed_mean_rejects_bad_frac(spark):
    df = spark.createDataFrame([("g", 1)], "g string, y int")
    with pytest.raises(ValueError, match="trim_frac"):
        stats.trimmed_mean(df, "g", "y", trim_frac=0.5)
