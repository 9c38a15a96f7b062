"""Wave-26 operator tests: log-rank test and t-closeness."""

from __future__ import annotations

import math

import pytest

from pyspark.sql import functions as F

from weather_api_automate_etl_spark.operators import privacy, stats


# ---------------------------------------------------------------------------
# log-rank test
# ---------------------------------------------------------------------------


def _lr(spark, rows, a="A", b="B"):
    df = spark.createDataFrame(rows, "g string, t int, obs boolean")
    return stats.logrank_test(df, "g", "t", "obs", a, b).collect()


def test_logrank_hand_computed(spark):
    """A: events at 1, 2; B: event at 2, censored at 3.
    t=1: n=4, na=2, d=1 -> E+=0.5,   V+=0.25
    t=2: n=3, na=1, d=2 -> E+=2/3,   V+=2*(1/3)(2/3)(1/2)=2/9
    O_a=2, E_a=7/6, V=0.25+2/9."""
    rows = [("A", 1, True), ("A", 2, True), ("B", 2, True), ("B", 3, False)]
    (r,) = _lr(spark, rows)
    assert (r["n_a"], r["n_b"], r["o_a"], r["o_b"]) == (2, 2, 2, 1)
    assert r["e_a"] == pytest.approx(7 / 6, abs=1e-6)
    v = 0.25 + 2 / 9
    assert r["chi2"] == pytest.approx((2 - 7 / 6) ** 2 / v, abs=1e-6)
    assert r["z"] == pytest.approx((2 - 7 / 6) / math.sqrt(v), abs=1e-6)


def test_logrank_identical_groups_zero(spark):
    rows = [(g, t, True) for g in ("A", "B") for t in (1, 2, 3, 4, 5)]
    (r,) = _lr(spark, rows)
    assert r["chi2"] == pytest.approx(0.0, abs=1e-9)
    assert r["z"] == pytest.approx(0.0, abs=1e-9)
    assert r["o_a"] == 5 and r["e_a"] == pytest.approx(5.0, abs=1e-6)


def test_logrank_censoring_shrinks_risk_sets(spark):
    """Censored B subjects leave the risk set without events: compared
    to the same data with those rows observed, E_a must change."""
    base = [("A", 2, True), ("A", 4, True), ("B", 3, True), ("B", 5, True)]
    cens = base + [("B", 1, False), ("B", 1, False)]
    obs = base + [("B", 1, True), ("B", 1, True)]
    (rc,) = _lr(spark, cens)
    (ro,) = _lr(spark, obs)
    assert rc["o_b"] == 2 and ro["o_b"] == 4
    assert rc["e_a"] != ro["e_a"]
    # censoring at t=1 still counts both B subjects in the t>=1 risk sets
    # of later event times? No: they left AT 1, so t=2+ risk sets exclude
    # them; E_a at t=2 is d*na/n = 1*2/4 under censoring
    assert rc["e_a"] == pytest.approx(1 * 2 / 4 + 1 * 1 / 3 + 1 * 1 / 2 + 0,
                                      abs=1e-6)


def test_logrank_one_sided_dominance_direction(spark):
    """All A events early, all B events late -> A dies more than
    expected at its times? z sign: o_a - e_a with A dying while B all
    at risk -> e_a < o_a -> z > 0 (A worse)."""
    rows = [("A", t, True) for t in (1, 2, 3)]
    rows += [("B", t, True) for t in (10, 11, 12)]
    (r,) = _lr(spark, rows)
    assert r["z"] > 1.5
    assert r["chi2"] == pytest.approx(r["z"] ** 2, rel=1e-4)


# ---------------------------------------------------------------------------
# t-closeness
# ---------------------------------------------------------------------------


def _tc(spark, rows, t):
    df = spark.createDataFrame(rows, "qi string, s string")
    return {
        r["qi"]: r
        for r in privacy.t_closeness_violations(df, ["qi"], "s", t).collect()
    }


def test_t_closeness_hand_computed(spark):
    """Global s-distribution (x: 2, y: 2) = (.5, .5); each single-value
    class has tvd = max(1 - .5, 0) = .5."""
    rows = [("c1", "x"), ("c1", "x"), ("c2", "y"), ("c2", "y")]
    got = _tc(spark, rows, 0.3)
    assert set(got) == {"c1", "c2"}
    for r in got.values():
        assert r["class_size"] == 2 and r["tvd"] == pytest.approx(0.5, 1e-6)
    assert _tc(spark, rows, 0.6) == {}


def test_t_closeness_global_matching_class_passes(spark):
    """A class that mirrors the global distribution has tvd 0 and never
    violates, regardless of how small t is."""
    rows = [("c1", "x"), ("c1", "y"), ("c2", "x"), ("c2", "y"),
            ("c3", "x"), ("c3", "x"), ("c3", "y"), ("c3", "y")]
    got = _tc(spark, rows, 0.01)
    assert got == {}


def test_t_closeness_skew_without_homogeneity(spark):
    """The l-diversity blind spot: a class CAN contain every sensitive
    value (fully diverse) yet sit far from the global mix."""
    # global: x 6, y 6 -> (.5, .5); skewed class: 5x + 1y -> tvd = 1/3
    rows = [("skew", "x")] * 5 + [("skew", "y")]
    rows += [("bal", "x")] * 1 + [("bal", "y")] * 5
    got = _tc(spark, rows, 0.25)
    assert set(got) == {"skew", "bal"}
    assert got["skew"]["tvd"] == pytest.approx(5 / 6 - 0.5, abs=1e-6)


def test_t_closeness_null_sensitive_is_a_category(spark):
    rows = [("c1", None), ("c1", None), ("c2", "x"), ("c2", "x")]
    got = _tc(spark, rows, 0.3)
    # global: null .5 / x .5; both classes are single-category -> tvd .5
    assert set(got) == {"c1", "c2"}


def test_t_closeness_rejects_bad_threshold(spark):
    df = spark.createDataFrame([("a", "x")], "qi string, s string")
    with pytest.raises(ValueError, match="t-closeness"):
        privacy.t_closeness_violations(df, ["qi"], "s", t=0.0)
