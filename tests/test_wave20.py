"""Wave-20 operator tests: rank-2 ALS, Kaplan-Meier, Benford."""

from __future__ import annotations

import itertools
import math

import pytest
from pyspark.sql import functions as F

from weather_api_automate_etl_spark.operators import embeddings, stats


# ---------------------------------------------------------------------------
# ALS
# ---------------------------------------------------------------------------


def _rank2_ratings(spark, n_users=30, n_items=40, drop_mod=3):
    def true_r(u, i):
        return (1 + u % 3) * (1 + i % 4) + ((u % 5) / 2) * ((i % 7) / 3)

    rat = [
        (u, i, float(true_r(u, i)))
        for u, i in itertools.product(range(n_users), range(n_items))
        if (u * 7 + i) % drop_mod != 0
    ]
    return rat, spark.createDataFrame(rat, "u long, i long, r double")


@pytest.mark.slow
def test_als_recovers_rank2_structure(spark):
    rat, df = _rank2_ratings(spark)
    uf, itf = embeddings.als_factorize_k2(df, "u", "i", "r", rounds=3)
    pu = {r["u"]: (r["f1"], r["f2"]) for r in uf.collect()}
    qi = {r["i"]: (r["f1"], r["f2"]) for r in itf.collect()}
    sq = [
        (pu[u][0] * qi[i][0] + pu[u][1] * qi[i][1] - r) ** 2
        for u, i, r in rat
    ]
    rmse = math.sqrt(sum(sq) / len(sq))
    mean = sum(r for _, _, r in rat) / len(rat)
    assert rmse < 0.1 * mean  # explains >90% of the scale


@pytest.mark.slow
def test_als_more_rounds_do_not_diverge(spark):
    rat, df = _rank2_ratings(spark)

    def rmse(rounds):
        uf, itf = embeddings.als_factorize_k2(df, "u", "i", "r",
                                              rounds=rounds)
        pu = {r["u"]: (r["f1"], r["f2"]) for r in uf.collect()}
        qi = {r["i"]: (r["f1"], r["f2"]) for r in itf.collect()}
        sq = [(pu[u][0] * qi[i][0] + pu[u][1] * qi[i][1] - r) ** 2
              for u, i, r in rat]
        return math.sqrt(sum(sq) / len(sq))

    r1, r3 = rmse(1), rmse(3)
    assert r3 <= r1 + 1e-9  # ALS is monotone non-increasing in-sample


def test_als_single_rating_entity_is_finite(spark):
    """Ridge keeps the 2x2 solvable for a user with one rating."""
    df = spark.createDataFrame(
        [(1, 10, 4.0), (2, 10, 3.0), (2, 11, 5.0)],
        "u long, i long, r double",
    )
    uf, _ = embeddings.als_factorize_k2(df, "u", "i", "r", rounds=2)
    vals = {r["u"]: (r["f1"], r["f2"]) for r in uf.collect()}
    for f1, f2 in vals.values():
        assert math.isfinite(f1) and math.isfinite(f2)
    with pytest.raises(ValueError, match="rounds"):
        embeddings.als_factorize_k2(df, "u", "i", "r", rounds=0)


# ---------------------------------------------------------------------------
# Kaplan-Meier
# ---------------------------------------------------------------------------


def test_km_textbook_example(spark):
    """Durations 1, 2+, 3, 4+, 5 (+ censored): S = .8, .5333, 0."""
    rows = [("g", 1, 1), ("g", 2, 0), ("g", 3, 1), ("g", 4, 0), ("g", 5, 1)]
    df = spark.createDataFrame(rows, "g string, t long, obs int")
    km = {r["t"]: r for r in
          stats.kaplan_meier(df, "g", "t", F.col("obs") == 1).collect()}
    assert set(km) == {1, 3, 5}  # censoring-only times emit no row
    assert (km[1]["n_risk"], km[1]["survival"]) == (5, 0.8)
    assert km[3]["survival"] == pytest.approx(0.8 * 2 / 3, abs=1e-6)
    assert km[5]["survival"] == 0.0  # last subject dies: curve hits zero
    assert km[1]["n_censored"] == 0


def test_km_no_censoring_matches_empirical_survival(spark):
    """All observed: S(t) = fraction with duration > t."""
    durs = [1, 1, 2, 3, 3, 3, 4]
    df = spark.createDataFrame([("g", d, 1) for d in durs],
                               "g string, t long, obs int")
    km = {r["t"]: r["survival"] for r in
          stats.kaplan_meier(df, "g", "t", F.col("obs") == 1).collect()}
    n = len(durs)
    for t in set(durs):
        frac = sum(1 for d in durs if d > t) / n
        assert km[t] == pytest.approx(frac, abs=1e-6), t


def test_km_heavy_censoring_keeps_curve_above_naive(spark):
    """Censored subjects must NOT count as deaths: KM > naive 1-ecdf."""
    rows = [("g", t, 1 if t % 2 else 0) for t in range(1, 21)]
    df = spark.createDataFrame(rows, "g string, t long, obs int")
    km = {r["t"]: r["survival"] for r in
          stats.kaplan_meier(df, "g", "t", F.col("obs") == 1).collect()}
    # at t=19 (last event), naive all-counted survival would be 1/20
    assert km[19] > 0.05


# ---------------------------------------------------------------------------
# Benford
# ---------------------------------------------------------------------------


def test_benford_log_uniform_fits(spark):
    rows = [(i, "a", 10.0 ** ((i * 37 % 970) / 970.0 * 3))
            for i in range(2000)]
    df = spark.createDataFrame(rows, "id long, g string, v double")
    out = stats.benford_deviation(df, "g", "v").collect()
    assert len(out) == 9
    assert {r["chi_square"] for r in out} == {out[0]["chi_square"]}
    assert out[0]["chi_square"] < 15.5  # chi2_{8, 0.95}: not rejected
    by_digit = {r["digit"]: r for r in out}
    assert by_digit[1]["benford_p"] == pytest.approx(math.log10(2), abs=1e-6)
    assert abs(by_digit[1]["observed_p"] - 0.30103) < 0.02


def test_benford_uniform_data_is_rejected(spark):
    """Uniform [1000, 2000): first digit is ALWAYS 1 -> huge chi-square."""
    rows = [(i, "u", 1000.0 + i % 1000) for i in range(1000)]
    df = spark.createDataFrame(rows, "id long, g string, v double")
    out = stats.benford_deviation(df, "g", "v").collect()
    assert len(out) == 1 and out[0]["digit"] == 1
    assert out[0]["chi_square"] > 15.5


def test_benford_ignores_nonpositive(spark):
    df = spark.createDataFrame(
        [(1, "g", -5.0), (2, "g", 0.0), (3, "g", 321.0)],
        "id long, g string, v double",
    )
    out = stats.benford_deviation(df, "g", "v").collect()
    assert len(out) == 1 and out[0]["digit"] == 3 and out[0]["n"] == 1
