"""Round-5 third-wave invariants: count-min one-sided error, bigram-LM
ordering signal, MAD robustness, autocorrelation sign, blocklist
attribution order, basket-pair math, RFM scoring, and the covariance/PCA
pair (orthonormality, eigenvalue ordering, projection variance) — the
quantitative bounds that stand in for (or back up) the SQL oracles.
"""

from __future__ import annotations

import math

import numpy as np
import pytest
from pyspark.sql import Row, functions as F

from tests.conftest import SF_SMALL
from weather_api_automate_etl_spark.operators import (
    corpus,
    embeddings as emb_ops,
    stats,
    textops,
    timeseries,
)
from weather_api_automate_etl_spark.sources.tables import load_table


@pytest.fixture(scope="module")
def docs(spark):
    return load_table(spark, SF_SMALL, "documents")


@pytest.fixture(scope="module")
def emb(spark):
    return load_table(spark, SF_SMALL, "embeddings")


# ---------------------------------------------------------------------------
# count-min sketch: one-sided error, additive bound
# ---------------------------------------------------------------------------


def test_cms_overestimates_never_under(spark, docs):
    rows = textops.count_min_frequencies(
        docs, depth=4, width=256, min_count=10
    ).collect()
    assert rows, "expected probe terms at sf0.001"
    n_total = (
        docs.select(F.explode(F.split(F.lower(F.trim("text")), r"\s+")).alias("t"))
        .filter(F.col("t") != "")
        .count()
    )
    for r in rows:
        assert r["est_cnt"] >= r["cnt"], f"CMS underestimated {r['term']}"
        # additive error bound: collisions can add at most the rest of the
        # stream into a bucket; with width 256 the EXPECTED excess is
        # N/256 per hash row — assert the loose deterministic cap
        assert r["est_cnt"] - r["cnt"] <= n_total


def test_cms_rejects_bad_shape(spark, docs):
    with pytest.raises(ValueError, match="sketch shape"):
        textops.count_min_frequencies(docs, depth=0)


# ---------------------------------------------------------------------------
# bigram LM: consecutive-token typicality orders documents
# ---------------------------------------------------------------------------


def test_bigram_logprob_prefers_typical_sequences(spark):
    # corpus dominated by the bigram "a b"; doc 1 repeats it, doc 2 uses
    # the same unigrams in atypical order ("b a"), doc 3 is too short
    df = spark.createDataFrame(
        [
            Row(doc_id=1, text="a b a b a b a b"),
            Row(doc_id=2, text="b a b a b a b a"),
            Row(doc_id=3, text="a"),
        ]
        + [Row(doc_id=10 + i, text="a b c d a b c d") for i in range(5)]
    )
    out = {r["doc_id"]: r for r in textops.bigram_logprob(df).collect()}
    assert out[3]["n_bigrams"] == 0 and out[3]["avg_logprob"] is None
    assert out[1]["avg_logprob"] > out[2]["avg_logprob"], (
        "doc built from corpus-typical bigrams must outscore the "
        "same unigrams in atypical order"
    )


# ---------------------------------------------------------------------------
# blocklist: attribution order, verdicts, edge contracts
# ---------------------------------------------------------------------------


def test_blocklist_attribution_first_in_reading_order(spark):
    df = spark.createDataFrame(
        [
            Row(doc_id=1, text="clean words only here"),
            Row(doc_id=2, text="one bad word then worse word"),
            Row(doc_id=3, text="worse comes before bad here bad"),
            Row(doc_id=4, text=""),
        ]
    )
    out = {
        r["doc_id"]: r
        for r in corpus.blocklist_filter(df, terms=("bad", "worse")).collect()
    }
    assert not out[1]["is_blocked"] and out[1]["n_hits"] == 0
    assert out[1]["first_hit"] is None
    assert out[2]["first_hit"] == "bad" and out[2]["n_hits"] == 2
    assert out[3]["first_hit"] == "worse" and out[3]["n_hits"] == 3
    assert not out[4]["is_blocked"]


def test_blocklist_rejects_empty_terms(spark, docs):
    with pytest.raises(ValueError, match="empty blocklist"):
        corpus.blocklist_filter(docs, terms=())


# ---------------------------------------------------------------------------
# covariance: gemm partials agree with NumPy, symmetry implied by triangle
# ---------------------------------------------------------------------------


def test_covariance_matches_numpy(spark, emb):
    got = {
        (r["i"], r["j"]): r["cov"]
        for r in emb_ops.covariance_matrix(emb, "embedding").collect()
    }
    x = np.stack(
        [np.asarray(r["embedding"], dtype="float64") for r in emb.collect()]
    )
    want = np.cov(x, rowvar=False)  # sample covariance (n-1)
    d = x.shape[1]
    assert len(got) == d * (d + 1) // 2
    for (i, j), v in got.items():
        assert math.isclose(v, round(want[i, j], 6), abs_tol=2e-6), (
            f"cov[{i},{j}]: {v} vs numpy {want[i, j]}"
        )


def test_covariance_rejects_ragged_vectors(spark):
    df = spark.createDataFrame(
        [Row(vec_id=1, v=[1.0, 2.0]), Row(vec_id=2, v=[1.0, 2.0, 3.0])]
    )
    with pytest.raises(Exception, match="ragged"):
        emb_ops.covariance_matrix(df, "v", dim=2).collect()


# ---------------------------------------------------------------------------
# PCA: orthonormal components, descending variance, projection variance
# ---------------------------------------------------------------------------


def test_pca_fit_invariants(spark, emb):
    mu, comps, ev = emb_ops.pca_fit(emb, "embedding", k=4)
    # components orthonormal
    gram = comps @ comps.T
    assert np.allclose(gram, np.eye(4), atol=1e-8)
    # eigenvalues sorted descending, non-negative
    assert all(ev[i] >= ev[i + 1] - 1e-12 for i in range(len(ev) - 1))
    assert all(v >= -1e-9 for v in ev)
    # deterministic sign convention: largest-|entry| positive
    for row in comps:
        assert row[np.argmax(np.abs(row))] > 0
    # projection variance per component ≈ eigenvalue
    x = np.stack(
        [np.asarray(r["embedding"], dtype="float64") for r in emb.collect()]
    )
    proj = (x - mu) @ comps.T
    var = proj.var(axis=0, ddof=1)
    for k in range(4):
        # cov entries are rounded to 6dp before eigh, so allow that noise
        assert math.isclose(var[k], ev[k], rel_tol=1e-3, abs_tol=1e-4)


def test_pca_project_matches_fit(spark, emb):
    mu, comps, _ = emb_ops.pca_fit(emb, "embedding", k=3)
    got = {
        r["vec_id"]: np.asarray(r["proj"])
        for r in emb_ops.pca_project(emb, "vec_id", "embedding", k=3).collect()
    }
    rows = {r["vec_id"]: np.asarray(r["embedding"], dtype="float64")
            for r in emb.collect()}
    for vid in list(rows)[:10]:
        want = (rows[vid] - mu) @ comps.T
        assert np.allclose(got[vid], want, atol=1e-9)


def test_pca_rejects_bad_k(spark, emb):
    with pytest.raises(ValueError, match="invalid k"):
        emb_ops.pca_fit(emb, "embedding", k=0)


# ---------------------------------------------------------------------------
# MAD / autocorr: behavioral checks on crafted series
# ---------------------------------------------------------------------------


def test_mad_flags_survive_extreme_outlier(spark):
    # one wild outlier must not drag the fence the way mean/std z would:
    # MAD of the inliers is untouched by the outlier's magnitude
    vals = [float(v) for v in (10, 11, 12, 10, 11, 12, 10, 11, 12, 1000)]
    df = spark.createDataFrame(
        [Row(event_id=i, event_type="t", value=v) for i, v in enumerate(vals)]
    )
    out = {
        r["event_id"]: r
        for r in stats.mad_robust_z(
            df, "event_type", "value", keep_cols=("event_id",)
        ).collect()
    }
    assert out[9]["is_outlier"], "the 1000 spike must flag"
    assert not any(out[i]["is_outlier"] for i in range(9)), (
        "MAD fences must not be dragged by the outlier's magnitude"
    )


def test_autocorr_sign_on_crafted_series(spark):
    import datetime as dt

    base = dt.datetime(2024, 1, 1)
    rows = []
    # user 1: trending (positive lag-1 r), user 2: alternating (negative)
    for i in range(40):
        rows.append(Row(event_id=i, user_id=1,
                        ts=base + dt.timedelta(minutes=i),
                        value=float(i) + (0.1 if i % 3 else -0.1)))
        rows.append(Row(event_id=100 + i, user_id=2,
                        ts=base + dt.timedelta(minutes=i),
                        value=float(1 if i % 2 else -1)))
    r = {
        row["user_id"]: row["autocorr_lag1"]
        for row in stats.autocorr_lag1(
            spark.createDataFrame(rows), "user_id", "value",
            ("ts", "event_id"),
        ).collect()
    }
    assert r[1] > 0.9
    assert r[2] < -0.9


# ---------------------------------------------------------------------------
# differential tests: the new family against pandas/NumPy references
# ---------------------------------------------------------------------------


def test_trailing_median_matches_pandas_rolling(spark):
    import datetime as dt

    import pandas as pd

    rng = np.random.RandomState(7)
    base = dt.datetime(2024, 1, 1)
    vals = rng.uniform(-50, 50, 60).round(3)
    df = spark.createDataFrame(
        [
            Row(event_id=i, user_id=1, ts=base + dt.timedelta(minutes=i),
                value=float(v))
            for i, v in enumerate(vals)
        ]
    )
    got = {
        r["event_id"]: r["trailing_median"]
        for r in timeseries.trailing_median(
            df, "user_id", "value", ("ts", "event_id"),
            window_rows=8, keep_cols=("event_id",),
        ).collect()
    }
    want = pd.Series(vals).rolling(8, min_periods=1).median()
    for i in range(60):
        assert math.isclose(got[i], round(want[i], 6), abs_tol=1e-6)


def test_autocorr_matches_numpy_corrcoef(spark):
    import datetime as dt

    rng = np.random.RandomState(11)
    base = dt.datetime(2024, 1, 1)
    vals = np.cumsum(rng.uniform(-1, 1, 80))  # a random walk: r near 1
    df = spark.createDataFrame(
        [
            Row(event_id=i, user_id=1, ts=base + dt.timedelta(minutes=i),
                value=float(v))
            for i, v in enumerate(vals)
        ]
    )
    got = stats.autocorr_lag1(
        df, "user_id", "value", ("ts", "event_id")
    ).head()["autocorr_lag1"]
    want = np.corrcoef(vals[1:], vals[:-1])[0, 1]
    # the operator rounds to 6dp for oracle parity
    assert math.isclose(got, round(want, 6), abs_tol=1e-6)


def test_cms_matches_exact_when_width_is_ample(spark):
    # width >> vocabulary: no collisions are expected in ANY hash row, so
    # the estimate must EQUAL the exact count — the sketch's collision
    # term is provably the only error source
    df = spark.createDataFrame(
        [Row(doc_id=i, text="alpha beta gamma " * (i + 1)) for i in range(6)]
    )
    rows = textops.count_min_frequencies(
        df, depth=4, width=65536, min_count=1
    ).collect()
    assert rows
    for r in rows:
        assert r["est_cnt"] == r["cnt"], f"{r['term']}: collision at width 65536"


def test_autocorr_constant_series_is_null_not_nan(spark):
    """A constant series has zero variance; sum-order cancellation can
    leave the n*sxx - sx^2 term at a tiny NEGATIVE float, where a bare
    sqrt is NaN on Spark and a hard error on DuckDB. The clamped moment
    recipe (stats._pearson_from_moments) must yield NULL."""
    import datetime as dt

    base = dt.datetime(2024, 1, 1)
    df = spark.createDataFrame(
        [
            Row(event_id=i, user_id=1,
                ts=base + dt.timedelta(minutes=i), value=0.1)
            for i in range(50)
        ]
    )
    row = stats.autocorr_lag1(df, "user_id", "value", ("ts", "event_id")).head()
    assert row["n_pairs"] == 49
    assert row["autocorr_lag1"] is None, (
        f"constant series must be NULL, got {row['autocorr_lag1']}"
    )


def test_covariance_null_vector_raises_contract_error(spark):
    with pytest.raises(Exception, match="null embedding vector"):
        emb_ops.covariance_matrix(
            spark.createDataFrame(
                [Row(vec_id=1, v=[1.0, 2.0]), Row(vec_id=2, v=None)],
                "vec_id long, v array<double>",
            ),
            "v",
            dim=2,
        ).collect()


def test_pca_power_project_agrees_with_eigh(spark, emb):
    """The fixed-round power iteration must land on (±) the eigh top
    component — at 100 rounds the (λ2/λ1)^t residual is < 1e-3 even on
    the fixture's narrow spectral gap (λ2/λ1 ≈ 0.93). Also pins
    determinism across repartitionings (the gram partials merge
    associatively; more rounds only CONTRACT perturbations, so the
    fixed-round hash discipline is iteration-count-safe)."""
    import numpy as np

    from weather_api_automate_etl_spark.operators import embeddings as emb_ops

    power = {
        r.vec_id: r.pc1
        for r in emb_ops.pca_power_project(emb, "embedding", rounds=100).collect()
    }
    mean, comps, _ = emb_ops.pca_fit(emb, "embedding", k=1)
    rows = emb.select("vec_id", "embedding").collect()
    eigh_scores = {
        r.vec_id: float((np.asarray(r.embedding) - mean) @ comps[0]) for r in rows
    }
    ids = sorted(power)
    a = np.array([power[i] for i in ids])
    b = np.array([eigh_scores[i] for i in ids])
    corr = float(np.corrcoef(a, b)[0, 1])
    assert abs(corr) > 0.9999, corr
    again = {
        r.vec_id: r.pc1
        for r in emb_ops.pca_power_project(
            emb.repartition(13), "embedding", rounds=100
        ).collect()
    }
    assert again == power


def test_chi_square_ignores_null_categories(spark):
    """Round-6 advice: NULL categories previously entered margins and n
    (groupBy keeps NULL groups) while the null-unsafe grid join zeroed
    their observed cells, inflating chi2 and desyncing dof. The test pins
    the fix: rows with a NULL in either column contribute NOTHING — the
    statistic over a frame with NULL rows equals the statistic over the
    same frame with those rows dropped, and for independent balanced data
    chi2 is exactly 0 (any phantom (0-e)^2/e term would break that)."""
    from weather_api_automate_etl_spark.operators import stats

    base = [(a, b) for a in ("x", "y") for b in ("u", "v") for _ in range(5)]
    with_nulls = base + [(None, "u"), ("x", None), (None, None)]
    df = spark.createDataFrame(with_nulls, "a string, b string")
    got = stats.chi_square_independence(df, "a", "b").collect()[0]
    clean = stats.chi_square_independence(
        spark.createDataFrame(base, "a string, b string"), "a", "b"
    ).collect()[0]
    assert (got.chi2, got.dof, got.n_obs) == (clean.chi2, clean.dof, clean.n_obs)
    assert got.chi2 == 0.0 and got.dof == 1 and got.n_obs == 20


def test_psi_drift_matches_hand_computation_and_contracts(spark):
    """PSI against a hand-computed reference on a crafted distribution,
    plus the contracts: identical distributions give PSI exactly 0, a
    one-side-empty bin uses the eps floor (finite, large), NULLs are
    excluded, and bad edges reject."""
    import math

    import pytest as _pytest

    from weather_api_automate_etl_spark.operators import stats

    old = spark.createDataFrame(
        [(float(v),) for v in [1] * 50 + [11] * 30 + [21] * 20], "x double"
    )
    new = spark.createDataFrame(
        [
            (float(v) if v is not None else None,)
            for v in [1] * 20 + [11] * 30 + [21] * 50 + [None]
        ],
        "x double",
    )
    out = {r.bin_id: r for r in stats.psi_drift(old, new, "x", [10.0, 20.0]).collect()}
    assert (out[0].n_old, out[0].n_new) == (50, 20)
    assert out[0].p_old == 0.5 and out[0].p_new == 0.2  # NULL excluded
    want0 = round((0.2 - 0.5) * math.log(0.2 / 0.5), 6)
    assert out[0].psi_term == want0
    total = sum(r.psi_term for r in out.values())
    assert total > 0.25  # decisively shifted
    # identical sides → every term 0.0
    same = stats.psi_drift(old, old, "x", [10.0, 20.0]).collect()
    assert all(r.psi_term == 0.0 for r in same)
    # bin empty on one side: eps floor keeps the term finite
    lop = spark.createDataFrame([(30.0,)] * 10, "x double")
    out2 = {r.bin_id: r for r in stats.psi_drift(old, lop, "x", [10.0, 20.0, 25.0]).collect()}
    assert out2[3].p_old == 1e-6 and out2[3].p_new == 1.0
    assert math.isfinite(out2[3].psi_term) and out2[3].psi_term > 10
    with _pytest.raises(ValueError, match="ascending"):
        stats.psi_drift(old, new, "x", [20.0, 10.0])
    with _pytest.raises(ValueError, match="at least one"):
        stats.psi_drift(old, new, "x", [])


def test_ks_two_sample_known_values(spark):
    from weather_api_automate_etl_spark.operators import stats

    def mk(vals):
        return spark.createDataFrame(
            [(float(v) if v is not None else None,) for v in vals], "x double"
        )

    a = mk([1, 2, 3, 4, 5])
    b = mk([3, 4, 5, 6, 7])
    r = stats.ks_two_sample(a, b, "x").collect()[0]
    assert (r.n_a, r.n_b, r.d_stat) == (5, 5, 0.4)
    # identical samples → D = 0; disjoint supports → D = 1
    same = stats.ks_two_sample(a, a, "x").collect()[0]
    assert same.d_stat == 0.0
    far = stats.ks_two_sample(a, mk([100, 101]), "x").collect()[0]
    assert (far.n_b, far.d_stat) == (2, 1.0)
    # NULLs are excluded, ties grouped before the cumsum
    withnull = stats.ks_two_sample(mk([1, 1, 2, None]), mk([1, 2, 2]), "x").collect()[0]
    # F_a = {1: 2/3, 2: 1}, F_b = {1: 1/3, 2: 1} → D = 1/3
    assert withnull.n_a == 3 and withnull.d_stat == round(1 / 3, 6)


# ---------------------------------------------------------------------------
# round-8 wave 15: Mann-Whitney U and APPLY CHANGES
# ---------------------------------------------------------------------------


def test_mann_whitney_matches_hand_computation_with_ties(spark):
    # group a: [1, 2, 2, 5]   group b: [2, 3, 5, 5, 7]
    # combined sorted: 1(r1), 2,2,2 (avg 3), 3 (r5), 5,5,5 (avg 7), 7 (r9)
    # R1 = 1 + 3 + 3 + 7 = 14; U1 = 14 - 4*5/2 = 4
    rows = [(1.0, "a"), (2.0, "a"), (2.0, "a"), (5.0, "a"),
            (2.0, "b"), (3.0, "b"), (5.0, "b"), (5.0, "b"), (7.0, "b")]
    df = spark.createDataFrame(rows, "v double, grp string")
    got = stats.mann_whitney_u(df, "v", "grp", "a", "b").collect()[0]
    assert (got["n1"], got["n2"]) == (4, 5)
    assert got["u1"] == 4.0
    # tie-corrected z: mu=10, ties t=3 twice -> tie_term=48,
    # sigma^2 = (20/12)*((9+1) - 48/(9*8)) = 5/3 * 28/3 = 15.555...
    mu = 4 * 5 / 2.0
    sigma = math.sqrt((4 * 5 / 12.0) * ((9 + 1) - 48 / (9 * 8.0)))
    assert got["z_score"] == pytest.approx((4.0 - mu) / sigma, abs=1e-6)


def test_mann_whitney_no_ties_symmetric(spark):
    # identical distributions shifted: all of b above all of a -> U1 = 0
    rows = [(float(i), "a") for i in range(5)] + [
        (float(i + 100), "b") for i in range(5)
    ]
    df = spark.createDataFrame(rows, "v double, grp string")
    got = stats.mann_whitney_u(df, "v", "grp", "a", "b").collect()[0]
    assert got["u1"] == 0.0
    assert got["z_score"] < -2.5  # strongly separated


def test_apply_cdc_out_of_order_and_deletes(spark):
    from weather_api_automate_etl_spark.operators.cdc import apply_cdc

    # key 1: I(1) U(3) arrives before U(2) -> seq 3 wins
    # key 2: I(1) then D(2) -> gone
    # key 3: D(1) then re-insert I(2) -> alive with seq 2
    log = spark.createDataFrame(
        [
            (1, 3, "U", 30.0), (1, 1, "I", 10.0), (1, 2, "U", 20.0),
            (2, 2, "D", 0.0), (2, 1, "I", 5.0),
            (3, 2, "I", 7.0), (3, 1, "D", 0.0),
        ],
        "k long, seq long, op string, val double",
    )
    got = {
        r["k"]: (r["seq"], r["val"])
        for r in apply_cdc(log, "k", "seq", "op").collect()
    }
    assert got == {1: (3, 30.0), 3: (2, 7.0)}
