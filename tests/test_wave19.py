"""Wave-19 operator tests: item-item CF, calibration/ECE, MMR
re-ranking, Stupid Backoff."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_SMALL
from weather_api_automate_etl_spark.operators import (
    similarity,
    stats,
    textops,
)


# ---------------------------------------------------------------------------
# item-item cosine CF
# ---------------------------------------------------------------------------


def test_item_cf_cosine_from_counts(spark):
    # baskets: {1:AB, 2:AB, 3:AC, 4:A} -> c(A)=4, c(B)=2, c(C)=1
    rows = [(1, "A"), (1, "B"), (2, "A"), (2, "B"), (3, "A"), (3, "C"),
            (4, "A")]
    df = spark.createDataFrame(rows, "ok long, it string")
    got = {(r["item"], r["neighbor"]): r for r in
           stats.item_item_cosine(df, "ok", "it", top_k=5,
                                  min_support=1).collect()}
    assert got[("A", "B")]["cosine"] == pytest.approx(
        2 / math.sqrt(4 * 2), abs=1e-6)
    assert got[("B", "A")]["cosine"] == got[("A", "B")]["cosine"]
    assert got[("A", "C")]["cosine"] == pytest.approx(
        1 / math.sqrt(4 * 1), abs=1e-6)
    assert ("B", "C") not in got  # never co-bought


def test_item_cf_min_support_and_topk(spark):
    rows = [(1, "A"), (1, "B"), (2, "A"), (2, "B"), (3, "A"), (3, "C")]
    df = spark.createDataFrame(rows, "ok long, it string")
    got = stats.item_item_cosine(df, "ok", "it", top_k=5,
                                 min_support=2).collect()
    pairs = {(r["item"], r["neighbor"]) for r in got}
    assert pairs == {("A", "B"), ("B", "A")}  # AC has support 1
    ranks = {r["item"]: r["rank"] for r in got}
    assert set(ranks.values()) == {1}


def test_item_cf_duplicate_lines_count_once(spark):
    """The same item twice in one basket is ONE incidence."""
    rows = [(1, "A"), (1, "A"), (1, "B"), (2, "A"), (2, "B")]
    df = spark.createDataFrame(rows, "ok long, it string")
    got = {(r["item"], r["neighbor"]): r["c_both"] for r in
           stats.item_item_cosine(df, "ok", "it", min_support=1).collect()}
    assert got[("A", "B")] == 2


# ---------------------------------------------------------------------------
# calibration / ECE
# ---------------------------------------------------------------------------


def test_calibration_perfectly_calibrated_scores(spark):
    """Outcome drawn AS the score quantile -> gap ~ 0 in every bin."""
    rows = [(i, i / 1000.0, 1 if (i * 37 % 1000) / 1000.0 < i / 1000.0 else 0)
            for i in range(1000)]
    df = spark.createDataFrame(rows, "id long, s double, y int")
    out = stats.calibration_bins(df, "s", F.col("y") == 1, n_bins=10,
                                 order_cols=["id"]).collect()
    assert len(out) == 10
    eces = {r["ece"] for r in out}
    assert len(eces) == 1  # the ECE column is a constant summary
    assert next(iter(eces)) < 0.06  # near-calibrated by construction
    for r in out:
        assert r["n"] == 100


def test_calibration_anticalibrated_has_large_ece(spark):
    rows = [(i, i / 100.0, 1 - (i % 2) * 0 if i < 50 else 0)
            for i in range(100)]
    # low scores always positive, high scores never -> big gaps
    df = spark.createDataFrame(rows, "id long, s double, y int")
    out = stats.calibration_bins(df, "s", F.col("y") == 1, n_bins=5,
                                 order_cols=["id"]).collect()
    assert next(iter({r["ece"] for r in out})) > 0.4
    with pytest.raises(ValueError, match="n_bins"):
        stats.calibration_bins(df, "s", F.col("y") == 1, n_bins=1)


# ---------------------------------------------------------------------------
# MMR re-ranking
# ---------------------------------------------------------------------------


def _emb_df(spark, vecs):
    return spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in vecs],
        "vec_id long, embedding array<double>",
    )


def test_mmr_prefers_diverse_over_redundant(spark):
    """Three near-copies of the best match + one orthogonal-ish doc:
    plain top-2 takes two copies; MMR's second pick is the diverse one."""
    q = [1.0, 0.0]
    corp = _emb_df(spark, [
        (1, [1.0, 0.01]), (2, [1.0, 0.02]), (3, [1.0, 0.03]),
        (4, [0.5, 0.5]),
    ])
    plain = similarity.topk_cosine(corp, "embedding", q, k=2)
    assert {r["vec_id"] for r in plain.collect()} <= {1, 2, 3}
    # lam=0.3: a near-copy's ~1.0 redundancy penalty outweighs its
    # relevance edge, so the 45-degree doc must take slot 2
    mmr = similarity.mmr_rerank(corp, "embedding", q, k=2, lam=0.3,
                                shortlist=4)
    picks = [r["vec_id"] for r in mmr.orderBy("rank").collect()]
    assert picks[0] in {1, 2, 3}
    assert picks[1] == 4  # diversity term kicks the near-copy out


def test_mmr_lambda_one_is_pure_relevance(spark):
    q = [1.0, 0.0]
    corp = _emb_df(spark, [(1, [1.0, 0.01]), (2, [1.0, 0.02]),
                           (3, [0.5, 0.5])])
    mmr = similarity.mmr_rerank(corp, "embedding", q, k=3, lam=1.0,
                                shortlist=3)
    plain = similarity.topk_cosine(corp, "embedding", q, k=3)
    assert [r["vec_id"] for r in mmr.orderBy("rank").collect()] == [
        r["vec_id"] for r in plain.collect()
    ]


def test_mmr_argument_guards(spark):
    corp = _emb_df(spark, [(1, [1.0, 0.0])])
    with pytest.raises(ValueError, match="k >= 1"):
        similarity.mmr_rerank(corp, "embedding", [1.0, 0.0], k=0)
    with pytest.raises(ValueError, match="lam"):
        similarity.mmr_rerank(corp, "embedding", [1.0, 0.0], k=1, lam=0.0)
    with pytest.raises(ValueError, match="shortlist"):
        similarity.mmr_rerank(corp, "embedding", [1.0, 0.0], k=5,
                              shortlist=2)


# ---------------------------------------------------------------------------
# Stupid Backoff
# ---------------------------------------------------------------------------


def test_stupid_backoff_branches(spark):
    """Train: 'a b c'. Score: 'a b', 'a c' (seen unigrams, unseen
    bigram), 'x y' (OOV everywhere)."""
    rows = [
        (0, "a b c"),    # train (id % 2 == 0 filter below picks id 0 only)
        (1, "a b"),      # seen bigram: s = c(a,b)/c(a) = 1/1
        (3, "c a"),      # unseen bigram, seen unigram: s = .4*c(a)/N
        (5, "x y"),      # OOV: s = .4*.4/N
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in textops.stupid_backoff_logprob(
        df, F.col("doc_id") == 0).collect()}
    n_train = 3.0
    assert out[1]["avg_logprob"] == pytest.approx(math.log(1.0), abs=1e-6)
    assert out[1]["n_backoff"] == 0
    assert out[3]["avg_logprob"] == pytest.approx(
        round(math.log(0.4 * 1 / n_train), 6), abs=1e-6)
    assert out[3]["n_backoff"] == 1
    assert out[5]["avg_logprob"] == pytest.approx(
        round(math.log(0.4 * 0.4 / n_train), 6), abs=1e-6)
    assert out[5]["n_backoff"] == 1


def test_stupid_backoff_short_docs_null(spark):
    df = spark.createDataFrame(
        [(0, "a b"), (1, "solo")], "doc_id long, text string")
    out = {r["doc_id"]: r for r in textops.stupid_backoff_logprob(
        df, F.col("doc_id") == 0).collect()}
    assert out[1]["n_bigrams"] == 0 and out[1]["avg_logprob"] is None


def test_stupid_backoff_live_on_fixture(spark):
    """The 1% split exercises the backoff branch on real fixture data."""
    docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet")
    sb = textops.stupid_backoff_logprob(docs, F.col("doc_id") % 100 == 0)
    assert sb.agg(F.sum("n_backoff")).head()[0] > 0
