"""Wave-29 operator tests: RRF fusion and NDCG@k."""

from __future__ import annotations

import math

import pytest

from weather_api_automate_etl_spark.operators import similarity


def _rank(spark, pairs):
    return spark.createDataFrame(pairs, "doc_id int, score double")


# ---------------------------------------------------------------------------
# reciprocal-rank fusion
# ---------------------------------------------------------------------------


def _rrf(spark, a, b, **kw):
    out = similarity.rrf_fuse(_rank(spark, a), _rank(spark, b), **kw)
    return {r["doc_id"]: r for r in out.collect()}


def test_rrf_hand_computed(spark):
    """A ranks: 1,2,3 ; B ranks: 3,2,1 (reversed). With k=60:
    doc1 = 1/61 + 1/63, doc2 = 2/62, doc3 = 1/63 + 1/61."""
    a = [(1, 0.9), (2, 0.5), (3, 0.1)]
    b = [(3, 0.8), (2, 0.6), (1, 0.2)]
    got = _rrf(spark, a, b, rrf_k=60)
    assert got[1]["rrf_score"] == pytest.approx(1 / 61 + 1 / 63, abs=1e-6)
    assert got[2]["rrf_score"] == pytest.approx(2 / 62, abs=1e-6)
    assert got[3]["rrf_score"] == pytest.approx(1 / 63 + 1 / 61, abs=1e-6)
    assert got[1]["rank_a"] == 1 and got[1]["rank_b"] == 3


def test_rrf_single_list_membership_contributes_once(spark):
    a = [(1, 0.9), (2, 0.8)]
    b = [(2, 0.7), (9, 0.6)]
    got = _rrf(spark, a, b, rrf_k=10)
    assert got[9]["rank_a"] is None
    assert got[9]["rrf_score"] == pytest.approx(1 / 12, abs=1e-6)
    # consensus doc beats either single-list doc
    assert got[2]["rrf_score"] > got[1]["rrf_score"] > 0


def test_rrf_shortlist_cuts_tail(spark):
    a = [(i, 1.0 - i * 0.001) for i in range(1, 31)]
    b = [(i, 1.0 - i * 0.001) for i in range(1, 31)]
    got = _rrf(spark, a, b, shortlist=5, top=50)
    # only the shortlisted 5 docs can appear at all
    assert set(got) == {1, 2, 3, 4, 5}


def test_rrf_tie_scores_break_by_id(spark):
    a = [(7, 0.5), (3, 0.5), (5, 0.5)]
    b = [(3, 0.1)]
    got = _rrf(spark, a, b, rrf_k=60)
    assert got[3]["rank_a"] == 1 and got[5]["rank_a"] == 2
    assert got[7]["rank_a"] == 3


def test_rrf_rejects_bad_k(spark):
    df = _rank(spark, [(1, 1.0)])
    with pytest.raises(ValueError, match="rrf"):
        similarity.rrf_fuse(df, df, rrf_k=0)


# ---------------------------------------------------------------------------
# NDCG@k
# ---------------------------------------------------------------------------


def _ndcg(spark, system, rels, k):
    rel_df = spark.createDataFrame(rels, "doc_id int, rel int")
    (r,) = similarity.ndcg_at_k(
        _rank(spark, system), rel_df, k=k
    ).collect()
    return r


def test_ndcg_perfect_ranking_is_one(spark):
    system = [(1, 0.9), (2, 0.8), (3, 0.7)]
    rels = [(1, 3), (2, 2), (3, 1)]
    r = _ndcg(spark, system, rels, k=3)
    assert r["ndcg"] == pytest.approx(1.0, abs=1e-6)
    assert r["dcg"] == pytest.approx(r["idcg"], abs=1e-6)


def test_ndcg_empty_relevance_yields_null_not_inf(spark):
    """Round-8 advice: a relevance frame with no positive labels has no
    ideal ranking (idcg = 0); ndcg must be NULL by contract, never
    Inf/NaN from a 0-division."""
    system = [(1, 0.9), (2, 0.8)]
    rels = [(1, 0), (2, 0)]
    r = _ndcg(spark, system, rels, k=2)
    assert r["idcg"] == 0.0 and r["dcg"] == 0.0
    assert r["ndcg"] is None


def test_ndcg_hand_computed_swap(spark):
    """System retrieves rel [1, 3] in that order; ideal is [3, 1].
    DCG = (2^1-1)/log2(2) + (2^3-1)/log2(3)
    IDCG = 7/log2(2) + 1/log2(3)."""
    system = [(1, 0.9), (2, 0.8)]
    rels = [(1, 1), (2, 3)]
    r = _ndcg(spark, system, rels, k=2)
    dcg = 1 / 1 + 7 / math.log2(3)
    idcg = 7 / 1 + 1 / math.log2(3)
    assert r["dcg"] == pytest.approx(dcg, abs=1e-6)
    assert r["idcg"] == pytest.approx(idcg, abs=1e-6)
    assert r["ndcg"] == pytest.approx(dcg / idcg, abs=1e-6)


def test_ndcg_unlabeled_docs_gain_zero(spark):
    system = [(99, 1.0), (1, 0.5)]  # 99 has no label
    rels = [(1, 2), (2, 3)]
    r = _ndcg(spark, system, rels, k=2)
    # DCG = 0 at pos1 + 3/log2(3); IDCG = 7 + 3/log2(3)
    assert r["dcg"] == pytest.approx(3 / math.log2(3), abs=1e-6)
    assert r["idcg"] == pytest.approx(7 + 3 / math.log2(3), abs=1e-6)


def test_ndcg_k_cuts_ranking(spark):
    system = [(1, 0.9), (2, 0.8), (3, 0.7)]
    rels = [(1, 0), (2, 0), (3, 3)]
    # with k=2 the only relevant doc is below the cut: DCG = 0
    r = _ndcg(spark, system, rels, k=2)
    assert r["dcg"] == pytest.approx(0.0, abs=1e-9)
    assert r["ndcg"] == pytest.approx(0.0, abs=1e-9)


def test_ndcg_rejects_bad_k(spark):
    df = _rank(spark, [(1, 1.0)])
    rel = spark.createDataFrame([(1, 1)], "doc_id int, rel int")
    with pytest.raises(ValueError, match="ndcg"):
        similarity.ndcg_at_k(df, rel, k=0)
