"""Wave-58 operator tests: dup-rate by source and Heaps' law."""

from __future__ import annotations

import pytest

from weather_api_automate_etl_spark.operators import corpus, textops


def _dup(spark, rows):
    df = spark.createDataFrame(rows, "doc_id long, text string, src string")
    out = corpus.dup_rate_by_source(df, "doc_id", "text", "src")
    return {r["src"]: r for r in out.collect()}


def test_dup_rate_cross_source_counts_both(spark):
    rows = [(1, "same text", "a"), (2, "same text", "b"),
            (3, "unique one", "a")]
    got = _dup(spark, rows)
    # both holders of the duplicate group are "in dup groups"...
    assert got["a"]["n_in_dup_groups"] == 1
    assert got["b"]["n_in_dup_groups"] == 1
    # ...but only the higher id would be dropped (keep-lowest rule)
    assert got["a"]["n_would_drop"] == 0
    assert got["b"]["n_would_drop"] == 1
    assert got["a"]["dup_rate"] == 0.5


def test_dup_rate_clean_source_is_zero(spark):
    rows = [(1, "x", "a"), (2, "y", "a")]
    got = _dup(spark, rows)
    assert got["a"]["dup_rate"] == 0.0 and got["a"]["drop_rate"] == 0.0


def test_dup_rate_within_source_triple(spark):
    rows = [(1, "t", "a"), (2, "t", "a"), (3, "t", "a")]
    got = _dup(spark, rows)
    assert got["a"]["n_in_dup_groups"] == 3
    assert got["a"]["n_would_drop"] == 2


def _heaps(spark, docs, n_buckets=2):
    df = spark.createDataFrame(
        [(i, s) for i, s in enumerate(docs)], "doc_id long, text string"
    )
    out = textops.heaps_law(df, "doc_id", "text", n_buckets=n_buckets)
    return sorted(out.collect(), key=lambda r: r["bucket"])


def test_heaps_counts_per_prefix(spark):
    docs = ["a b c", "a d"]  # bucket1: 3 tokens, vocab {a,b,c}
    got = _heaps(spark, docs)
    assert got[0]["cum_tokens"] == 3 and got[0]["vocab"] == 3
    # prefix 2 adds tokens a,d → cum 5, vocab {a,b,c,d}
    assert got[1]["cum_tokens"] == 5 and got[1]["vocab"] == 4


def test_heaps_closed_vocab_flat_curve(spark):
    docs = ["a b", "a b", "b a", "a b"]
    got = _heaps(spark, docs, n_buckets=4)
    assert [r["vocab"] for r in got] == [2, 2, 2, 2]
    # closed vocabulary → beta ≈ 0
    assert abs(got[0]["beta"]) < 0.05


def test_heaps_buckets_are_doc_deciles_not_token_deciles(spark):
    # one long doc then one short: doc-ntile puts the LONG doc alone in
    # bucket 1 (token-positional bucketing would split its tokens)
    docs = ["w x y z p q r s", "m"]
    got = _heaps(spark, docs)
    assert got[0]["cum_tokens"] == 8 and got[1]["cum_tokens"] == 9


def test_heaps_rejects_single_bucket(spark):
    df = spark.createDataFrame([(1, "a")], "doc_id long, text string")
    with pytest.raises(ValueError):
        textops.heaps_law(df, "doc_id", "text", n_buckets=1)


def test_round10_textops_review_fixes(spark):
    """Regression pins for the round-10 textops review findings."""
    import pytest as _pytest
    from pyspark.sql import functions as F

    from weather_api_automate_etl_spark.operators import textops

    docs = spark.createDataFrame(
        [(1, "alpha beta alpha"), (2, "   "), (3, "gamma")],
        "doc_id long, text string",
    )
    # (1) the '' pseudo-token of whitespace docs enters NO vocabulary
    lp = {r.doc_id: r.n_tokens for r in textops.unigram_logprob(docs).collect()}
    assert 2 not in lp  # no tokens → no row (it never scored '' before)
    tt = {r.doc_id: r.ws_tokens for r in textops.text_profile(docs).collect()}
    assert tt[2] == 0 and tt[1] == 3
    rp = {r.doc_id: r.n_words for r in
          textops.repetition_profile(docs).collect()}
    assert rp[2] == 0
    assert all(
        r.term != "" for r in textops.tfidf_top_terms(docs, k=5).collect()
    )
    ent = {r.doc_id: r.n_tokens for r in textops.token_entropy(docs).collect()}
    assert 2 not in ent
    # (2) bm25 matches uppercase query terms against lowercased tokens
    hits = textops.bm25_scores(docs, ["ALPHA"]).collect()
    assert [r.doc_id for r in hits] == [1]
    # (3) chunk_text validates its shape parameters
    with _pytest.raises(ValueError, match="stride"):
        textops.chunk_text(docs, chunk_tokens=4, stride=0)
    # (4) compression_ratio keeps a non-long id type
    sdocs = docs.select(F.col("doc_id").cast("string").alias("doc_id"), "text")
    out = textops.compression_ratio(sdocs)
    assert dict(out.dtypes)["doc_id"] == "string" and out.count() == 3
