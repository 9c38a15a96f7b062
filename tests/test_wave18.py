"""Wave-18 operator tests: out-of-fold target encoding, audio frame
features, ledger partition-spec evolution, readability, path n-grams."""

from __future__ import annotations

import hashlib
import tempfile

import numpy as np
import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_SMALL
from weather_api_automate_etl_spark.operators import sampling, textops, windows
from weather_api_automate_etl_spark.sources import ledger, multimodal


def _fold(key, k=5):
    return int(hashlib.md5(str(key).encode()).hexdigest()[:8], 16) % k


# ---------------------------------------------------------------------------
# out-of-fold target encoding
# ---------------------------------------------------------------------------


def test_target_encode_excludes_own_fold(spark):
    rows = [(i, "A", float(i)) for i in range(100)]
    df = spark.createDataFrame(rows, "k long, cat string, y double")
    got = {r["k"]: r["te"] for r in
           sampling.target_encode_oof(df, "k", "cat", "y", k=5).collect()}
    for key in (0, 17, 42):
        f = _fold(key)
        oof = [float(i) for i in range(100) if _fold(i) != f]
        assert got[key] == pytest.approx(sum(oof) / len(oof), abs=1e-9)


def test_target_encode_single_fold_category_is_null(spark):
    """A category confined to one fold has no out-of-fold evidence."""
    df = spark.createDataFrame(
        [(1000, "B", 5.0)] + [(i, "A", 1.0) for i in range(50)],
        "k long, cat string, y double",
    )
    got = {r["k"]: r["te"] for r in
           sampling.target_encode_oof(df, "k", "cat", "y", k=5).collect()}
    assert got[1000] is None
    assert got[0] == 1.0


def test_target_encode_row_grain_preserved(spark):
    df = spark.read.parquet(f"{SF_SMALL}/orders.parquet")
    te = sampling.target_encode_oof(
        df, "o_orderkey", "o_orderpriority", "o_totalprice", k=5
    )
    assert te.count() == df.count()
    assert te.select("o_orderkey").distinct().count() == df.count()


# ---------------------------------------------------------------------------
# audio frame features
# ---------------------------------------------------------------------------


def _wav_ref(doc_id, win=8):
    nch = 1 + doc_id % 2
    nfr = doc_id % 50 + 10
    k = np.arange(nfr * nch, dtype=np.int64)
    flat = (doc_id * 31 + k * 7) % 65536 - 32768
    mono = flat.reshape(nfr, nch).astype(float).mean(axis=1)
    out = {}
    for w0 in range(0, nfr, win):
        seg = mono[w0:w0 + win]
        out[w0 // win] = (
            len(seg),
            round(float(np.sqrt((seg * seg).mean())), 6),
            int((seg[1:] * seg[:-1] < 0).sum()),
        )
    return out


def test_audio_features_match_formula(spark):
    docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet").limit(40)
    assets = multimodal.documents_as_wav_assets(docs)
    got = {}
    for r in multimodal.audio_frame_features(assets).collect():
        got.setdefault(r["asset_id"], {})[r["win_id"]] = (
            r["n_samp"], r["rms"], r["zcr"],
        )
    for d, wins in got.items():
        assert wins == _wav_ref(d), d


def test_audio_features_trailing_window_not_padded(spark):
    """doc 3: 13 frames -> windows of 8 and 5 samples."""
    docs = spark.createDataFrame([(3,)], "doc_id long")
    assets = multimodal.documents_as_wav_assets(docs)
    rows = sorted(
        multimodal.audio_frame_features(assets).collect(),
        key=lambda r: r["win_id"],
    )
    assert [r["n_samp"] for r in rows] == [8, 5]
    with pytest.raises(ValueError, match="win"):
        multimodal.audio_frame_features(assets, win=1)


# ---------------------------------------------------------------------------
# ledger repartition
# ---------------------------------------------------------------------------


@pytest.fixture()
def repart_base(spark, tmp_path):
    od = spark.read.parquet(f"{SF_SMALL}/orders.parquet").select(
        "o_orderkey", "o_custkey", "o_totalprice",
        F.year("o_orderdate").cast("string").alias("p_year"),
        (F.col("o_custkey") % 4).cast("string").alias("p_cust"),
    )
    base = str(tmp_path / "mart")
    ledger.ledger_write(
        spark, od, base, "p_year",
        stats_cols=["o_totalprice"], key_index_col="o_orderkey",
    )
    return base, od


def test_repartition_is_answer_invariant(spark, repart_base):
    base, od = repart_base
    before = set(map(tuple, ledger.ledger_read(spark, base)
                     .select("o_orderkey", "o_totalprice").collect()))
    v2 = ledger.ledger_repartition(spark, base, "p_cust")
    after = set(map(tuple, ledger.ledger_read(spark, base)
                    .select("o_orderkey", "o_totalprice").collect()))
    assert before == after
    # time travel still serves the OLD layout
    old = ledger.ledger_read(spark, base, version=v2 - 1)
    assert old.count() == len(before)
    hist = {r["version"]: r["op"]
            for r in ledger.ledger_history(spark, base).collect()}
    assert hist[v2] == "REPARTITION"


def test_repartition_prunes_on_new_column(spark, repart_base):
    base, od = repart_base
    ledger.ledger_repartition(
        spark, base, "p_cust", stats_cols=["o_totalprice", "p_cust"]
    )
    pruned = ledger.ledger_scan(spark, base, "p_cust", "1", "1")
    assert pruned.count() == od.filter("p_cust = '1'").count()
    # planning touches one partition, not four
    chosen = ledger.ledger_plan(base, "p_cust", "1", "1")
    assert len(chosen) == 1


def test_repartition_carries_checks_and_txn(spark, tmp_path):
    od = spark.createDataFrame(
        [(1, 10.0, "a", "x"), (2, 20.0, "b", "y")],
        "k long, v double, p1 string, p2 string",
    )
    base = str(tmp_path / "m2")
    ledger.ledger_write(
        spark, od, base, "p1", txn=("app", 7), checks={"v_pos": "v > 0"},
    )
    ledger.ledger_repartition(spark, base, "p2")
    # the CHECK constraint still gates merges after the spec change
    bad = spark.createDataFrame([(3, -1.0, "a", "x")],
                                "k long, v double, p1 string, p2 string")
    with pytest.raises(Exception, match="v_pos"):
        ledger.ledger_merge(spark, base, bad, key="k")
    # the exactly-once watermark survived: txn 7 replays as a no-op
    good = spark.createDataFrame([(4, 9.0, "a", "x")],
                                 "k long, v double, p1 string, p2 string")
    v_before = ledger.ledger_history(spark, base).agg(
        F.max("version")).head()[0]
    v_after = ledger.ledger_merge(spark, base, good, key="k", txn=("app", 7))
    assert v_after == v_before  # stale txn id: nothing applied
    assert ledger.ledger_read(spark, base).filter("k = 4").count() == 0


def test_repartition_rejects_unknown_column(spark, repart_base):
    base, _ = repart_base
    with pytest.raises(ValueError, match="not in the table"):
        ledger.ledger_repartition(spark, base, "nope")


# ---------------------------------------------------------------------------
# readability
# ---------------------------------------------------------------------------


def test_readability_formula_and_guards(spark):
    docs = spark.createDataFrame(
        [
            (1, "the cat sat. it purred! then it slept"),
            (2, "   "),
            (3, "one"),
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in
           textops.readability_scores(docs).collect()}
    r1 = got[1]
    assert (r1["n_words"], r1["n_sents"], r1["n_syllables"]) == (8, 3, 9)
    expected = 206.835 - 1.015 * (8 / 3) - 84.6 * (9 / 8)
    assert r1["flesch"] == pytest.approx(expected, abs=1e-4)
    assert got[2]["n_words"] == 0 and got[2]["flesch"] is None
    assert got[3]["n_sents"] == 1  # no terminal punctuation: one sentence


# ---------------------------------------------------------------------------
# path n-grams
# ---------------------------------------------------------------------------


def test_path_ngrams_counts_and_tiebreak(spark):
    rows = [
        (1, 1, "a"), (1, 2, "b"), (1, 3, "c"), (1, 4, "b"), (1, 5, "c"),
        (2, 1, "a"), (2, 2, "b"), (2, 3, "c"),
    ]
    df = spark.createDataFrame(rows, "u long, ts long, e string")
    got = [(r["path"], r["n_occurrences"]) for r in
           windows.path_ngrams(df, "u", ["ts"], "e", n=3, top_k=10).collect()]
    assert got[0] == ("a > b > c", 2)
    assert ("b > c > b", 1) in got and ("c > b > c", 1) in got
    # sequences never cross entities
    assert all("c > a" not in p for p, _ in got)


def test_path_ngrams_short_sequences_emit_nothing(spark):
    df = spark.createDataFrame([(1, 1, "a"), (1, 2, "b")],
                               "u long, ts long, e string")
    assert windows.path_ngrams(df, "u", ["ts"], "e", n=3).isEmpty()
    with pytest.raises(ValueError, match="n >= 2"):
        windows.path_ngrams(df, "u", ["ts"], "e", n=1)


def test_path_ngrams_null_step_never_glues_neighbors(spark):
    """A NULL step VALUE mid-sequence must invalidate every n-gram that
    touches it — concat_ws silently skips NULLs, which would otherwise
    glue non-adjacent steps into a false 'a > c'-style path."""
    rows = [(1, 1, "a"), (1, 2, None), (1, 3, "c"), (1, 4, "d")]
    df = spark.createDataFrame(rows, "u long, ts long, e string")
    got = {r["path"] for r in
           windows.path_ngrams(df, "u", ["ts"], "e", n=2, top_k=10).collect()}
    assert got == {"c > d"}  # never "a > c" (glued) nor "a" / "c" singles
