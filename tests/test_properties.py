"""Property-based tests (hypothesis): the Spark expressions agree with
plain-Python reference implementations on arbitrary inputs."""


from __future__ import annotations

import pytest

import hashlib

from hypothesis import HealthCheck, given, settings, strategies as st
from pyspark.sql import functions as F

from weather_api_automate_etl_spark.functions.core import (
    SURROGATE_NULL_SENTINEL,
    surrogate_key,
    temperature_category,
)
from weather_api_automate_etl_spark.functions.text import tokens, word_shingles

SETTINGS = settings(
    max_examples=8,  # each example is a Spark job; keep the suite fast
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

text_st = st.text(
    alphabet=st.characters(whitelist_categories=("Lu", "Ll", "Nd", "Zs")),
    min_size=0,
    max_size=120,
)


@given(city=text_st, country=st.one_of(st.none(), text_st))
@SETTINGS
def test_surrogate_key_matches_hashlib(spark, city, country):
    df = spark.createDataFrame([(city, country)], "city string, country string")
    got = df.select(surrogate_key("city", "country").alias("k")).head().k
    c2 = country if country is not None else SURROGATE_NULL_SENTINEL
    assert got == hashlib.md5(f"{city}-{c2}".encode()).hexdigest()


@given(t=st.integers(min_value=-200, max_value=200))
@SETTINGS
def test_bucket_totality_and_order(spark, t):
    df = spark.createDataFrame([(t,)], "temperature int")
    got = df.select(temperature_category("temperature").alias("b")).head().b
    expect = (
        "Freezing" if t < 0 else
        "Cold" if t <= 10 else
        "Mild" if t <= 20 else
        "Warm" if t <= 30 else "Hot"
    )
    assert got == expect


@given(text=text_st, k=st.integers(min_value=2, max_value=4))
@SETTINGS
def test_shingles_match_python_reference(spark, text, k):
    df = spark.createDataFrame([(text,)], "text string")
    got = df.select(word_shingles(tokens("text"), k).alias("s")).head().s
    # The reference must model JAVA semantics, not Python's: Java regex
    # \s is ASCII-only (U+2000-style Zs separators do NOT split — the
    # falsifying example hypothesis found), and Java trim() strips only
    # chars <= U+0020 (ASCII space, for this alphabet).
    import re

    s = text.strip(" ").lower()
    toks = re.split(r"[ \t\n\x0b\f\r]+", s)
    ref = (
        [" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)]
        if len(toks) >= k
        else []
    )
    assert got == ref


def test_repetition_profile_hand_case(spark):
    from weather_api_automate_etl_spark.operators import textops

    docs = spark.createDataFrame(
        [
            (1, "a a a b"),    # top word a: 3/4; bigrams: "a a" x2, "a b" -> 2/3
            (2, "x y z w"),    # all unique: 1/4, 1/3
            (3, "solo"),       # one word: 1/1, no bigrams -> null
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: (r.n_words, r.top_word_frac, r.top_bigram_frac)
           for r in textops.repetition_profile(docs).collect()}
    assert got[1] == (4, 0.75, 0.666667)
    assert got[2] == (4, 0.25, 0.333333)
    assert got[3] == (1, 1.0, None)


def test_source_mix_and_pack_estimate_hand_case(spark):
    import pyspark.sql.functions as F

    from weather_api_automate_etl_spark.operators import corpus

    docs = spark.createDataFrame(
        [(1, "en", "s1", 100, 40), (2, "en", "s1", 100, 40),
         (3, "en", "s2", 200, 10), (4, "de", "s1", 100, 30)],
        "doc_id long, lang string, source string, n_chars long, toks long",
    )
    mix = {(r.lang, r.source): (r.n_docs, r.weight, r.doc_share, r.weight_share)
           for r in corpus.source_mix(docs).collect()}
    assert mix[("en", "s1")] == (2, 200, 0.5, 0.4)
    assert mix[("en", "s2")] == (1, 200, 0.25, 0.4)
    assert mix[("de", "s1")] == (1, 100, 0.25, 0.2)

    pack = {r.source: (r.n_docs, r.total_tokens, r.packed_seqs,
                       r.padded_efficiency, r.n_overflow_docs)
            for r in corpus.pack_estimate(docs, "toks", ("source",), ctx_len=32).collect()}
    # s1: toks 40,40,30 -> total 110, packed ceil(110/32)=4,
    #     padded seqs 2+2+1=5 -> eff 110/160=0.6875, overflow 2
    assert pack["s1"] == (3, 110, 4, 0.6875, 2)
    # s2: 10 tokens -> 1 seq, eff 10/32
    assert pack["s2"] == (1, 10, 1, 0.3125, 0)


def test_bm25_hand_case(spark):
    import math

    from weather_api_automate_etl_spark.operators import textops

    docs = spark.createDataFrame(
        [(1, "cat dog cat"), (2, "dog dog dog dog"), (3, "bird bird")],
        "doc_id long, text string",
    )
    got = {r.doc_id: r.score for r in textops.bm25_scores(docs, ["cat"]).collect()}
    # only doc 1 contains 'cat'; formula by hand: N=3, df=1, tf=2, dl=3, avgdl=3
    idf = math.log((3 - 1 + 0.5) / (1 + 0.5) + 1.0)
    want = idf * 2.0 * 2.2 / (2.0 + 1.2 * (0.25 + 0.75 * 3 / 3.0))
    assert set(got) == {1}
    assert abs(got[1] - round(want, 6)) < 1e-9


def test_chunk_text_windows_cover_and_overlap(spark):
    from weather_api_automate_etl_spark.operators import textops

    docs = spark.createDataFrame(
        [(1, " ".join(f"w{i}" for i in range(20))),   # 20 toks -> starts 0, 8
         (2, "a b c"),                                 # short -> 1 chunk
         (3, " ".join(f"x{i}" for i in range(16))),    # exactly chunk -> 1
         (4, "   ")],                                  # whitespace-only doc
        "doc_id long, text string",
    )
    rows = textops.chunk_text(docs, chunk_tokens=16, stride=8).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    c1 = sorted(by_doc[1], key=lambda r: r.chunk_idx)
    assert [r.chunk_idx for r in c1] == [0, 1]
    assert c1[0].chunk_text.split() == [f"w{i}" for i in range(16)]
    assert c1[1].chunk_text.split() == [f"w{i}" for i in range(8, 20)]
    assert (c1[0].n_tokens, c1[1].n_tokens) == (16, 12)
    assert len(by_doc[2]) == 1 and by_doc[2][0].n_tokens == 3
    assert len(by_doc[3]) == 1 and by_doc[3][0].n_tokens == 16
    # round-12 review: the '' pseudo-token of empty docs is NOT a token —
    # an empty doc yields one empty chunk with n_tokens 0, never 1
    assert len(by_doc[4]) == 1
    assert (by_doc[4][0].chunk_text, by_doc[4][0].n_tokens) == ("", 0)


def test_bpe_encode_empty_doc_counts_zero_tokens(spark):
    # round-12 review: bpe_encode must not count the '' pseudo-token of an
    # empty doc in n_tokens (the text_profile accounting convention)
    from weather_api_automate_etl_spark.operators import textops

    docs = spark.createDataFrame(
        [(1, "ab ab ab"), (2, "")], "doc_id long, text string"
    )
    table = textops.bpe_merge_rounds(docs, n_rounds=1, placeholders="")
    got = {
        r.doc_id: (r.n_tokens, r.n_chars, r.n_symbols, r.ratio)
        for r in textops.bpe_encode(docs, table, "", n_rounds=1).collect()
    }
    assert got[1] == (3, 6, 3, 0.5)  # 'ab' merged to one symbol per token
    assert got[2] == (0, 0, 0, 1.0)


# ---------------------------------------------------------------------------
# round-2 property tests: codec round-trips, chunk coverage, CDC hash
# ---------------------------------------------------------------------------

_img_st = st.tuples(
    st.integers(min_value=1, max_value=9),   # h
    st.integers(min_value=1, max_value=9),   # w
    st.integers(min_value=0, max_value=2**32 - 1),  # pixel seed
)


@given(hwseed=_img_st)
@settings(max_examples=30, deadline=None)
def test_codec_roundtrip_property(hwseed):
    # pure-Python property (no Spark job): BOTH codecs invert exactly for
    # arbitrary dims (incl. every BMP stride padding) and arbitrary pixels
    import numpy as np

    from weather_api_automate_etl_spark.sources import codecs

    h, w, seed = hwseed
    rng = np.random.default_rng(seed)
    px = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    assert np.array_equal(codecs.decode_ppm(codecs.encode_ppm(px)), px)
    assert np.array_equal(codecs.decode_bmp(codecs.encode_bmp(px)), px)
    # PNG: filter choice and alpha channel derived from the seed so the
    # property sweeps all five unfilter paths and both color types
    bpp = 3 if seed % 2 == 0 else 4
    pxa = rng.integers(0, 256, size=(h, w, bpp), dtype=np.uint8)
    assert np.array_equal(
        codecs.decode_png(codecs.encode_png(pxa, filter_type=seed % 5)), pxa
    )
    # WAV: channel count from the seed
    frames = rng.integers(-32768, 32768, size=(h * w, 1 + seed % 2)).astype(
        np.int16
    )
    back, rate = codecs.decode_wav(codecs.encode_wav(frames, 8000 + seed % 3))
    assert rate == 8000 + seed % 3 and np.array_equal(back, frames)


@given(
    payload=st.binary(min_size=0, max_size=400),
    seed=st.integers(min_value=0, max_value=2**32 - 1),
)
@settings(max_examples=120, deadline=None)
def test_decoders_fail_loudly_on_garbage(payload, seed):
    # Malformed bytes — pure garbage AND doctored valid payloads — must
    # raise ValueError/NotImplementedError from every decoder, never hang,
    # crash the interpreter, or silently return wrong pixels/samples.
    import numpy as np

    from weather_api_automate_etl_spark.sources import codecs

    for dec in (codecs.decode_png, codecs.decode_wav, codecs.decode_image):
        try:
            dec(payload)
        except (ValueError, NotImplementedError):
            pass
        # decode_image on a valid-by-luck payload returning an array is fine

    rng = np.random.default_rng(seed)
    px = rng.integers(0, 256, size=(3, 4, 3), dtype=np.uint8)
    for enc in (
        lambda p: codecs.encode_png(p, filter_type=seed % 5),
        codecs.encode_ppm,
        codecs.encode_bmp,
    ):
        good = bytearray(enc(px))
        if not good:
            continue
        pos = seed % len(good)
        good[pos] = (good[pos] + 1 + seed // 7 % 255) % 256
        try:
            out = codecs.decode_image(bytes(good))
            # a surviving single-byte flip may only change pixel VALUES,
            # never the shape contract
            assert out.ndim == 3 and out.shape[2] in (3, 4)
        except (ValueError, NotImplementedError):
            pass


@given(
    n_tokens=st.integers(min_value=0, max_value=60),
    chunk=st.integers(min_value=2, max_value=20),
)
@SETTINGS
def test_chunk_text_coverage_property(spark, n_tokens, chunk):
    # every token lands in >=1 chunk; consecutive chunks overlap by
    # chunk - stride tokens; chunk_idx is dense from 0
    from weather_api_automate_etl_spark.operators import textops

    stride = max(1, chunk // 2)
    text = " ".join(f"t{i}" for i in range(n_tokens))
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    rows = sorted(
        textops.chunk_text(df, chunk_tokens=chunk, stride=stride).collect(),
        key=lambda r: r.chunk_idx,
    )
    assert [r.chunk_idx for r in rows] == list(range(len(rows)))
    covered = []
    for r in rows:
        toks = r.chunk_text.split() if r.chunk_text else []
        assert r.n_tokens == len(toks) or (n_tokens == 0 and r.n_tokens == 1)
        covered.extend(toks)
    if n_tokens > 0:
        assert set(covered) == {f"t{i}" for i in range(n_tokens)}


@given(
    a=st.tuples(st.one_of(st.none(), st.text(max_size=6)),
                st.one_of(st.none(), st.text(max_size=6))),
    b=st.tuples(st.one_of(st.none(), st.text(max_size=6)),
                st.one_of(st.none(), st.text(max_size=6))),
)
@SETTINGS
def test_cdc_row_hash_injective_on_tuples(spark, a, b):
    # distinct (s, v) tuples never hash equal; equal tuples always do —
    # incl. None vs "" vs control chars
    from weather_api_automate_etl_spark.operators.cdc import _row_hash

    df = spark.createDataFrame([a, b], "s string, v string")
    h = [r.h for r in df.select(_row_hash(["s", "v"]).alias("h")).collect()]
    assert (h[0] == h[1]) == (a == b)


# ---------------------------------------------------------------------------
# round-8 CDC operators vs pure-Python replay references
# ---------------------------------------------------------------------------

cdc_log_st = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=5),          # key
        st.integers(min_value=0, max_value=50),         # seq
        st.sampled_from(["I", "U", "D"]),               # op
        st.floats(min_value=-10, max_value=10, allow_nan=False),
    ),
    min_size=1,
    max_size=25,
    unique_by=lambda r: (r[0], r[1]),  # seq unique per key (log offsets)
)


@given(log=cdc_log_st)
@SETTINGS
def test_apply_cdc_matches_python_replay(spark, log):
    from weather_api_automate_etl_spark.operators.cdc import apply_cdc

    df = spark.createDataFrame(
        log, "k long, seq long, op string, v double"
    )
    got = {
        r["k"]: (r["seq"], r["op"], r["v"])
        for r in apply_cdc(df, "k", "seq", "op").collect()
    }
    # reference: replay in seq order per key, final D removes the key
    want = {}
    for k, seq, op, v in sorted(log, key=lambda r: (r[0], r[1])):
        want[k] = (seq, op, v)
    want = {k: r for k, r in want.items() if r[1] != "D"}
    assert got == want


@given(
    mart=st.lists(
        st.tuples(st.integers(0, 6), st.floats(0, 100, allow_nan=False)),
        min_size=0, max_size=8, unique_by=lambda r: r[0],
    ),
    src=st.lists(
        st.tuples(st.integers(0, 6), st.floats(0, 100, allow_nan=False)),
        min_size=0, max_size=8, unique_by=lambda r: r[0],
    ),
    thresh=st.floats(10, 90, allow_nan=False),
)
@SETTINGS
@pytest.mark.slow
def test_merge_when_matches_python_reference(spark, mart, src, thresh):
    from weather_api_automate_etl_spark.operators.cdc import merge_when

    mdf = spark.createDataFrame(mart, "k long, v double")
    sdf = spark.createDataFrame(src, "k long, v double")
    got = {
        r["k"]: r["v"]
        for r in merge_when(
            mdf, sdf, "k",
            matched_delete=f"s.v < {thresh}",
            matched_update="s.v < t.v",
            not_matched_insert=f"s.v >= {thresh}",
        ).collect()
    }
    tmap, smap = dict(mart), dict(src)
    want = {}
    for k, tv in tmap.items():
        if k in smap:
            sv = smap[k]
            if sv < thresh:
                continue  # WHEN MATCHED AND s.v < thresh THEN DELETE
            want[k] = sv if sv < tv else tv  # UPDATE else carry
        else:
            want[k] = tv
    for k, sv in smap.items():
        if k not in tmap and sv >= thresh:
            want[k] = sv
    assert got == want
