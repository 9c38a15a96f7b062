"""Round-11 property differentials, ninth batch: span dedup, bigram LM
scoring, readability, and seasonal baselines vs independent Python
references."""


from __future__ import annotations

import pytest

import math
import re
from collections import Counter

from hypothesis import HealthCheck, given, settings, strategies as st

from weather_api_automate_etl_spark.operators import dedup, textops, timeseries

SETTINGS = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

_doc_st = st.lists(
    st.sampled_from(["red", "blue", "green", "dog", "cat", "fox", "owl"]),
    min_size=1,
    max_size=12,
).map(" ".join)


# ---------------------------------------------------------------------------
# remove_duplicated_spans vs python span cover
# ---------------------------------------------------------------------------


@given(
    docs=st.lists(_doc_st, min_size=2, max_size=6),
    k=st.sampled_from([2, 3]),
)
@SETTINGS
@pytest.mark.slow
def test_span_removal_matches_python_cover(spark, docs, k):
    df = spark.createDataFrame(
        list(enumerate(docs)), "doc_id long, text string"
    )
    got = {
        r["doc_id"]: (r["clean_text"], r["n_removed"])
        for r in dedup.remove_duplicated_spans(
            df, k=k, min_docs=2
        ).collect()
    }
    toks = [d.split() for d in docs]
    span_docs: dict[tuple, set] = {}
    for i, ts in enumerate(toks):
        for s in range(len(ts) - k + 1):
            span_docs.setdefault(tuple(ts[s:s + k]), set()).add(i)
    dup = {sp for sp, ds in span_docs.items() if len(ds) >= 2}
    for i, ts in enumerate(toks):
        covered = set()
        for s in range(len(ts) - k + 1):
            if tuple(ts[s:s + k]) in dup:
                covered.update(range(s, s + k))
        clean = " ".join(t for p, t in enumerate(ts) if p not in covered)
        assert got[i] == (clean, len(covered))


# ---------------------------------------------------------------------------
# bigram_logprob vs python add-one bigram LM
# ---------------------------------------------------------------------------


@given(docs=st.lists(_doc_st, min_size=1, max_size=6))
@SETTINGS
@pytest.mark.slow
def test_bigram_logprob_matches_python(spark, docs):
    df = spark.createDataFrame(
        list(enumerate(docs)), "doc_id long, text string"
    )
    got = {
        r["doc_id"]: (r["n_bigrams"], r["avg_logprob"])
        for r in textops.bigram_logprob(df).collect()
    }
    toks = [d.split() for d in docs]
    cab: Counter = Counter()
    ca: Counter = Counter()
    for ts in toks:
        ca.update(ts)
        cab.update(zip(ts, ts[1:]))
    v = len(ca)
    for i, ts in enumerate(toks):
        bgs = list(zip(ts, ts[1:]))
        if not bgs:
            assert got[i] == (0, None)
            continue
        lp = sum(
            math.log((cab[bg] + 1.0) / (ca[bg[0]] + v)) for bg in bgs
        ) / len(bgs)
        assert got[i][0] == len(bgs)
        assert abs(got[i][1] - lp) < 1e-6


# ---------------------------------------------------------------------------
# readability_scores vs python Flesch
# ---------------------------------------------------------------------------


@given(
    sents=st.lists(
        st.lists(
            st.sampled_from(["table", "it", "strength", "aria", "dog"]),
            min_size=1,
            max_size=6,
        ).map(" ".join),
        min_size=1,
        max_size=4,
    ),
)
@SETTINGS
@pytest.mark.slow
def test_readability_matches_python_flesch(spark, sents):
    text = ". ".join(sents) + "."
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    (r,) = textops.readability_scores(df).collect()
    words = text.lower().split()
    words = [w for w in words if w]
    n_words = len(words)
    n_sents = max(
        sum(1 for s in re.split(r"[.!?]+", text) if s.strip()), 1
    )
    syll = sum(
        max(len(re.findall(r"[aeiouy]+", w)), 0) for w in words
    )
    flesch = 206.835 - 1.015 * (n_words / n_sents) - 84.6 * (syll / n_words)
    assert r["n_words"] == n_words
    assert r["n_sents"] == n_sents
    assert r["n_syllables"] == syll
    assert abs(r["flesch"] - flesch) < 1e-3


# ---------------------------------------------------------------------------
# seasonal_baseline vs python (dow, hour) means
# ---------------------------------------------------------------------------


@given(
    events=st.lists(
        st.tuples(st.integers(0, 400), st.integers(-30, 60)),
        min_size=1,
        max_size=30,
    ),
)
@SETTINGS
@pytest.mark.slow
def test_seasonal_baseline_matches_python(spark, events):
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1)  # a Monday; pg dow: 0=Sunday -> Monday=1
    rows = [
        ("g", t0 + dt.timedelta(hours=h), float(v), i)
        for i, (h, v) in enumerate(events)
    ]
    df = spark.createDataFrame(
        rows, "g string, ts timestamp_ntz, v double, i long"
    )
    got = {
        r["i"]: (r["dow"], r["hr"], r["baseline"], r["residual"])
        for r in timeseries.seasonal_baseline(
            df, "g", "ts", "v", keep_cols=("i",)
        ).collect()
    }
    cells: dict[tuple, list] = {}
    meta = {}
    for i, (h, v) in enumerate(events):
        ts = t0 + dt.timedelta(hours=h)
        dow = (ts.weekday() + 1) % 7  # python Monday=0 -> pg Sunday=0
        cells.setdefault((dow, ts.hour), []).append(v)
        meta[i] = (dow, ts.hour, v)
    for i, (dow, hr, v) in meta.items():
        base = round(sum(cells[(dow, hr)]) / len(cells[(dow, hr)]), 6)
        assert got[i][0] == dow and got[i][1] == hr
        assert got[i][2] == base
        assert got[i][3] == round(v - base, 6)
