"""Wave-45/46 operator tests: Kruskal-Wallis, time-decay attribution,
and the LSH recall audit."""

from __future__ import annotations

import datetime as dt
import math

import pytest

from pyspark.sql import functions as F

from weather_api_automate_etl_spark.operators import dedup, stats


# ---------------------------------------------------------------------------
# Kruskal-Wallis
# ---------------------------------------------------------------------------


def _kw(spark, rows):
    df = spark.createDataFrame(rows, "v double, g string")
    return {
        r["g"]: r for r in stats.kruskal_wallis(df, "v", "g").collect()
    }


def test_kw_matches_hand_computed_no_ties(spark):
    # groups a={1,2}, b={3,4}: ranks 1..4, R_a=3, R_b=7, N=4
    rows = [(1.0, "a"), (2.0, "a"), (3.0, "b"), (4.0, "b")]
    got = _kw(spark, rows)
    want_h = 12.0 / (4 * 5) * (9 / 2 + 49 / 2) - 3 * 5
    assert got["a"]["rank_sum"] == 3.0 and got["b"]["rank_sum"] == 7.0
    assert got["a"]["h_stat"] == pytest.approx(want_h, abs=1e-6)
    assert got["a"]["dof"] == 1
    assert got["a"]["mean_rank"] == pytest.approx(1.5)


def test_kw_tie_correction_applied(spark):
    # all four values tied across two groups → correction = 0 → NULL H
    rows = [(5.0, "a"), (5.0, "a"), (5.0, "b"), (5.0, "b")]
    got = _kw(spark, rows)
    assert got["a"]["h_stat"] is None
    # average rank of the single tied value is (4+1)/2 = 2.5
    assert got["a"]["rank_sum"] == 5.0


def test_kw_partial_ties_average_ranks(spark):
    # values 1, 2, 2, 3: avg rank of the 2s is 2.5
    rows = [(1.0, "a"), (2.0, "a"), (2.0, "b"), (3.0, "b")]
    got = _kw(spark, rows)
    assert got["a"]["rank_sum"] == pytest.approx(1 + 2.5)
    assert got["b"]["rank_sum"] == pytest.approx(2.5 + 4)
    assert got["a"]["h_stat"] is not None


def test_kw_single_group_yields_null_h(spark):
    got = _kw(spark, [(1.0, "a"), (2.0, "a")])
    assert got["a"]["h_stat"] is None and got["a"]["dof"] == 0


def test_kw_nulls_excluded(spark):
    rows = [(1.0, "a"), (None, "a"), (2.0, None), (3.0, "b")]
    got = _kw(spark, rows)
    assert got["a"]["n"] == 1 and got["b"]["n"] == 1
    assert set(got) == {"a", "b"}


# ---------------------------------------------------------------------------
# time-decay attribution
# ---------------------------------------------------------------------------


def _events(spark, rows):
    return spark.createDataFrame(
        [(u, ty, dt.datetime(2024, 1, d, h), i)
         for i, (u, ty, d, h) in enumerate(rows)],
        "user_id long, event_type string, ts timestamp, event_id long",
    )


def _decay(spark, rows, **kw):
    df = _events(spark, rows)
    out = stats.time_decay_attribution(
        df, "user_id", "event_type", "ts", "event_id", "purchase",
        ("view", "click"), **kw,
    )
    return {r["channel"]: r for r in out.collect()}


def test_decay_weights_recent_touch_more(spark):
    # view 4 days before, click 1 day before the purchase (half-life 2d):
    # w_view = 2^-2 = 0.25, w_click = 2^-0.5
    rows = [(1, "view", 1, 0), (1, "click", 4, 0), (1, "purchase", 5, 0)]
    got = _decay(spark, rows, half_life_days=2.0)
    wv, wc = 0.25, 2 ** -0.5
    assert got["click"]["credit"] == pytest.approx(wc / (wv + wc), abs=1e-6)
    assert got["view"]["credit"] == pytest.approx(wv / (wv + wc), abs=1e-6)


def test_decay_total_credit_equals_conversions(spark):
    rows = [(1, "view", 1, 0), (1, "purchase", 2, 0),
            (2, "purchase", 3, 0),            # no touches → (direct)
            (3, "click", 2, 0), (3, "view", 2, 6), (3, "purchase", 2, 12)]
    got = _decay(spark, rows)
    assert sum(r["credit"] for r in got.values()) == pytest.approx(3.0, abs=1e-5)
    assert got["(direct)"]["n_conversions"] == 1


def test_decay_window_excludes_old_touches(spark):
    rows = [(1, "view", 1, 0), (1, "purchase", 20, 0)]
    got = _decay(spark, rows, window_days=7)
    assert set(got) == {"(direct)"}


def test_decay_rejects_bad_half_life(spark):
    df = _events(spark, [(1, "purchase", 1, 0)])
    with pytest.raises(ValueError):
        stats.time_decay_attribution(
            df, "user_id", "event_type", "ts", "event_id", "purchase",
            ("view",), half_life_days=0.0,
        )


# ---------------------------------------------------------------------------
# LSH recall audit
# ---------------------------------------------------------------------------


def _audit(spark, texts, threshold=0.5):
    df = spark.createDataFrame(
        [(i, s) for i, s in enumerate(texts)], "doc_id long, text string"
    )
    return dedup.lsh_recall_audit(
        df, "doc_id", "text", threshold=threshold
    ).collect()[0]


def test_audit_exact_duplicates_always_caught(spark):
    texts = ["the quick brown fox jumps over the lazy dog"] * 2 + [
        "completely different words entirely here now folks",
    ]
    got = _audit(spark, texts)
    assert got["n_true"] == 1 and got["n_hit"] == 1
    assert got["recall"] == 1.0


def test_audit_counts_false_candidates_in_precision(spark):
    # identical pair plus an unrelated doc: candidates should not exceed
    # truth here, so precision = recall = 1
    texts = ["alpha beta gamma delta epsilon zeta", "alpha beta gamma delta epsilon zeta",
             "one two three four five six"]
    got = _audit(spark, texts)
    assert got["n_candidates"] >= got["n_hit"]
    assert got["precision"] is not None


def test_audit_no_true_pairs_gives_null_recall(spark):
    texts = ["aa bb cc dd ee", "ff gg hh ii jj", "kk ll mm nn oo"]
    got = _audit(spark, texts, threshold=0.9)
    assert got["n_true"] == 0 and got["recall"] is None
    assert math.isclose(got["threshold"], 0.9)
