"""Wave-32 operator tests: TextRank keywords and paired t-test."""

from __future__ import annotations

import math

import pytest

from weather_api_automate_etl_spark.operators import stats, textops


# ---------------------------------------------------------------------------
# TextRank
# ---------------------------------------------------------------------------


def _tr(spark, texts, **kw):
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    return textops.textrank_keywords(df, "text", **kw).collect()


def test_textrank_hub_word_wins(spark):
    """'data' co-occurs with every other word; the star center must
    out-rank the leaves."""
    texts = ["data quality", "data lineage", "data warehouse",
             "data platform", "quality warehouse"]
    rows = _tr(spark, texts, top=10)
    assert rows[0]["word"] == "data"
    assert rows[0]["rank_n"] > rows[-1]["rank_n"]


def test_textrank_filters_short_and_nonalpha_tokens(spark):
    texts = ["big data 123 ai x9y", "big data"]
    words = {r["word"] for r in _tr(spark, texts, top=10)}
    # 'big'/'ai'/'123'/'x9y' fail the length/alpha filter
    assert "data" in words
    assert words.isdisjoint({"big", "ai", "123", "x9y"})


def test_textrank_isolated_words_get_teleport_rank(spark):
    """A document with a single surviving word contributes an isolated
    node: present in output with a positive (teleport-only) rank."""
    texts = ["solitary", "alpha beta", "alpha beta"]
    got = {r["word"]: r["rank_n"] for r in _tr(spark, texts, top=10)}
    assert got["solitary"] > 0
    assert got["alpha"] > got["solitary"]


def test_textrank_top_cut_is_deterministic(spark):
    """Symmetric square a-b-c-d-a: all four words tie; the cut orders
    ties by word."""
    texts = ["aaaa bbbb", "bbbb cccc", "cccc dddd", "dddd aaaa"]
    rows = _tr(spark, texts, top=3)
    assert [r["word"] for r in rows] == ["aaaa", "bbbb", "cccc"]
    assert len({r["rank_n"] for r in rows}) == 1


# ---------------------------------------------------------------------------
# paired t-test
# ---------------------------------------------------------------------------


def _pt(spark, rows):
    df = spark.createDataFrame(rows, "g string, x int, y int")
    return {
        r["g"]: r for r in stats.paired_t_test(df, "g", "x", "y").collect()
    }


def test_paired_t_hand_computed(spark):
    """diffs [1, 2, 3, 6]: mean 3, var (1+4+9+36-36)/3 = 14/3."""
    rows = [("g", 2, 1), ("g", 3, 1), ("g", 4, 1), ("g", 7, 1)]
    r = _pt(spark, rows)["g"]
    assert r["n"] == 4 and r["mean_d"] == pytest.approx(3.0)
    var = 14 / 3
    assert r["sd_d"] == pytest.approx(math.sqrt(var), abs=1e-6)
    assert r["t"] == pytest.approx(3.0 / (math.sqrt(var) / 2), abs=1e-6)


def test_paired_t_zero_mean_symmetric(spark):
    rows = [("g", 1, 0), ("g", 0, 1), ("g", 2, 0), ("g", 0, 2)]
    r = _pt(spark, rows)["g"]
    assert r["mean_d"] == pytest.approx(0.0)
    assert r["t"] == pytest.approx(0.0, abs=1e-9)


def test_paired_t_constant_diffs_null_t(spark):
    """All differences identical: zero variance, t undefined (NULL),
    mean still reported — the wilcoxon-twin's degenerate case."""
    rows = [("g", 5, 2), ("g", 6, 3), ("g", 7, 4)]
    r = _pt(spark, rows)["g"]
    assert r["mean_d"] == pytest.approx(3.0)
    assert r["sd_d"] is None and r["t"] is None


def test_paired_t_agrees_with_wilcoxon_direction(spark):
    """Strong positive shift: both the parametric t and the signed-rank
    z must be large and positive on the same pairs."""
    rows = [("g", i + 4 + (i % 3), i) for i in range(1, 12)]
    r = _pt(spark, rows)["g"]
    wdf = spark.createDataFrame(rows, "g string, x int, y int")
    (w,) = stats.wilcoxon_signed_rank(wdf, "g", "x", "y").collect()
    assert r["t"] is not None and r["t"] > 10
    assert w["z"] > 2.5


def test_paired_t_survives_int64_scale_diffs(spark):
    """Σd² must not wrap int64 when per-pair differences reach 4e9
    (d² ≈ 1.6e19 > 2^63−1 in one pair — the anova/cuped discipline)."""
    from fractions import Fraction as Fr

    ds = [0, 4_000_000_000, 1_000_000_000, 3_000_000_000, 2_000_000_000]
    rows = [("g", d, 0) for d in ds]
    df = spark.createDataFrame(rows, "g string, x long, y long")
    got = stats.paired_t_test(df, "g", "x", "y").collect()[0]
    n = len(ds)
    mean = Fr(sum(ds), n)
    var = (sum(Fr(d) ** 2 for d in ds) - Fr(sum(ds)) ** 2 / n) / (n - 1)
    t = float(mean) / math.sqrt(float(var) / n)
    assert got["mean_d"] == pytest.approx(float(mean), rel=1e-9)
    assert got["t"] == pytest.approx(t, rel=1e-6)
