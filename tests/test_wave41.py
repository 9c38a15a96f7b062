"""Wave-41 operator tests: ROC AUC and PR threshold sweep."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from weather_api_automate_etl_spark.operators import stats


def _auc(spark, rows):
    df = spark.createDataFrame(rows, "s double, y int")
    return stats.roc_auc(df, "s", F.col("y") == 1).collect()[0]


def test_auc_perfect_separation(spark):
    rows = [(0.1, 0), (0.2, 0), (0.8, 1), (0.9, 1)]
    got = _auc(spark, rows)
    assert got["auc"] == 1.0 and got["gini"] == 1.0
    assert got["n_pos"] == 2 and got["n_neg"] == 2


def test_auc_reversed_scores_is_zero(spark):
    rows = [(0.9, 0), (0.8, 0), (0.2, 1), (0.1, 1)]
    assert _auc(spark, rows)["auc"] == 0.0


def test_auc_ties_get_half_credit(spark):
    # one positive and one negative share a score: AUC = 0.5 exactly
    rows = [(0.5, 0), (0.5, 1)]
    got = _auc(spark, rows)
    assert got["auc"] == 0.5 and got["n_scores"] == 1


def test_auc_matches_pairwise_definition(spark):
    # brute-force P(s+ > s-) + 0.5 P(s+ = s-) on a small mixed sample
    rows = [(0.1, 0), (0.4, 1), (0.4, 0), (0.6, 1), (0.2, 0), (0.9, 1),
            (0.6, 0), (0.3, 0)]
    pos = [s for s, y in rows if y == 1]
    neg = [s for s, y in rows if y == 0]
    want = sum(
        1.0 if p > n else 0.5 if p == n else 0.0 for p in pos for n in neg
    ) / (len(pos) * len(neg))
    assert _auc(spark, rows)["auc"] == pytest.approx(want, abs=1e-6)


def test_auc_degenerate_single_class_is_null(spark):
    got = _auc(spark, [(0.3, 1), (0.7, 1)])
    assert got["auc"] is None and got["gini"] is None


def _sweep(spark, rows, thr):
    df = spark.createDataFrame(rows, "s double, y int")
    out = stats.pr_threshold_sweep(df, "s", F.col("y") == 1, thr)
    return {r["threshold"]: r for r in out.collect()}


def test_pr_sweep_counts_and_f1(spark):
    rows = [(0.1, 0), (0.4, 1), (0.6, 0), (0.9, 1)]
    got = _sweep(spark, rows, [0.5])
    r = got[0.5]
    assert r["tp"] == 1 and r["pred_pos"] == 2 and r["n_pos"] == 2
    assert r["precision"] == 0.5 and r["recall"] == 0.5
    assert r["f1"] == pytest.approx(0.5)


def test_pr_sweep_zero_denominators_yield_null(spark):
    # threshold above every score: no predicted positives
    got = _sweep(spark, [(0.1, 0), (0.2, 1)], [0.9])
    r = got[0.9]
    assert r["pred_pos"] == 0 and r["tp"] == 0
    assert r["precision"] is None and r["f1"] is None
    # no actual positives: recall undefined
    got2 = _sweep(spark, [(0.5, 0), (0.6, 0)], [0.4])
    assert got2[0.4]["recall"] is None


def test_pr_sweep_grid_order_and_monotone_pred_pos(spark):
    rows = [(float(i) / 10, i % 2) for i in range(10)]
    got = _sweep(spark, rows, [0.2, 0.5, 0.8])
    pp = [got[th]["pred_pos"] for th in (0.2, 0.5, 0.8)]
    assert pp == sorted(pp, reverse=True)


def test_pr_sweep_empty_grid_rejected(spark):
    df = spark.createDataFrame([(0.5, 1)], "s double, y int")
    with pytest.raises(ValueError):
        stats.pr_threshold_sweep(df, "s", F.col("y") == 1, [])


def test_auc_null_scores_and_labels_dropped(spark):
    """Round-9 advice: NULL scores must not form their own score group
    (Spark orders NULLS FIRST, DuckDB LAST — a silent engine/oracle
    divergence). The operator drops NULL score/label rows up front, so
    a NULL-bearing input must equal the pre-filtered input exactly."""
    clean = [(0.1, 0), (0.4, 1), (0.6, 0), (0.9, 1), (0.4, 0)]
    dirty = clean + [(None, 1), (None, 0), (0.5, None), (None, None)]
    df_clean = spark.createDataFrame(clean, "s double, y int")
    df_dirty = spark.createDataFrame(dirty, "s double, y int")
    want = stats.roc_auc(df_clean, "s", F.col("y") == 1).collect()[0]
    got = stats.roc_auc(df_dirty, "s", F.col("y") == 1).collect()[0]
    assert got == want
    # same contract for the sibling evaluators named in the advice
    w = stats.youden_optimal_cutoff(df_clean, "s", F.col("y") == 1).collect()
    g = stats.youden_optimal_cutoff(df_dirty, "s", F.col("y") == 1).collect()
    assert g == w
    w = stats.pr_threshold_sweep(df_clean, "s", F.col("y") == 1, [0.5]).collect()
    g = stats.pr_threshold_sweep(df_dirty, "s", F.col("y") == 1, [0.5]).collect()
    assert g == w
    w = stats.brier_decomposition(df_clean, "s", F.col("y") == 1).collect()
    g = stats.brier_decomposition(df_dirty, "s", F.col("y") == 1).collect()
    assert sorted(map(tuple, g)) == sorted(map(tuple, w))


def test_evaluators_accept_string_label_args(spark):
    """Round-9 advice: label-like args must accept column NAMES exactly
    like score_col does (as_col), not raise AttributeError."""
    df = spark.createDataFrame(
        [(0.2, 0, 1, 1), (0.8, 1, 1, 0), (0.5, 1, 0, 1), (0.3, 0, 0, 0)],
        "s double, y int, a int, b int",
    )
    assert stats.roc_auc(df, "s", "y").collect()[0]["n"] == 4
    assert stats.youden_optimal_cutoff(df, "s", "y").count() == 1
    assert stats.pr_threshold_sweep(df, "s", "y", [0.5]).count() == 1
    assert stats.brier_decomposition(df, "s", "y", n_bins=2).count() >= 1
    assert stats.mcnemar_test(df, "y", "a", "b").collect()[0]["n"] == 4
    assert stats.cohens_kappa(df, "a", "b").collect()[0]["n"] == 4
    assert stats.gains_table(
        df, "s", "y", n_buckets=2, order_cols=()
    ).count() == 2


def test_auc_concordance_survives_large_counts(spark):
    """Round-9 advice: the 2x concordance numerator accumulates as
    decimal(38,0) — with per-score counts in the billions the exact sum
    passes 2^63 and must NOT wrap. Simulate by pre-aggregated inflation:
    many rows per distinct score via explode, then check AUC is exact on
    a configuration whose true AUC is known (perfect separation)."""
    # 3 distinct scores, ~200k rows each side (small enough to run, but
    # the decimal path is the same expression that carries 1e9-row
    # groups; int64 wrap is pinned arithmetically below)
    df = (
        spark.range(0, 200_000)
        .selectExpr("0.2 as s", "0 as y")
        .union(spark.range(0, 200_000).selectExpr("0.9 as s", "1 as y"))
    )
    got = stats.roc_auc(df, "s", F.col("y") == 1).collect()[0]
    assert got["auc"] == 1.0
    assert got["n_pos"] == 200_000 and got["n_neg"] == 200_000
    # arithmetic pin: the decimal expression's value for 3e9-per-class
    # (P*N = 9e18 > int64 max 9.22e18 would survive; 2*P*N would not)
    p = n = 3_000_000_000
    assert 2 * p * n > 2**63 - 1  # the wrap the decimal(38,0) cast avoids
