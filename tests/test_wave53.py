"""Wave-53 operator tests: Youden cutoff and gains table."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from weather_api_automate_etl_spark.operators import stats


def _youden(spark, rows):
    df = spark.createDataFrame(rows, "s double, y int")
    return stats.youden_optimal_cutoff(df, "s", F.col("y") == 1).collect()


def test_youden_perfect_separation_picks_boundary(spark):
    rows = [(0.1, 0), (0.2, 0), (0.8, 1), (0.9, 1)]
    got = _youden(spark, rows)
    assert len(got) == 1
    r = got[0]
    # predicting positive at s >= 0.8 gives tpr 1, fpr 0
    assert r["threshold"] == 0.8
    assert r["youden_j"] == 1.0 and r["tpr"] == 1.0 and r["fpr"] == 0.0


def test_youden_matches_brute_force(spark):
    rows = [(0.1, 0), (0.3, 1), (0.3, 0), (0.5, 0), (0.7, 1), (0.9, 1),
            (0.2, 0), (0.6, 1)]
    got = _youden(spark, rows)[0]
    pos = [s for s, y in rows if y]
    neg = [s for s, y in rows if not y]
    best = max(
        sorted({s for s, _ in rows}),
        key=lambda c: (
            sum(p >= c for p in pos) / len(pos)
            - sum(n >= c for n in neg) / len(neg),
            -c,
        ),
    )
    assert got["threshold"] == best


def test_youden_tie_breaks_to_lower_threshold(spark):
    # two thresholds reach the same J: 0.5 and 0.7 both classify
    # perfectly here (no scores between them)
    rows = [(0.1, 0), (0.7, 1)]
    got = _youden(spark, rows)[0]
    assert got["threshold"] == 0.7 or got["youden_j"] == 1.0


def test_youden_single_class_empty(spark):
    assert _youden(spark, [(0.5, 1), (0.6, 1)]) == []


def _gains(spark, rows, n_buckets=2):
    df = spark.createDataFrame(rows, "s double, y int, i long")
    out = stats.gains_table(
        df, "s", F.col("y") == 1, n_buckets=n_buckets, order_cols=["i"]
    )
    return sorted(out.collect(), key=lambda r: r["bucket"])


def test_gains_concentrated_responders(spark):
    # responders all have the highest scores → bucket 1 captures all
    rows = [(0.9, 1, 1), (0.8, 1, 2), (0.2, 0, 3), (0.1, 0, 4)]
    got = _gains(spark, rows)
    assert got[0]["responders"] == 2 and got[1]["responders"] == 0
    assert got[0]["cum_gain"] == 1.0
    assert got[0]["lift"] == pytest.approx(2.0)  # 1.0 rate vs 0.5 base


def test_gains_cum_gain_monotone_to_one(spark):
    rows = [(float(i) / 10, i % 3 == 0, i) for i in range(20)]
    rows = [(s, int(y), i) for s, y, i in rows]
    got = _gains(spark, rows, n_buckets=4)
    gains = [r["cum_gain"] for r in got]
    assert gains == sorted(gains)
    assert gains[-1] == 1.0
    assert sum(r["n"] for r in got) == 20


def test_gains_no_responders_null_lift(spark):
    rows = [(0.5, 0, 1), (0.6, 0, 2), (0.7, 0, 3), (0.8, 0, 4)]
    got = _gains(spark, rows)
    assert all(r["lift"] is None and r["cum_gain"] is None for r in got)


def test_gains_rejects_single_bucket(spark):
    df = spark.createDataFrame([(0.5, 1, 1)], "s double, y int, i long")
    with pytest.raises(ValueError):
        stats.gains_table(df, "s", F.col("y") == 1, n_buckets=1)
