"""Round-5 fourth-wave invariants: label propagation separates bridged
cliques (where connected components cannot), trailing-median robustness
to spikes, sweep-line concurrency on crafted intervals, CUSUM localizing
a constructed mean shift, and seasonal-baseline residual identities.
"""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import Row, Window, functions as F

from weather_api_automate_etl_spark.operators import graph


# ---------------------------------------------------------------------------
# label propagation
# ---------------------------------------------------------------------------


def _clique_edges(nodes):
    return [
        Row(id_a=a, id_b=b)
        for i, a in enumerate(nodes)
        for b in nodes[i + 1 :]
    ]


def test_lpa_separates_bridged_cliques(spark):
    # two 4-cliques joined by ONE bridge edge: connected components says
    # "one component"; LPA must give each clique its own label
    edges = (
        _clique_edges([1, 2, 3, 4])
        + _clique_edges([10, 11, 12, 13])
        + [Row(id_a=4, id_b=10)]
    )
    out = {
        r["doc_id"]: r["label"]
        for r in graph.label_propagation(
            spark.createDataFrame(edges), rounds=2
        ).collect()
    }
    left = {out[n] for n in (1, 2, 3)}
    right = {out[n] for n in (11, 12, 13)}
    assert len(left) == 1 and len(right) == 1
    assert left != right, "bridged cliques must keep distinct communities"


def test_lpa_deterministic_tie_rule(spark):
    # a single edge: each node's only neighbour label is the other node,
    # so after round 1 labels SWAP; after round 2 they swap back — the
    # fixed-round synchronous semantics, not a converged fixpoint
    edges = spark.createDataFrame([Row(id_a=1, id_b=2)])
    r1 = {
        r["doc_id"]: r["label"]
        for r in graph.label_propagation(edges, rounds=1).collect()
    }
    assert r1 == {1: 2, 2: 1}
    r2 = {
        r["doc_id"]: r["label"]
        for r in graph.label_propagation(edges, rounds=2).collect()
    }
    assert r2 == {1: 1, 2: 2}


def test_lpa_rejects_bad_rounds(spark):
    edges = spark.createDataFrame([Row(id_a=1, id_b=2)])
    with pytest.raises(ValueError, match="rounds"):
        graph.label_propagation(edges, rounds=0)


# ---------------------------------------------------------------------------
# trailing median: spike robustness (vs the EWMA it complements)
# ---------------------------------------------------------------------------


def test_trailing_median_shrugs_off_spike(spark):
    base = dt.datetime(2024, 1, 1)
    vals = [10.0] * 10
    vals[5] = 1000.0  # one wild spike
    df = spark.createDataFrame(
        [
            Row(event_id=i, user_id=1, ts=base + dt.timedelta(minutes=i), value=v)
            for i, v in enumerate(vals)
        ]
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts"), F.col("event_id"))
        .rowsBetween(-7, 0)
    )
    arr = F.array_sort(F.collect_list("value").over(w))
    n = F.size(arr)
    lo = F.element_at(arr, (n / 2).cast("int"))
    hi = F.element_at(arr, (n / 2).cast("int") + 1)
    med = F.when(
        n % 2 == 1, F.element_at(arr, ((n + 1) / 2).cast("int"))
    ).otherwise(lo + (hi - lo) * F.lit(0.5))
    out = {r["event_id"]: r["m"] for r in df.select("event_id", med.alias("m")).collect()}
    # the spike row itself and every later row still report the inlier level
    for i in range(len(vals)):
        assert out[i] == 10.0, f"median at {i} dragged by the spike: {out[i]}"


# ---------------------------------------------------------------------------
# sweep-line concurrency on crafted intervals
# ---------------------------------------------------------------------------


def test_concurrency_counts_known_overlap(spark):
    base = dt.datetime(2024, 1, 1)
    # type A: three intervals of 60s starting 0s/30s/45s apart -> peak 3;
    # type B: two back-to-back (touching) 60s intervals -> peak 2 under
    # the starts-before-ends tie rule
    rows = [
        Row(event_id=1, event_type="A", ts=base, value=60.0),
        Row(event_id=2, event_type="A", ts=base + dt.timedelta(seconds=30), value=60.0),
        Row(event_id=3, event_type="A", ts=base + dt.timedelta(seconds=45), value=60.0),
        Row(event_id=4, event_type="B", ts=base, value=60.0),
        Row(event_id=5, event_type="B", ts=base + dt.timedelta(seconds=60), value=60.0),
    ]
    iv = spark.createDataFrame(rows).select(
        "event_id",
        "event_type",
        F.col("ts").alias("s"),
        (
            F.col("ts")
            + F.expr("make_dt_interval(0, 0, 0, greatest(1.0, floor(value)))")
        ).alias("e"),
    )
    pts = iv.select(
        "event_type", F.col("s").alias("t"), F.lit(1).alias("delta")
    ).unionAll(
        iv.select("event_type", F.col("e").alias("t"), F.lit(-1).alias("delta"))
    )
    w = Window.partitionBy("event_type").orderBy(
        F.col("t").asc(), F.col("delta").desc()
    )
    peak = {
        r["event_type"]: r["peak"]
        for r in pts.select("event_type", F.sum("delta").over(w).alias("load"))
        .groupBy("event_type")
        .agg(F.max("load").alias("peak"))
        .collect()
    }
    assert peak == {"A": 3, "B": 2}


# ---------------------------------------------------------------------------
# CUSUM localizes a constructed mean shift
# ---------------------------------------------------------------------------


def test_cusum_finds_constructed_shift(spark):
    base = dt.datetime(2024, 1, 1)
    # 30 points at level 0, then 30 at level 5: |CUSUM| of standardized
    # residuals peaks exactly at the last pre-shift point
    rows = [
        Row(event_id=i, event_type="t",
            ts=base + dt.timedelta(minutes=i),
            value=0.0 if i < 30 else 5.0)
        for i in range(60)
    ]
    ev = spark.createDataFrame(rows)
    s = ev.groupBy("event_type").agg(
        F.round(F.avg("value"), 6).alias("mu"),
        F.round(F.stddev_samp("value"), 6).alias("sd"),
    )
    wsum = (
        Window.partitionBy("event_type")
        .orderBy(F.col("ts"), F.col("event_id"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    c = ev.join(F.broadcast(s), "event_type").select(
        "event_id",
        F.round(
            F.sum(
                (F.col("value") - F.col("mu")) / F.when(F.col("sd") != 0, F.col("sd"))
            ).over(wsum),
            6,
        ).alias("cusum"),
    )
    peak = (
        c.orderBy(F.abs(F.col("cusum")).desc(), F.col("event_id").asc())
        .select("event_id")
        .head()[0]
    )
    assert peak == 29, f"CUSUM peak at {peak}, expected the last pre-shift point"


# ---------------------------------------------------------------------------
# wave 5: fuzzy match, freshness, skew profile, cumulative distinct
# ---------------------------------------------------------------------------


def test_fuzzy_match_blocks_and_threshold(spark):
    df = spark.createDataFrame(
        [
            Row(p_partkey=1, p_brand="A", p_name="goldenrod lace"),
            Row(p_partkey=2, p_brand="A", p_name="goldenrod lacy"),   # dist 1
            Row(p_partkey=3, p_brand="A", p_name="completely different thing"),
            Row(p_partkey=4, p_brand="B", p_name="goldenrod lace"),   # other block
        ]
    )
    a = df.select(F.col("p_partkey").alias("p1"), "p_brand",
                  F.col("p_name").alias("name_a"))
    b = df.select(F.col("p_partkey").alias("p2"), "p_brand",
                  F.col("p_name").alias("name_b"))
    dist = F.levenshtein("name_a", "name_b")
    pairs = (
        a.join(b, "p_brand")
        .filter(F.col("p1") < F.col("p2"))
        .filter(dist <= 10)
        .select("p1", "p2", dist.alias("d"))
        .collect()
    )
    assert [(r["p1"], r["p2"], r["d"]) for r in pairs] == [(1, 2, 1)], (
        "only the near-identical same-block pair may match: "
        "cross-block twins and far names must be excluded"
    )


def test_cumulative_distinct_hand_case(spark):
    base = dt.datetime(2024, 1, 1)
    seq = ["a", "b", "a", "c", "b", "d"]
    df = spark.createDataFrame(
        [
            Row(event_id=i, user_id=1, event_type=e,
                ts=base + dt.timedelta(minutes=i))
            for i, e in enumerate(seq)
        ]
    )
    wf = Window.partitionBy("user_id", "event_type").orderBy(
        F.col("ts"), F.col("event_id")
    )
    ws = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts"), F.col("event_id"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    out = {
        r["event_id"]: r["n"]
        for r in df.select(
            "event_id",
            F.sum(
                F.when(F.row_number().over(wf) == 1, 1).otherwise(0)
            ).over(ws).alias("n"),
        ).collect()
    }
    assert [out[i] for i in range(6)] == [1, 2, 2, 3, 3, 4]


def test_skew_profile_flags_known_hot_key(spark):
    rows = [Row(event_id=i, user_id=99) for i in range(80)] + [
        Row(event_id=100 + i, user_id=i % 10) for i in range(20)
    ]
    df = spark.createDataFrame(rows)
    c = df.groupBy("user_id").agg(F.count(F.lit(1)).alias("cnt"))
    tot = c.agg(F.sum("cnt").cast("double").alias("total"),
                F.expr("percentile(cnt, 0.5)").alias("med"))
    w = Window.orderBy(F.col("cnt").desc(), F.col("user_id").asc())
    top = (
        c.crossJoin(F.broadcast(tot))
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") == 1)
        .head()
    )
    assert top["user_id"] == 99
    assert top["cnt"] == 80
    assert top["cnt"] / top["total"] == 0.8
    assert top["cnt"] / top["med"] == 40.0  # hot key is 40x the median key
