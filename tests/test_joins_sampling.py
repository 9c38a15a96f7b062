"""As-of join, broadcast range join, and deterministic sampling operators."""

from __future__ import annotations

import pytest

import datetime as dt

from pyspark.sql import functions as F

from weather_api_automate_etl_spark.operators import joins, sampling

TS = dt.datetime


def _trades_quotes(spark):
    trades = spark.createDataFrame(
        [
            (1, "A", TS(2024, 1, 1, 10, 0, 0)),
            (2, "A", TS(2024, 1, 1, 10, 5, 0)),
            (3, "B", TS(2024, 1, 1, 9, 0, 0)),
            (4, "C", TS(2024, 1, 1, 12, 0, 0)),
        ],
        "trade_id long, sym string, ts timestamp",
    )
    quotes = spark.createDataFrame(
        [
            ("A", TS(2024, 1, 1, 9, 59, 0), 10.0),
            ("A", TS(2024, 1, 1, 10, 5, 0), 11.0),
            ("A", TS(2024, 1, 1, 10, 6, 0), 12.0),
            ("B", TS(2024, 1, 1, 9, 30, 0), 20.0),
        ],
        "sym string, qts timestamp, px double",
    )
    return trades, quotes


def test_asof_join_backward_inclusive(spark):
    trades, quotes = _trades_quotes(spark)
    out = joins.asof_join(
        trades, quotes, key="sym", left_ts="ts", right_ts="qts",
        payload_cols=["qts", "px"],
    )
    rows = {r.trade_id: (r.qts, r.px) for r in out.collect()}
    assert rows[1] == (TS(2024, 1, 1, 9, 59, 0), 10.0)
    # equal timestamps match when inclusive
    assert rows[2] == (TS(2024, 1, 1, 10, 5, 0), 11.0)
    # quote is after the trade -> left-join null
    assert rows[3] == (None, None)
    # symbol never quoted -> null
    assert rows[4] == (None, None)
    assert out.count() == 4


def test_asof_join_exclusive_skips_equal_ts(spark):
    trades, quotes = _trades_quotes(spark)
    out = joins.asof_join(
        trades, quotes, key="sym", left_ts="ts", right_ts="qts",
        payload_cols=["px"], inclusive=False,
    )
    rows = {r.trade_id: r.px for r in out.collect()}
    assert rows[2] == 10.0  # 10:05 quote excluded, falls back to 09:59


def test_asof_join_single_shuffle(spark):
    trades, quotes = _trades_quotes(spark)
    out = joins.asof_join(
        trades, quotes, key="sym", left_ts="ts", right_ts="qts",
        payload_cols=["px"],
    )
    plan = out._sc._jvm.PythonSQLUtils.explainString(
        out._jdf.queryExecution(), "formatted"
    )
    # union-merge strategy: exactly one Exchange (on the key), no join node
    assert plan.count(") Exchange") == 1 and "hashpartitioning(__k" in plan
    assert "Join" not in plan and "CartesianProduct" not in plan


def test_range_join_small_broadcasts(spark):
    facts = spark.range(100).select(F.col("id").cast("double").alias("v"))
    ranges = spark.createDataFrame(
        [("lo", 0.0, 50.0), ("hi", 50.0, 100.0)], "tier string, lo double, hi double"
    )
    out = joins.range_join_small(facts, ranges, "v")
    assert "BroadcastNestedLoopJoin" in out._jdf.queryExecution().executedPlan().toString()
    tiers = {r.tier: 1 for r in out.collect()}
    assert out.count() == 100 and set(tiers) == {"lo", "hi"}


def test_deterministic_sample_stable_across_partitioning(spark):
    df = spark.range(1000).withColumnRenamed("id", "k")
    a = sorted(r.k for r in sampling.deterministic_sample(df, "k", 0.3).collect())
    b = sorted(
        r.k
        for r in sampling.deterministic_sample(df.repartition(7), "k", 0.3).collect()
    )
    assert a == b and 200 < len(a) < 400


def test_stratified_sample_rates_and_unlisted_strata_dropped(spark):
    df = spark.range(2000).select(
        F.col("id").alias("k"),
        F.when(F.col("id") % 3 == 0, "a").when(F.col("id") % 3 == 1, "b")
         .otherwise("c").alias("g"),
    )
    out = sampling.stratified_sample(df, "g", {"a": 1.0, "b": 0.2}, "k")
    counts = {r.g: r.n for r in out.groupBy("g").agg(F.count("*").alias("n")).collect()}
    assert counts["a"] == 667          # rate 1.0 keeps every row
    assert 70 < counts["b"] < 200      # ~133 expected
    assert "c" not in counts           # unlisted stratum dropped
    # pure filter: no shuffle at all
    plan = out._sc._jvm.PythonSQLUtils.explainString(
        out._jdf.queryExecution(), "formatted"
    )
    assert "Exchange" not in plan


def test_interval_join_binned_matches_naive(spark):
    # intervals spanning multiple hourly bins, points on boundaries
    intervals = spark.createDataFrame(
        [
            (1, 10, TS(2024, 1, 1, 9, 0, 0), TS(2024, 1, 1, 12, 30, 0)),
            (1, 11, TS(2024, 1, 1, 14, 0, 0), TS(2024, 1, 1, 14, 10, 0)),
            (2, 20, TS(2024, 1, 1, 9, 0, 0), TS(2024, 1, 1, 23, 0, 0)),
        ],
        "user_id long, iv_id long, lo timestamp, hi timestamp",
    )
    points = spark.createDataFrame(
        [
            (100, 1, TS(2024, 1, 1, 9, 0, 0)),     # lo boundary inclusive
            (101, 1, TS(2024, 1, 1, 12, 30, 0)),   # hi boundary inclusive
            (102, 1, TS(2024, 1, 1, 13, 0, 0)),    # in no interval
            (103, 2, TS(2024, 1, 1, 14, 5, 0)),    # other user's interval only
        ],
        "event_id long, user_id long, ts timestamp",
    )
    out = joins.interval_join_binned(
        points, intervals, key="user_id", ts_col="ts", lo_col="lo", hi_col="hi"
    )
    got = sorted((r.event_id, r.iv_id) for r in out.collect())
    assert got == [(100, 10), (101, 10), (103, 20)]
    # strategy check: an equi-join (bin keys), never a nested-loop/cartesian
    physical = out._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" not in physical and "Cartesian" not in physical


def test_asof_join_differential_vs_naive(spark):
    # seeded random data; naive = non-equi join + argmax, independent plan
    import random
    rng = random.Random(42)
    lefts = [(i, rng.randrange(5), TS(2024, 1, 1) + dt.timedelta(minutes=rng.randrange(1000)))
             for i in range(200)]
    right_keys = {(rng.randrange(5), TS(2024, 1, 1) + dt.timedelta(minutes=rng.randrange(1000)))
                  for _ in range(80)}
    rights = [(k, ts, float(i)) for i, (k, ts) in enumerate(sorted(right_keys))]
    left = spark.createDataFrame(lefts, "pk long, k long, ts timestamp")
    right = spark.createDataFrame(rights, "k long, rts timestamp, payload double")
    got = {
        r.pk: r.payload
        for r in joins.asof_join(
            left, right, key="k", left_ts="ts", right_ts="rts", payload_cols=["payload"]
        ).collect()
    }
    from pyspark.sql.window import Window
    w = Window.partitionBy("pk").orderBy(F.desc("rts"))
    naive = (
        left.join(right, (left.k == right.k) & (right.rts <= left.ts), "left")
        .withColumn("rn", F.row_number().over(w))
        .filter("rn = 1")
    )
    want = {r.pk: r.payload for r in naive.collect()}
    assert got == want and len(got) == 200


def test_interval_join_differential_vs_naive(spark):
    import random
    rng = random.Random(7)
    base = TS(2024, 1, 1)
    points = [(i, rng.randrange(4), base + dt.timedelta(minutes=rng.randrange(3000)))
              for i in range(300)]
    ivs = []
    for j in range(40):
        lo = base + dt.timedelta(minutes=rng.randrange(2800))
        ivs.append((j, rng.randrange(4), lo, lo + dt.timedelta(minutes=rng.randrange(1, 400))))
    p = spark.createDataFrame(points, "pid long, k long, ts timestamp")
    iv = spark.createDataFrame(ivs, "iv long, k long, lo timestamp, hi timestamp")
    got = sorted(
        (r.pid, r.iv)
        for r in joins.interval_join_binned(
            p, iv, key="k", ts_col="ts", lo_col="lo", hi_col="hi", bin_seconds=3600
        ).collect()
    )
    want = sorted(
        (r.pid, r.iv)
        for r in p.join(
            iv.withColumnRenamed("k", "k2"),
            (p.k == F.col("k2")) & (p.ts >= F.col("lo")) & (p.ts <= F.col("hi")),
        ).collect()
    )
    assert got == want and len(want) > 100


def test_snapshot_diff_classification(spark):
    from weather_api_automate_etl_spark.operators import cdc

    old = spark.createDataFrame(
        [(1, "a", 1.0), (2, "b", 2.0), (3, "c", 3.0), (4, None, 4.0)],
        "k long, s string, v double",
    )
    new = spark.createDataFrame(
        [(2, "b", 2.0), (3, "CHANGED", 3.0), (4, None, 4.0), (5, "e", 5.0)],
        "k long, s string, v double",
    )
    got = {
        r.k: r.change_type
        for r in cdc.snapshot_diff(old, new, "k", ["s", "v"]).collect()
    }
    assert got == {1: "removed", 2: "unchanged", 3: "changed",
                   4: "unchanged", 5: "added"}


def test_snapshot_diff_hash_is_boundary_and_null_safe(spark):
    """Per-column hashing kills two classes of false 'unchanged': values
    containing the old separator/sentinel control chars, and NULL→value
    transitions (NULL is distinct from every value, incl. the literal
    sentinel string)."""
    from weather_api_automate_etl_spark.operators import cdc

    old = spark.createDataFrame(
        [
            (1, "a\x1fb", "c"),        # boundary shift: ("a\x1fb","c") vs ("a","b\x1fc")
            (2, None, "x"),            # NULL -> value
            (3, "\x00", "x"),          # literal old null-sentinel vs NULL
            (4, "same", "same"),
        ],
        "k long, s string, v string",
    )
    new = spark.createDataFrame(
        [
            (1, "a", "b\x1fc"),
            (2, "was-null", "x"),
            (3, None, "x"),
            (4, "same", "same"),
        ],
        "k long, s string, v string",
    )
    got = {
        r.k: r.change_type
        for r in cdc.snapshot_diff(old, new, "k", ["s", "v"]).collect()
    }
    assert got == {1: "changed", 2: "changed", 3: "changed", 4: "unchanged"}


@pytest.mark.slow
def test_scd2_apply_two_batches(spark):
    import datetime as dt

    import pyspark.sql.functions as F

    from weather_api_automate_etl_spark.operators import cdc

    def ntz(s):
        return dt.datetime.fromisoformat(s)

    dim0 = spark.createDataFrame(
        [(1, "a", ntz("2024-01-01"), None), (2, "b", ntz("2024-01-01"), None)],
        "k long, v string, valid_from timestamp_ntz, valid_to timestamp_ntz",
    )
    # batch 1: k=1 changes, k=2 vanishes, k=3 appears
    up1 = spark.createDataFrame([(1, "a2"), (3, "c")], "k long, v string")
    dim1 = cdc.scd2_apply(dim0, up1, "k", ["v"], "2024-02-01")
    rows1 = {(r.k, r.v): (r.valid_from, r.valid_to) for r in dim1.collect()}
    assert rows1 == {
        (1, "a"): (ntz("2024-01-01"), ntz("2024-02-01")),
        (1, "a2"): (ntz("2024-02-01"), None),
        (2, "b"): (ntz("2024-01-01"), ntz("2024-02-01")),
        (3, "c"): (ntz("2024-02-01"), None),
    }
    # batch 2: k=2 re-appears, k=1/k=3 unchanged — history rows untouched
    up2 = spark.createDataFrame([(1, "a2"), (2, "b2"), (3, "c")], "k long, v string")
    dim2 = cdc.scd2_apply(dim1, up2, "k", ["v"], "2024-03-01")
    rows2 = {(r.k, r.v): (r.valid_from, r.valid_to) for r in dim2.collect()}
    assert rows2 == {
        (1, "a"): (ntz("2024-01-01"), ntz("2024-02-01")),
        (1, "a2"): (ntz("2024-02-01"), None),
        (2, "b"): (ntz("2024-01-01"), ntz("2024-02-01")),
        (2, "b2"): (ntz("2024-03-01"), None),
        (3, "c"): (ntz("2024-02-01"), None),
    }
    # exactly one current row per live key
    n_cur = dim2.filter(F.col("valid_to").isNull()).groupBy("k").count().collect()
    assert all(r["count"] == 1 for r in n_cur)


def test_weighted_reservoir_biases_toward_weight(spark):
    # weight 1000 vs 1: heavy rows should dominate the k=50 sample; the
    # sample must also be identical across repartitionings (determinism)
    from weather_api_automate_etl_spark.operators import sampling

    df = spark.range(1000).select(
        F.col("id").alias("k"),
        F.lit("s").alias("g"),
        F.when(F.col("id") < 100, 1000.0).otherwise(1.0).alias("w"),
    )
    got = sorted(r.k for r in sampling.weighted_reservoir(df, "g", "w", "k", 50).collect())
    again = sorted(
        r.k
        for r in sampling.weighted_reservoir(df.repartition(13), "g", "w", "k", 50).collect()
    )
    assert got == again and len(got) == 50
    heavy = sum(1 for k in got if k < 100)
    assert heavy > 40  # 100 heavy rows at 1000x weight dominate


# ---------------------------------------------------------------------------
# MERGE / upsert (operators/cdc.py::merge_into, merge_into_partitioned)
# ---------------------------------------------------------------------------


def test_merge_into_update_else_insert(spark):
    from weather_api_automate_etl_spark.operators import cdc

    mart = spark.createDataFrame(
        [(1, 10.0, "d1"), (2, 20.0, "d1"), (3, 30.0, "d2")],
        "k long, v double, p string",
    )
    updates = spark.createDataFrame(
        [(2, 99.0, "d1"), (4, 40.0, "d2")], "k long, v double, p string"
    )
    got = {
        r.k: (r.v, r.merge_action)
        for r in cdc.merge_into(mart, updates, "k", with_provenance=True).collect()
    }
    assert got == {
        1: (10.0, "carried"),
        2: (99.0, "updated"),
        3: (30.0, "carried"),
        4: (40.0, "inserted"),
    }
    # without provenance: same rows, no extra column
    plain = cdc.merge_into(mart, updates, "k")
    assert plain.columns == ["k", "v", "p"]
    assert {(r.k, r.v) for r in plain.collect()} == {
        (1, 10.0), (2, 99.0), (3, 30.0), (4, 40.0)
    }


def test_merge_into_partitioned_rewrites_only_touched_partition(spark, tmp_path):
    """A 1-partition update batch must rewrite exactly 1 partition: the
    untouched partition's data files stay byte-identical on disk (same
    names, sizes, mtimes) — the VERDICT r5 'production pattern at 100 TB'
    pin."""
    import os

    from weather_api_automate_etl_spark.operators import cdc

    path = str(tmp_path / "mart")
    mart = spark.createDataFrame(
        [(1, 10.0, "d1"), (2, 20.0, "d1"), (3, 30.0, "d2"), (4, 40.0, "d2")],
        "k long, v double, p string",
    )
    mart.write.partitionBy("p").parquet(path)

    def listing(part):
        d = os.path.join(path, f"p={part}")
        return sorted(
            (f, os.path.getsize(os.path.join(d, f)),
             os.path.getmtime(os.path.join(d, f)))
            for f in os.listdir(d)
            if f.endswith(".parquet")
        )

    before_d1, before_d2 = listing("d1"), listing("d2")
    updates = spark.createDataFrame(
        [(2, 99.0, "d1"), (9, 90.0, "d1")], "k long, v double, p string"
    )
    touched = cdc.merge_into_partitioned(spark, path, updates, "k", "p")
    assert touched == ["d1"]
    assert listing("d2") == before_d2, "untouched partition was rewritten"
    assert listing("d1") != before_d1
    got = {(r.k, r.v, r.p) for r in spark.read.parquet(path).collect()}
    assert got == {
        (1, 10.0, "d1"), (2, 99.0, "d1"), (9, 90.0, "d1"),
        (3, 30.0, "d2"), (4, 40.0, "d2"),
    }


def test_merge_into_partitioned_empty_batch_is_noop(spark, tmp_path):
    import os

    from weather_api_automate_etl_spark.operators import cdc

    path = str(tmp_path / "mart")
    spark.createDataFrame([(1, 1.0, "d1")], "k long, v double, p string").write.partitionBy("p").parquet(path)
    before = sorted(os.listdir(os.path.join(path, "p=d1")))
    empty = spark.createDataFrame([], "k long, v double, p string")
    assert cdc.merge_into_partitioned(spark, path, empty, "k", "p") == []
    assert sorted(os.listdir(os.path.join(path, "p=d1"))) == before


def test_merge_when_clause_order_and_conditions(spark):
    from weather_api_automate_etl_spark.operators.cdc import merge_when

    mart = spark.createDataFrame(
        [(1, 10.0), (2, 20.0), (3, 30.0), (4, 40.0)], "k long, v double"
    )
    src = spark.createDataFrame(
        [
            (1, 5.0),    # matched, delete fires (s.v < 6) BEFORE update
            (2, 15.0),   # matched, update fires (s.v < t.v)
            (3, 99.0),   # matched, neither clause -> carry 30.0
            (5, 50.0),   # not matched, insert cond holds
            (6, -1.0),   # not matched, insert cond fails -> dropped
        ],
        "k long, v double",
    )
    got = {
        r["k"]: r["v"]
        for r in merge_when(
            mart, src, "k",
            matched_delete="s.v < 6",
            matched_update="s.v < t.v",
            not_matched_insert="s.v > 0",
        ).collect()
    }
    assert got == {2: 15.0, 3: 30.0, 4: 40.0, 5: 50.0}
    # unconditional variant == plain upsert
    got2 = {
        r["k"]: r["v"] for r in merge_when(mart, src, "k").collect()
    }
    assert got2 == {1: 5.0, 2: 15.0, 3: 99.0, 4: 40.0, 5: 50.0, 6: -1.0}
    # a duplicate-key source makes the merge nondeterministic: raise
    import pytest as _pytest

    dup = src.unionByName(
        spark.createDataFrame([(2, 7.0)], "k long, v double")
    )
    with _pytest.raises(ValueError, match="not unique"):
        merge_when(mart, dup, "k")
