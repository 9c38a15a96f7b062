"""Quantitative error bounds for the sketch-based aggregates.

q_approx_stats is rows-only at the driver (sketches are approximate by
construction, so no value-exact oracle) — these tests are its
quantitative gate: each sketch must sit within its published error bound
of the exact answer computed on the same data.
"""

from __future__ import annotations

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.01"


def test_hll_distinct_within_relative_error(spark):
    from weather_api_automate_etl_spark.sources.tables import load_table

    ev = load_table(spark, SF, "events")
    got = {
        r.event_type: r
        for r in ev.groupBy("event_type")
        .agg(
            F.approx_count_distinct("user_id").alias("approx"),
            F.countDistinct("user_id").alias("exact"),
        )
        .collect()
    }
    assert got, "no groups"
    for et, r in got.items():
        rel = abs(r.approx - r.exact) / max(r.exact, 1)
        # HLL++ at Spark's default rsd=0.05: allow 3 standard deviations
        assert rel < 0.15, f"{et}: approx={r.approx} exact={r.exact} rel={rel:.3f}"


def test_sharded_sketch_union_equals_single_pass(spark):
    # HLL union over shard sketches is exact in register space: merging
    # 8 per-shard sketches must give the SAME estimate as sketching the
    # whole column in one pass — the property that makes stored partial
    # sketches re-aggregatable at 100 TB
    from weather_api_automate_etl_spark.sources.tables import load_table

    ev = load_table(spark, SF, "events")
    merged = {
        r.event_type: r.est
        for r in ev.groupBy("event_type", (F.col("user_id") % 8).alias("sh"))
        .agg(F.hll_sketch_agg("user_id").alias("sk"))
        .groupBy("event_type")
        .agg(F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est"))
        .collect()
    }
    single = {
        r.event_type: r.est
        for r in ev.groupBy("event_type")
        .agg(F.hll_sketch_estimate(F.hll_sketch_agg("user_id")).alias("est"))
        .collect()
    }
    assert merged == single and len(merged) > 0


def test_percentile_sketch_within_rank_error(spark):
    from weather_api_automate_etl_spark.sources.tables import load_table

    ev = load_table(spark, SF, "events")
    rows = ev.groupBy("event_type").agg(
        F.percentile_approx("value", [0.5, 0.95], 10000).alias("approx"),
        F.expr("percentile(value, array(0.5, 0.95))").alias("exact"),
        F.count(F.lit(1)).alias("n"),
        F.expr("sort_array(collect_list(value))").alias("vals"),
    ).collect()
    assert rows
    for r in rows:
        # Greenwald-Khanna guarantee: the returned value's RANK is within
        # eps*n of the target rank (eps = 1/accuracy) — verify in rank
        # space, not value space, plus a sanity band in value space
        eps_ranks = max(1.0, r.n / 10000) + 1
        for target, (a, e) in zip((0.5, 0.95), zip(r.approx, r.exact)):
            rank_a = sum(1 for v in r.vals if v <= a)
            assert abs(rank_a - target * r.n) <= eps_ranks + 1, (
                r.event_type, target, rank_a, target * r.n
            )
            # and the sketch value sits inside the data's range
            assert r.vals[0] <= a <= r.vals[-1]
