"""Salting operators: results identical to unsalted plans, skew spread."""

from __future__ import annotations

from pyspark.sql import Row, functions as F

from weather_api_automate_etl_spark.operators import skew


def _skewed(spark):
    # one hot key (k=1) with 900 rows, two cold keys
    rows = [Row(k=1, id=i, v=float(i % 7)) for i in range(900)]
    rows += [Row(k=2, id=1000 + i, v=float(i)) for i in range(50)]
    rows += [Row(k=3, id=2000 + i, v=float(i)) for i in range(50)]
    return spark.createDataFrame(rows)


def test_salted_agg_matches_plain(spark):
    df = _skewed(spark)
    plain = {
        (r.k): (r.total, r.n, r.lo, r.hi)
        for r in df.groupBy("k").agg(
            F.sum("v").alias("total"), F.count("v").alias("n"),
            F.min("v").alias("lo"), F.max("v").alias("hi"),
        ).collect()
    }
    salted = {
        (r.k): (r.total, r.n, r.lo, r.hi)
        for r in skew.salted_agg(
            df, ["k"],
            {"total": ("v", "sum"), "n": ("v", "count"),
             "lo": ("v", "min"), "hi": ("v", "max")},
            salt_from="id", n_salts=8,
        ).collect()
    }
    assert salted == plain


def test_salted_agg_spreads_hot_key(spark):
    df = _skewed(spark).withColumn("__salt", skew._salt_col(F.col("id"), 8))
    per_salt = df.filter("k = 1").groupBy("__salt").count().collect()
    assert len(per_salt) == 8                      # hot key hits all salts
    assert max(r["count"] for r in per_salt) < 900  # no salt owns everything


def test_salted_join_matches_plain(spark):
    big = _skewed(spark)
    small = spark.createDataFrame(
        [Row(k=1, name="hot"), Row(k=2, name="cold2"), Row(k=4, name="unmatched")]
    )
    plain = big.join(small, "k").groupBy("name").count().collect()
    salted = (
        skew.salted_join(big, small, on="k", salt_from="id", n_salts=8)
        .groupBy("name").count().collect()
    )
    assert {(r.name, r["count"]) for r in salted} == {(r.name, r["count"]) for r in plain}
    assert {r.name for r in salted} == {"hot", "cold2"}
