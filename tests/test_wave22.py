"""Wave-22 tests: dynamic partition pruning (plan + files pinned) and
CSV error routing through the contract query."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from tests.conftest import SF_SMALL
from weather_api_automate_etl_spark.sources import formats


def test_dpp_plan_and_pruned_files(spark, tmp_path):
    """The star join against the independent dim must carry a runtime
    DPP filter AND actually read only the qualifying year directories."""
    base = str(tmp_path / "fact")
    orders = spark.read.parquet(f"{SF_SMALL}/orders.parquet")
    orders.withColumn("o_year", F.year("o_orderdate")).write.partitionBy(
        "o_year"
    ).parquet(base)
    fact = spark.read.parquet(base)
    n_years = fact.select("o_year").distinct().count()
    dim = (
        spark.read.parquet(f"{SF_SMALL}/region.parquet")
        .select((F.lit(1995) + F.col("r_regionkey")).alias("o_year"), "r_name")
        .filter(F.col("r_name").isin("ASIA", "EUROPE"))
    )
    j = fact.join(dim, "o_year").groupBy("o_year").count()
    rows = {r["o_year"]: r["count"] for r in j.collect()}
    assert set(rows) == {1997, 1998}
    # the mechanism pin: the fact scan's PartitionFilters carry a RUNTIME
    # dynamicpruningexpression fed by a broadcast subquery of the dim —
    # the static file index (inputFiles()) still lists every partition,
    # which is exactly why the pruning must happen at execution time
    plan = j._jdf.queryExecution().executedPlan().toString()
    low = plan.lower()
    assert "dynamicpruningexpression" in low, plan
    assert "subquerybroadcast" in low, plan
    assert "partitionfilters" in low, plan
    assert n_years > 2  # there genuinely was something to prune


def test_dpp_answer_equals_unpartitioned_join(spark, tmp_path):
    base = str(tmp_path / "fact2")
    orders = spark.read.parquet(f"{SF_SMALL}/orders.parquet")
    orders.withColumn("o_year", F.year("o_orderdate")).write.partitionBy(
        "o_year"
    ).parquet(base)
    fact = spark.read.parquet(base)
    dim = (
        spark.read.parquet(f"{SF_SMALL}/region.parquet")
        .select((F.lit(1995) + F.col("r_regionkey")).alias("o_year"), "r_name")
        .filter(F.col("r_name").isin("ASIA", "EUROPE"))
    )
    pruned = fact.join(dim, "o_year").count()
    plain = (
        orders.withColumn("o_year", F.year("o_orderdate"))
        .join(dim, "o_year")
        .count()
    )
    assert pruned == plain


def test_csv_routing_splits_exactly_on_corruption(spark, tmp_path):
    p = str(tmp_path / "landing")
    docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet")
    docs.select(
        F.concat_ws(
            ",",
            "doc_id",
            "lang",
            F.when(F.col("doc_id") % 7 == 0, F.lit("oops"))
            .otherwise(F.col("n_chars").cast("string")),
        ).alias("value")
    ).write.text(p)
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("lang", T.StringType()),
            T.StructField("n_chars", T.LongType()),
        ]
    )
    good, bad = formats.read_csv(spark, p, schema, header=False)
    n = docs.count()
    n_corrupt = docs.filter("doc_id % 7 = 0").count()
    assert bad.count() == n_corrupt
    assert good.count() == n - n_corrupt
    # the bad side carries the raw line for quarantine/replay
    assert all("oops" in r["raw_record"] for r in bad.limit(5).collect())
    # no silent coercion: good-side ids never include corrupt ids
    assert good.filter("doc_id % 7 = 0").count() == 0
