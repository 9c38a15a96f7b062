"""Wave-30 operator tests: ORC roundtrip fidelity and MRR."""

from __future__ import annotations

import shutil
import tempfile

import pytest

from pyspark.sql import functions as F, types as T

from weather_api_automate_etl_spark.operators import similarity
from weather_api_automate_etl_spark.sources import formats


# ---------------------------------------------------------------------------
# ORC write/read fidelity
# ---------------------------------------------------------------------------


def test_orc_roundtrip_preserves_values_types_and_nulls(spark):
    schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("name", T.StringType()),
            T.StructField("score", T.DoubleType()),
        ]
    )
    rows = [(1, "a", 0.5), (2, None, -1.25), (3, "c", None)]
    df = spark.createDataFrame(rows, schema)
    base = tempfile.mkdtemp(prefix="orc_rt_")
    try:
        formats.write_orc(df, base)
        back = formats.read_orc(spark, base, schema)
        assert back.schema == schema
        assert sorted(
            back.collect(), key=lambda r: r["id"]
        ) == sorted(df.collect(), key=lambda r: r["id"])
    finally:
        shutil.rmtree(base, ignore_errors=True)


def test_orc_read_pushes_filters_into_scan(spark):
    df = spark.range(1000).select(
        F.col("id"), (F.col("id") % 10).alias("bucket")
    )
    base = tempfile.mkdtemp(prefix="orc_push_")
    try:
        formats.write_orc(df, base)
        schema = T.StructType(
            [
                T.StructField("id", T.LongType()),
                T.StructField("bucket", T.LongType()),
            ]
        )
        back = formats.read_orc(spark, base, schema).filter(
            F.col("bucket") == 3
        )
        plan = back._jdf.queryExecution().executedPlan().toString()
        assert "PushedFilters: [" in plan and "bucket" in plan
        assert back.count() == 100
    finally:
        shutil.rmtree(base, ignore_errors=True)


# ---------------------------------------------------------------------------
# MRR
# ---------------------------------------------------------------------------


def _emb(spark, rows):
    return spark.createDataFrame(
        rows, "vec_id int, embedding array<float>, label int"
    )


def test_mrr_first_hit_rank(spark):
    """Query 0 (label 1): nearest is wrong-label, second is right ->
    rr = 1/2."""
    rows = [
        (0, [1.0, 0.0], 1),
        (10, [0.99, 0.14], 2),   # rank 1, wrong label
        (11, [0.95, 0.31], 1),   # rank 2, right label
        (12, [0.0, 1.0], 1),
    ]
    got = {
        r["query_id"]: r
        for r in similarity.mrr_at_k(_emb(spark, rows), (0,), k=3).collect()
    }
    assert got[0]["first_rank"] == 2
    assert got[0]["rr"] == pytest.approx(0.5)


def test_mrr_no_hit_in_top_k_is_zero(spark):
    rows = [
        (0, [1.0, 0.0], 1),
        (10, [0.99, 0.1], 2),
        (11, [0.98, 0.2], 2),
        (12, [-1.0, 0.0], 1),    # right label but rank 3
    ]
    (r,) = similarity.mrr_at_k(_emb(spark, rows), (0,), k=2).collect()
    assert r["first_rank"] is None and r["rr"] == 0.0


def test_mrr_multiple_queries_independent(spark):
    rows = [
        (0, [1.0, 0.0], 1),
        (1, [0.0, 1.0], 2),
        (10, [0.9, 0.1], 1),     # immediate hit for q0
        (11, [0.1, 0.9], 2),     # immediate hit for q1
    ]
    got = {
        r["query_id"]: r["rr"]
        for r in similarity.mrr_at_k(_emb(spark, rows), (0, 1), k=2).collect()
    }
    assert got == {0: pytest.approx(1.0), 1: pytest.approx(1.0)}


def test_mrr_excludes_query_vectors_from_corpus(spark):
    """Queries must never retrieve each other (or themselves)."""
    rows = [
        (0, [1.0, 0.0], 1),
        (1, [1.0, 0.01], 1),     # near-identical same-label QUERY
        (10, [0.5, 0.5], 1),
    ]
    got = {
        r["query_id"]: r
        for r in similarity.mrr_at_k(_emb(spark, rows), (0, 1), k=5).collect()
    }
    # only vec 10 is corpus; both queries hit it at rank 1
    assert got[0]["first_rank"] == 1 and got[1]["first_rank"] == 1


def test_mrr_validates_args(spark):
    df = _emb(spark, [(0, [1.0], 1)])
    with pytest.raises(ValueError, match="mrr"):
        similarity.mrr_at_k(df, (0,), k=0)
    with pytest.raises(ValueError, match="query_ids"):
        similarity.mrr_at_k(df, (), k=5)
