"""Wave-47 operator tests: rendezvous sharding and embedding drift."""

from __future__ import annotations

import hashlib

import pytest

from pyspark.sql import functions as F

from weather_api_automate_etl_spark.operators import embeddings, sampling


# ---------------------------------------------------------------------------
# rendezvous / mod sharding
# ---------------------------------------------------------------------------


def _assign(spark, keys, n, salt=""):
    df = spark.createDataFrame([(k,) for k in keys], "k string")
    out = df.select(
        "k", sampling.rendezvous_shard(F.col("k"), n, salt).alias("s")
    )
    return {r["k"]: r["s"] for r in out.collect()}


def test_rendezvous_matches_reference_argmax(spark):
    keys = [f"doc{i}" for i in range(20)]
    got = _assign(spark, keys, 5)
    for k in keys:
        want = max(
            range(5),
            key=lambda s: hashlib.md5(f"{s}:{k}".encode()).hexdigest(),
        )
        assert got[k] == want


def test_rendezvous_growth_only_moves_to_new_shard(spark):
    # HRW invariant: a key moving from n to n+1 shards can only move TO
    # the new shard (the old argmax is unchanged among shards 0..n-1)
    keys = [f"k{i}" for i in range(200)]
    before = _assign(spark, keys, 8)
    after = _assign(spark, keys, 9)
    moved = {k for k in keys if before[k] != after[k]}
    assert all(after[k] == 8 for k in moved)
    # and the expected move fraction is ~1/9, not ~8/9
    assert len(moved) / len(keys) < 0.25


def test_reshard_stability_report(spark):
    df = spark.createDataFrame([(i,) for i in range(300)], "doc_id long")
    got = sampling.reshard_stability(df, "doc_id", 8, 9).collect()[0]
    assert got["n_keys"] == 300
    assert got["rdv_moved_frac"] < 0.25 < got["mod_moved_frac"]
    assert got["rdv_moved_frac"] == pytest.approx(
        got["rdv_moved"] / 300, abs=1e-6
    )


def test_shard_rejects_bad_n(spark):
    with pytest.raises(ValueError):
        sampling.rendezvous_shard(F.col("k"), 0)
    with pytest.raises(ValueError):
        sampling.mod_shard(F.col("k"), 0)


# ---------------------------------------------------------------------------
# embedding drift
# ---------------------------------------------------------------------------


def _drift(spark, rows):
    df = spark.createDataFrame(rows, "id long, v array<float>, cur int")
    out = embeddings.embedding_drift(df, "v", F.col("cur") == 1)
    return sorted(out.collect(), key=lambda r: r["dim"])


def test_drift_detects_constant_shift(spark):
    rows = [
        (1, [1.0, 0.0], 0), (2, [1.0, 0.0], 0),
        (3, [2.0, 0.0], 1), (4, [2.0, 0.0], 1),
    ]
    got = _drift(spark, rows)
    assert got[0]["delta"] == pytest.approx(1.0)
    assert got[1]["delta"] == pytest.approx(0.0)
    assert got[0]["l2_shift"] == pytest.approx(1.0)
    # mean vectors (1,0) and (2,0) are colinear → cosine 1
    assert got[0]["cosine_means"] == pytest.approx(1.0)


def test_drift_identical_cohorts_are_null_drift(spark):
    rows = [(1, [0.5, -0.5], 0), (2, [0.5, -0.5], 1)]
    got = _drift(spark, rows)
    assert got[0]["l2_shift"] == 0.0
    assert got[0]["n_ref"] == 1 and got[0]["n_cur"] == 1


def test_drift_orthogonal_means_cosine_zero(spark):
    rows = [(1, [1.0, 0.0], 0), (2, [0.0, 1.0], 1)]
    got = _drift(spark, rows)
    assert got[0]["cosine_means"] == pytest.approx(0.0)


def test_drift_zero_mean_vector_guards_cosine(spark):
    rows = [(1, [0.0, 0.0], 0), (2, [1.0, 1.0], 1)]
    got = _drift(spark, rows)
    assert got[0]["cosine_means"] is None
