"""Wave-43 operator tests: JL projection and Brier decomposition."""

from __future__ import annotations

import math

import pytest

from pyspark.sql import functions as F

from weather_api_automate_etl_spark.operators import embeddings, stats


def test_jl_sign_matrix_is_deterministic_and_pm1():
    a = embeddings.jl_sign_matrix(4, 8)
    b = embeddings.jl_sign_matrix(4, 8)
    assert a == b
    assert all(s in (-1, 1) for row in a for s in row)
    # a different seed must give a different matrix
    assert a != embeddings.jl_sign_matrix(4, 8, seed="other")


def test_jl_project_matches_numpy(spark):
    signs = embeddings.jl_sign_matrix(3, 4)
    vecs = [(1, [1.0, 2.0, 3.0, 4.0]), (2, [0.5, -0.5, 0.0, 2.0])]
    df = spark.createDataFrame(vecs, "id long, v array<float>")
    got = {
        r["id"]: r for r in embeddings.jl_project(df, "id", "v", signs).collect()
    }
    for vid, v in vecs:
        want = [
            sum(x * s for x, s in zip(v, signs[j])) / math.sqrt(3)
            for j in range(3)
        ]
        assert got[vid]["proj"] == pytest.approx(want, abs=1e-6)
        assert got[vid]["orig_norm"] == pytest.approx(
            math.sqrt(sum(x * x for x in v)), abs=1e-6
        )
        assert got[vid]["distortion"] == pytest.approx(
            got[vid]["proj_norm"] / got[vid]["orig_norm"], abs=1e-5
        )


def test_jl_project_zero_vector_distortion_null(spark):
    signs = embeddings.jl_sign_matrix(2, 3)
    df = spark.createDataFrame(
        [(1, [0.0, 0.0, 0.0])], "id long, v array<float>"
    )
    got = embeddings.jl_project(df, "id", "v", signs).collect()[0]
    assert got["distortion"] is None and got["orig_norm"] == 0.0


def test_jl_project_rejects_empty_matrix(spark):
    df = spark.createDataFrame([(1, [1.0])], "id long, v array<float>")
    with pytest.raises(ValueError):
        embeddings.jl_project(df, "id", "v", [])


def _brier(spark, rows, n_bins=2):
    df = spark.createDataFrame(rows, "s double, y int")
    out = stats.brier_decomposition(df, "s", F.col("y") == 1, n_bins=n_bins)
    return sorted(out.collect(), key=lambda r: r["bin"])


def test_brier_identity_holds_for_constant_bins(spark):
    # scores constant within each bin → BS = REL − RES + UNC exactly
    rows = [(0.2, 0), (0.2, 0), (0.2, 1), (0.8, 1), (0.8, 1), (0.8, 0)]
    got = _brier(spark, rows)
    r = got[0]
    assert r["brier"] == pytest.approx(
        r["reliability"] - r["resolution"] + r["uncertainty"], abs=1e-6
    )
    # base rate 0.5 → uncertainty 0.25
    assert r["uncertainty"] == pytest.approx(0.25)


def test_brier_perfect_forecaster(spark):
    rows = [(0.0, 0), (0.0, 0), (1.0, 1), (1.0, 1)]
    got = _brier(spark, rows)
    r = got[0]
    assert r["brier"] == 0.0 and r["reliability"] == 0.0
    # resolution equals uncertainty for a perfect sharp forecaster
    assert r["resolution"] == pytest.approx(r["uncertainty"])


def test_brier_top_edge_score_lands_in_last_bin(spark):
    rows = [(1.0, 1), (0.95, 1)]
    got = _brier(spark, rows, n_bins=10)
    assert [r["bin"] for r in got] == [9]
    assert got[0]["n"] == 2


def test_brier_rejects_single_bin(spark):
    df = spark.createDataFrame([(0.5, 1)], "s double, y int")
    with pytest.raises(ValueError):
        stats.brier_decomposition(df, "s", F.col("y") == 1, n_bins=1)
