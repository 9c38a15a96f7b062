"""Wave-16 operator tests: bucketed SMB joins (plan pinned), BFS,
Spearman, Holt smoothing, l-diversity, DP noisy counts, DSIR weights,
and the perceptual dHash."""

from __future__ import annotations

import math
import shutil
import tempfile
import uuid

import pytest
from pyspark.sql import Row, functions as F

from tests.conftest import SF_SMALL
from weather_api_automate_etl_spark.operators import (
    corpus,
    graph,
    joins,
    privacy,
    stats,
    timeseries,
)
from weather_api_automate_etl_spark.sources import multimodal


# ---------------------------------------------------------------------------
# bucketed sort-merge join
# ---------------------------------------------------------------------------


def test_bucketed_join_plan_has_no_exchange(spark):
    """THE property this operator exists for: with both sides bucketed on
    the join key (same bucket count), the sort-merge join plans with ZERO
    Exchange nodes — the shuffle was paid once, at write time."""
    sf = SF_SMALL
    li = spark.read.parquet(f"{sf}/lineitem.parquet").select(
        "l_orderkey", "l_extendedprice"
    )
    od = spark.read.parquet(f"{sf}/orders.parquet").select(
        "o_orderkey", "o_orderpriority"
    )
    u = uuid.uuid4().hex[:8]
    ln, rn = f"t_smb_l_{u}", f"t_smb_r_{u}"
    base = tempfile.mkdtemp(prefix="t_smb_")
    try:
        joins.write_bucketed(li, "l_orderkey", 8, ln, f"{base}/l")
        joins.write_bucketed(od, "o_orderkey", 8, rn, f"{base}/r")
        j = joins.bucketed_equi_join(spark, ln, rn, "l_orderkey", "o_orderkey")
        n = j.count()
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, plan
        # co-location must not change the answer
        expected = li.join(od, li["l_orderkey"] == od["o_orderkey"]).count()
        assert n == expected
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {ln}")
        spark.sql(f"DROP TABLE IF EXISTS {rn}")
        shutil.rmtree(base, ignore_errors=True)


def test_write_bucketed_rejects_bad_bucket_count(spark):
    df = spark.range(1)
    with pytest.raises(ValueError, match="n_buckets"):
        joins.write_bucketed(df, "id", 0, "nope", "/tmp/nope")


# ---------------------------------------------------------------------------
# multi-source BFS
# ---------------------------------------------------------------------------


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src long, dst long")


def _nodes(spark, ids):
    return spark.createDataFrame([(i,) for i in ids], "node long")


def test_bfs_path_graph_min_hops(spark):
    """1-2-3-4-5 path, source {1}: hops are the path distances, capped."""
    e = _edges(spark, [(1, 2), (2, 3), (3, 4), (4, 5)])
    got = {
        r["node"]: r["hops"]
        for r in graph.bfs_distances(e, _nodes(spark, [1]), max_hops=3).collect()
    }
    assert got == {1: 0, 2: 1, 3: 2, 4: 3}  # 5 is 4 hops away: absent


def test_bfs_multi_source_first_discovery_wins(spark):
    """Two sources on a path: every node takes the MIN distance."""
    e = _edges(spark, [(1, 2), (2, 3), (3, 4), (4, 5)])
    got = {
        r["node"]: r["hops"]
        for r in graph.bfs_distances(
            e, _nodes(spark, [1, 5]), max_hops=3
        ).collect()
    }
    assert got == {1: 0, 5: 0, 2: 1, 4: 1, 3: 2}


def test_bfs_directed_vs_undirected(spark):
    e = _edges(spark, [(1, 2), (2, 3)])
    undirected = graph.bfs_distances(e, _nodes(spark, [3]), max_hops=2)
    assert {r["node"]: r["hops"] for r in undirected.collect()} == {
        3: 0, 2: 1, 1: 2,
    }
    directed = graph.bfs_distances(
        e, _nodes(spark, [3]), max_hops=2, directed=True
    )
    assert {r["node"]: r["hops"] for r in directed.collect()} == {3: 0}


def test_bfs_early_exit_on_empty_frontier(spark):
    """Disconnected source: the loop stops when the frontier drains, not
    after max_hops rounds."""
    e = _edges(spark, [(1, 2)])
    got = graph.bfs_distances(e, _nodes(spark, [99]), max_hops=50).collect()
    assert {r["node"]: r["hops"] for r in got} == {99: 0}


def test_bfs_rejects_negative_hops(spark):
    e = _edges(spark, [(1, 2)])
    with pytest.raises(ValueError, match="max_hops"):
        graph.bfs_distances(e, _nodes(spark, [1]), max_hops=-1)


# ---------------------------------------------------------------------------
# Spearman rank correlation
# ---------------------------------------------------------------------------


def test_spearman_monotone_and_reversed(spark):
    rows = [("g", float(i), float(i * i)) for i in range(1, 20)]
    rows += [("h", float(i), float(-i)) for i in range(1, 20)]
    df = spark.createDataFrame(rows, "grp string, x double, y double")
    got = {
        r["grp"]: r["spearman_rho"]
        for r in stats.spearman_by_group(df, "grp", "x", "y").collect()
    }
    assert got["g"] == 1.0  # any monotone map is rank-perfect
    assert got["h"] == -1.0


def test_spearman_ties_average_rank(spark):
    """All-x-tied: zero rank variance -> NULL, never NaN or garbage."""
    rows = [("g", 1.0, float(i)) for i in range(10)]
    df = spark.createDataFrame(rows, "grp string, x double, y double")
    (row,) = stats.spearman_by_group(df, "grp", "x", "y").collect()
    assert row["spearman_rho"] is None


def test_spearman_matches_pandas_rank_pearson(spark):
    """Differential vs pandas average-rank + Pearson on real data."""
    df = spark.read.parquet(f"{SF_SMALL}/lineitem.parquet")
    got = {
        r["l_returnflag"]: r["spearman_rho"]
        for r in stats.spearman_by_group(
            df, "l_returnflag", "l_quantity", "l_extendedprice"
        ).collect()
    }
    pdf = df.select("l_returnflag", "l_quantity", "l_extendedprice").toPandas()
    for g, sub in pdf.groupby("l_returnflag"):
        rx = sub["l_quantity"].rank(method="average")
        ry = sub["l_extendedprice"].rank(method="average")
        assert got[g] == pytest.approx(rx.corr(ry), abs=1e-6)


# ---------------------------------------------------------------------------
# Holt linear smoothing
# ---------------------------------------------------------------------------


def _holt_ref(ys, a=0.5, b=0.25):
    lvl, trd = ys[0], ys[1] - ys[0]
    for y in ys[1:]:  # recursion starts at t=2: y2 is consumed too
        nl = a * y + (1 - a) * (lvl + trd)
        trd = b * (nl - lvl) + (1 - b) * trd
        lvl = nl
    # forecast rounds the UNROUNDED sum (matching operator and oracle)
    return round(lvl, 6), round(trd, 6), round(lvl + trd, 6)


def test_holt_linear_matches_python_replay(spark):
    series = {
        "up": [10.0, 12.0, 13.0, 12.0, 15.0, 16.0, 18.0],
        "flat": [5.0, 5.0, 5.0, 5.0],
        "noisy": [3.0, 9.0, 1.0, 7.0, 2.0, 8.0],
    }
    rows = [(k, i, v) for k, ys in series.items() for i, v in enumerate(ys)]
    df = spark.createDataFrame(rows, "k string, t int, y double")
    out = {
        r["k"]: (r["n_points"], r["level"], r["trend"], r["forecast_1"])
        for r in timeseries.holt_linear(df, "k", "t", "y").collect()
    }
    for k, ys in series.items():
        lvl, trd, fc = _holt_ref(ys)
        assert out[k] == (len(ys), lvl, trd, fc), k
    # flat series: level sticks, trend stays zero
    assert out["flat"][1:3] == (5.0, 0.0)


def test_holt_linear_drops_short_series(spark):
    df = spark.createDataFrame(
        [("a", 0, 1.0), ("b", 0, 1.0), ("b", 1, 2.0)],
        "k string, t int, y double",
    )
    got = {r["k"] for r in timeseries.holt_linear(df, "k", "t", "y").collect()}
    assert got == {"b"}


def test_holt_linear_order_independence(spark):
    """The fold runs in ORDER-column order regardless of row arrival."""
    ys = [4.0, 8.0, 2.0, 9.0, 5.0]
    fwd = [("k", i, v) for i, v in enumerate(ys)]
    rev = list(reversed(fwd))
    a = timeseries.holt_linear(
        spark.createDataFrame(fwd, "k string, t int, y double"), "k", "t", "y"
    ).collect()
    b = timeseries.holt_linear(
        spark.createDataFrame(rev, "k string, t int, y double"), "k", "t", "y"
    ).collect()
    assert a == b
    assert (a[0]["level"], a[0]["trend"]) == _holt_ref(ys)[:2]


# ---------------------------------------------------------------------------
# l-diversity
# ---------------------------------------------------------------------------


def test_l_diversity_flags_homogeneous_classes(spark):
    rows = [
        ("35", "M", "flu"), ("35", "M", "flu"), ("35", "M", "flu"),
        ("40", "F", "flu"), ("40", "F", "cold"), ("40", "F", "covid"),
    ]
    df = spark.createDataFrame(rows, "age string, sex string, dx string")
    got = privacy.l_diversity_violations(df, ["age", "sex"], "dx", l=3).collect()
    assert len(got) == 1
    (r,) = got
    assert (r["age"], r["sex"], r["class_size"], r["n_sensitive"]) == (
        "35", "M", 3, 1,
    )


def test_l_diversity_certifies_diverse_release(spark):
    rows = [("a", i, f"v{i}") for i in range(3)]
    df = spark.createDataFrame(rows, "q string, i int, s string")
    assert privacy.l_diversity_violations(df, ["q"], "s", l=3).isEmpty()
    with pytest.raises(ValueError, match="l-diversity"):
        privacy.l_diversity_violations(df, ["q"], "s", l=1)


# ---------------------------------------------------------------------------
# DP noisy counts
# ---------------------------------------------------------------------------


def test_dp_counts_deterministic_and_seed_sensitive(spark):
    df = spark.read.parquet(f"{SF_SMALL}/documents.parquet")
    a = {
        (r["lang"], r["source"]): r["noisy_count"]
        for r in privacy.dp_noisy_counts(df, ["lang", "source"], 1.0).collect()
    }
    b = {
        (r["lang"], r["source"]): r["noisy_count"]
        for r in privacy.dp_noisy_counts(df, ["lang", "source"], 1.0).collect()
    }
    assert a == b  # sticky noise: identical release on rerun
    c = {
        (r["lang"], r["source"]): r["noisy_count"]
        for r in privacy.dp_noisy_counts(
            df, ["lang", "source"], 1.0, seed="other"
        ).collect()
    }
    assert a != c  # a different seed is a different mechanism draw
    # noise is real: at least one group moved off its exact count
    exact = {
        (r["lang"], r["source"]): r["count"]
        for r in df.groupBy("lang", "source").count().collect()
    }
    moved = [k for k in a if abs(a[k] - exact[k]) > 1e-9]
    assert moved


def test_dp_counts_epsilon_scales_noise(spark):
    """Laplace(1/eps): the same uniform draw scales linearly in 1/eps."""
    df = spark.read.parquet(f"{SF_SMALL}/documents.parquet")
    tight = {
        (r["lang"], r["source"]): r["noisy_count"]
        for r in privacy.dp_noisy_counts(df, ["lang", "source"], 10.0).collect()
    }
    loose = {
        (r["lang"], r["source"]): r["noisy_count"]
        for r in privacy.dp_noisy_counts(df, ["lang", "source"], 1.0).collect()
    }
    exact = {
        (r["lang"], r["source"]): r["count"]
        for r in df.groupBy("lang", "source").count().collect()
    }
    for k in exact:
        n_tight = tight[k] - exact[k]
        n_loose = loose[k] - exact[k]
        assert n_loose == pytest.approx(10.0 * n_tight, abs=1e-5)
    with pytest.raises(ValueError, match="epsilon"):
        privacy.dp_noisy_counts(df, ["lang"], 0.0)


# ---------------------------------------------------------------------------
# DSIR importance weights
# ---------------------------------------------------------------------------


def test_dsir_target_like_docs_score_higher(spark):
    rows = [(i, "quality prose sentence", True) for i in range(20)]
    rows += [(i + 100, "spam spam spam spam", False) for i in range(20)]
    rows += [(200, "quality prose sentence", False),
             (201, "spam spam spam spam", False)]
    df = spark.createDataFrame(rows, "doc_id long, text string, is_t boolean")
    out = {
        r["doc_id"]: r["dsir_weight"]
        for r in corpus.dsir_importance(df, F.col("is_t"), dim=64).collect()
    }
    # the raw doc written in the target's style outscores the spam doc
    assert out[200] > out[201]
    # weights are log-ratios: target-style tokens push positive
    assert out[200] > 0 > out[201]
    with pytest.raises(ValueError, match="dim"):
        corpus.dsir_importance(df, F.col("is_t"), dim=1)


def test_dsir_empty_docs_absent(spark):
    df = spark.createDataFrame(
        [(1, "hello world", True), (2, "   ", False)],
        "doc_id long, text string, is_t boolean",
    )
    got = {r["doc_id"] for r in
           corpus.dsir_importance(df, F.col("is_t")).collect()}
    assert got == {1}


# ---------------------------------------------------------------------------
# perceptual dHash
# ---------------------------------------------------------------------------


def _ppm(px):
    import numpy as np

    from weather_api_automate_etl_spark.sources import codecs

    return codecs.encode_ppm(np.asarray(px, dtype="uint8"))


def _asset_df(spark, items):
    return spark.createDataFrame(
        [Row(asset_id=i, media_type="image/x-portable-pixmap",
             content=bytearray(p), byte_len=len(p)) for i, p in items],
        multimodal.ASSET_SCHEMA,
    )


def test_dhash_constant_and_gradient_extremes(spark):
    import numpy as np

    flat = np.full((8, 9, 3), 7, dtype=np.uint8)
    ramp = np.tile(np.arange(9, dtype=np.uint8) * 10, (8, 1))
    ramp3 = np.repeat(ramp[:, :, None], 3, axis=2)
    df = _asset_df(spark, [(1, _ppm(flat)), (2, _ppm(ramp3))])
    got = {r["asset_id"]: r["dhash"] for r in
           multimodal.image_dhash(df).collect()}
    assert got[1] == "0000000000000000"  # no gradient anywhere
    assert got[2] == "ffffffffffffffff"  # strictly increasing every step


def test_dhash_box_reduce_is_scale_invariant(spark):
    """A 2x upscale of the same image hashes identically — the property
    that makes dHash a NEAR-dup key across re-encodes/resizes."""
    import numpy as np

    rng = np.random.default_rng(7)
    base = rng.integers(0, 256, size=(8, 9), dtype=np.uint8)
    big = np.kron(base, np.ones((2, 2), dtype=np.uint8))  # 16 x 18
    small3 = np.repeat(base[:, :, None], 3, axis=2)
    big3 = np.repeat(big[:, :, None], 3, axis=2)
    df = _asset_df(spark, [(1, _ppm(small3)), (2, _ppm(big3))])
    got = {r["asset_id"]: r["dhash"] for r in
           multimodal.image_dhash(df).collect()}
    assert got[1] == got[2]
    assert got[1] != "0000000000000000"


def test_dhash_smaller_than_grid_input_is_finite(spark):
    """round-12 review: an image smaller than the 9x8 dHash grid used to
    produce empty box-reduce cells whose NaN means silently zeroed every
    gradient bit. Nearest-span upscaling must yield a real, non-trivial
    hash, and a 2x3 ramp must hash like its grid-sized nearest upscale."""
    import numpy as np

    tiny = np.array([[0, 100, 200], [30, 130, 230]], dtype=np.uint8)
    tiny3 = np.repeat(tiny[:, :, None], 3, axis=2)
    # the exact nearest-sample upscale of tiny onto the 9x8 grid
    ys = (np.arange(8) * 2) // 8
    xs = (np.arange(9) * 3) // 9
    up3 = np.repeat(tiny[np.ix_(ys, xs)][:, :, None], 3, axis=2)
    df = _asset_df(spark, [(1, _ppm(tiny3)), (2, _ppm(up3))])
    got = {r["asset_id"]: r["dhash"] for r in
           multimodal.image_dhash(df).collect()}
    assert got[1] == got[2]
    assert got[1] != "0000000000000000"


@pytest.mark.slow
def test_gradient_assets_duplicate_classes(spark):
    """doc_ids congruent mod 240 share (a, b, s) -> byte-identical
    payloads and equal hashes."""
    docs = spark.createDataFrame(
        [(0,), (240,), (480,), (7,)], "doc_id long"
    )
    assets = multimodal.documents_as_gradient_assets(docs)
    rows = {r["asset_id"]: bytes(r["content"]) for r in assets.collect()}
    assert rows[0] == rows[240] == rows[480]
    assert rows[0] != rows[7]
    hashes = {r["asset_id"]: r["dhash"] for r in
              multimodal.image_dhash(assets).collect()}
    assert hashes[0] == hashes[240] == hashes[480]
