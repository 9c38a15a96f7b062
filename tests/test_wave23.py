"""Wave-23 operator tests: common-neighbor link prediction and HITS."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from weather_api_automate_etl_spark.operators import graph


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src long, dst long")


# ---------------------------------------------------------------------------
# link prediction
# ---------------------------------------------------------------------------


@pytest.mark.slow
def test_link_prediction_square_diagonals(spark):
    """Cycle 1-2-3-4-1: the only >=2-common-neighbor absent edges are
    the diagonals, with Jaccard 1 and AA = 2/ln 2."""
    e = _edges(spark, [(1, 2), (2, 3), (3, 4), (4, 1)])
    out = {(r["id_a"], r["id_b"]): r for r in
           graph.common_neighbor_scores(e, min_common=2).collect()}
    assert set(out) == {(1, 3), (2, 4)}
    r = out[(1, 3)]
    assert r["common"] == 2 and r["jaccard"] == 1.0
    assert r["adamic_adar"] == pytest.approx(2 / math.log(2), abs=1e-5)


@pytest.mark.slow
def test_link_prediction_excludes_existing_edges(spark):
    """A triangle's nodes all share neighbors, but every pair is already
    connected — nothing to predict."""
    e = _edges(spark, [(1, 2), (2, 3), (1, 3), (1, 4), (2, 4), (3, 4)])
    assert graph.common_neighbor_scores(e, min_common=1).isEmpty()


def test_link_prediction_adamic_adar_damps_hubs(spark):
    """Pairs connected only through a high-degree hub score lower AA
    than pairs connected through an exclusive neighbor."""
    hub = [(100, i) for i in range(1, 7)]          # hub 100 touches 1..6
    excl = [(7, 200), (8, 200)]                    # 7,8 share private 200
    e = _edges(spark, hub + excl)
    out = {(r["id_a"], r["id_b"]): r["adamic_adar"] for r in
           graph.common_neighbor_scores(e, min_common=1).collect()}
    assert out[(7, 8)] == pytest.approx(1 / math.log(2), abs=1e-5)
    assert out[(1, 2)] == pytest.approx(1 / math.log(6), abs=1e-5)
    assert out[(7, 8)] > out[(1, 2)]


def test_link_prediction_dedupes_multi_edges(spark):
    """Repeated input edges must not inflate common-neighbor counts."""
    e = _edges(spark, [(1, 9), (1, 9), (2, 9), (2, 9)])
    out = graph.common_neighbor_scores(e, min_common=1).collect()
    assert len(out) == 1 and out[0]["common"] == 1


# ---------------------------------------------------------------------------
# HITS
# ---------------------------------------------------------------------------


def test_hits_separates_hubs_from_authorities(spark):
    e = _edges(spark, [(10, 1), (10, 2), (11, 2)])
    hubs, auths = graph.hits_bipartite(e, iterations=3)
    H = {r["node"]: r["hub"] for r in hubs.collect()}
    A = {r["node"]: r["authority"] for r in auths.collect()}
    assert H[10] > H[11]    # order 10 touches both parts
    assert A[2] > A[1]      # part 2 touched by both orders
    assert sum(v * v for v in H.values()) == pytest.approx(1.0, abs=1e-4)
    assert sum(v * v for v in A.values()) == pytest.approx(1.0, abs=1e-4)


def test_hits_symmetric_graph_is_uniform(spark):
    """A complete bipartite graph gives every node on a side the same
    score."""
    e = _edges(spark, [(u, v) for u in (1, 2, 3) for v in (10, 20)])
    hubs, auths = graph.hits_bipartite(e, iterations=2)
    assert len({r["hub"] for r in hubs.collect()}) == 1
    assert len({r["authority"] for r in auths.collect()}) == 1
    with pytest.raises(ValueError, match="iterations"):
        graph.hits_bipartite(e, iterations=0)


def test_hits_converges_toward_principal_direction(spark):
    """More iterations widen the hub gap on an asymmetric star —
    power-iteration behavior."""
    e = _edges(spark, [(10, i) for i in range(1, 6)] + [(11, 1)])

    def gap(iters):
        hubs, _ = graph.hits_bipartite(e, iterations=iters)
        H = {r["node"]: r["hub"] for r in hubs.collect()}
        return H[10] - H[11]

    assert gap(3) >= gap(1) - 1e-9


def test_hits_wide_input_checkpoints_raw_aggregate(spark):
    """Round-13 size guard: on a WIDE edge set (partitions ≥ 2x session
    parallelism) each half-step's raw join+aggregate is materialized
    once instead of executing twice under _l2_normalized's two
    consumers — and the scores are identical either way."""
    pairs = [(u, v) for u in range(8) for v in range(100, 104)]
    narrow = _edges(spark, pairs)
    par = spark.sparkContext.defaultParallelism
    wide = narrow.repartition(2 * par)
    h_n, a_n = (
        {r["node"]: r[c] for r in df.collect()}
        for df, c in zip(graph.hits_bipartite(narrow, iterations=2), ("hub", "authority"))
    )
    h_w, a_w = (
        {r["node"]: r[c] for r in df.collect()}
        for df, c in zip(graph.hits_bipartite(wide, iterations=2), ("hub", "authority"))
    )
    assert h_w == h_n and a_w == a_n


def test_l2_normalized_materialize_executes_input_once(spark):
    """The guarded branch's contract (guide §2.4): with materialize=True
    the raw frame's plan runs exactly ONCE (both the norm aggregate and
    the body read the checkpoint); the recompute form runs it twice.
    Pinned with an accumulator inside the input DAG."""
    calls = spark.sparkContext.accumulator(0)

    def counting(it):
        for batch in it:
            calls.add(batch.num_rows)
            yield batch

    def raw():
        return spark.createDataFrame(
            [(i, float(i)) for i in range(10)], "node long, a double"
        ).mapInArrow(counting, "node long, a double")

    graph._l2_normalized(raw(), "a", materialize=True).collect()
    assert calls.value == 10
    calls.value = 0
    graph._l2_normalized(raw(), "a", materialize=False).collect()
    assert calls.value == 20
