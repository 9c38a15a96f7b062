"""Wave-17 operator tests: Poisson bootstrap, mutual information,
bounded Bellman-Ford, grid-blocked geo join, and containment pairs."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_SMALL
from weather_api_automate_etl_spark.operators import dedup, graph, joins, stats


# ---------------------------------------------------------------------------
# Poisson bootstrap CI
# ---------------------------------------------------------------------------


def test_bootstrap_ci_brackets_mean_and_is_deterministic(spark):
    ev = spark.read.parquet(f"{SF_SMALL}/events.parquet")
    a = stats.poisson_bootstrap_ci(ev, "event_type", "value", "event_id").collect()
    b = stats.poisson_bootstrap_ci(ev, "event_type", "value", "event_id").collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))  # replayable draws
    for r in a:
        assert r["ci_lo"] <= r["mean"] <= r["ci_hi"], r
        # a ~200-row group's 94% CI must be a sane, nonzero-width bracket
        assert 0 < r["ci_hi"] - r["ci_lo"] < 60


def test_bootstrap_ci_width_shrinks_with_n(spark):
    """4x the rows -> roughly half the CI width (1/sqrt(n) scaling)."""
    rows = [(i, "small", float((i * 37) % 100)) for i in range(200)]
    rows += [(i + 1000, "big", float((i * 37) % 100)) for i in range(3200)]
    df = spark.createDataFrame(rows, "event_id long, g string, value double")
    out = {r["g"]: r["ci_hi"] - r["ci_lo"] for r in
           stats.poisson_bootstrap_ci(df, "g", "value", "event_id").collect()}
    assert out["big"] < out["small"] * 0.6
    with pytest.raises(ValueError, match="n_boot"):
        stats.poisson_bootstrap_ci(df, "g", "value", "event_id", n_boot=2)


def test_bootstrap_weights_are_poisson_one(spark):
    """Mean replicate weight ~ 1 (mass conservation of the resampler)."""
    df = spark.createDataFrame(
        [(i, "g", 1.0) for i in range(2000)],
        "event_id long, g string, value double",
    )
    # constant values: every replicate mean is exactly 1 regardless of
    # weights -> CI collapses onto the mean
    (r,) = stats.poisson_bootstrap_ci(df, "g", "value", "event_id").collect()
    assert (r["mean"], r["ci_lo"], r["ci_hi"]) == (1.0, 1.0, 1.0)


# ---------------------------------------------------------------------------
# mutual information
# ---------------------------------------------------------------------------


def test_mutual_info_identical_columns_is_entropy(spark):
    df = spark.createDataFrame(
        [(i, str(i % 4), str(i % 4)) for i in range(400)],
        "id long, x string, y string",
    )
    (r,) = stats.mutual_information(df, "x", "y").collect()
    assert r["mi"] == pytest.approx(math.log(4), abs=1e-6)
    assert r["nmi"] == 1.0
    assert r["h_x"] == r["h_y"] == pytest.approx(math.log(4), abs=1e-6)


def test_mutual_info_independent_is_zero(spark):
    df = spark.createDataFrame(
        [(i, str(i % 4), str((i // 4) % 5)) for i in range(400)],
        "id long, x string, y string",
    )
    (r,) = stats.mutual_information(df, "x", "y").collect()
    assert r["mi"] == pytest.approx(0.0, abs=1e-9)
    assert r["h_y"] == pytest.approx(math.log(5), abs=1e-6)


def test_mutual_info_constant_column_nmi_null(spark):
    df = spark.createDataFrame(
        [(i, "only", str(i % 3)) for i in range(30)],
        "id long, x string, y string",
    )
    (r,) = stats.mutual_information(df, "x", "y").collect()
    assert r["h_x"] == 0.0 and r["mi"] == 0.0 and r["nmi"] is None


# ---------------------------------------------------------------------------
# bounded Bellman-Ford
# ---------------------------------------------------------------------------


def _wedges(spark, triples):
    return spark.createDataFrame(triples, "src long, dst long, w long")


def test_sssp_prefers_cheap_multi_hop_path(spark):
    e = _wedges(spark, [(1, 2, 10), (2, 3, 10), (1, 3, 25), (3, 4, 1)])
    s = spark.createDataFrame([(1,)], "node long")
    got = {r["node"]: r["dist"] for r in
           graph.sssp_bounded(e, s, rounds=3).collect()}
    assert got == {1: 0, 2: 10, 3: 20, 4: 21}


def test_sssp_round_budget_limits_hops(spark):
    e = _wedges(spark, [(1, 2, 10), (2, 3, 10), (1, 3, 25), (3, 4, 1)])
    s = spark.createDataFrame([(1,)], "node long")
    got = {r["node"]: r["dist"] for r in
           graph.sssp_bounded(e, s, rounds=1).collect()}
    assert got == {1: 0, 2: 10, 3: 25}  # one relaxation: direct edges only
    with pytest.raises(ValueError, match="rounds"):
        graph.sssp_bounded(e, s, rounds=-1)


def test_sssp_multi_source_and_directed(spark):
    e = _wedges(spark, [(1, 2, 5), (3, 2, 1)])
    s = spark.createDataFrame([(1,), (3,)], "node long")
    got = {r["node"]: r["dist"] for r in
           graph.sssp_bounded(e, s, rounds=2, directed=True).collect()}
    assert got == {1: 0, 3: 0, 2: 1}  # min over sources wins
    undirected = {r["node"]: r["dist"] for r in
                  graph.sssp_bounded(e, s, rounds=2).collect()}
    assert undirected == {1: 0, 3: 0, 2: 1}


def test_sssp_agrees_with_bfs_on_unit_weights(spark):
    e = _wedges(spark, [(1, 2, 1), (2, 3, 1), (3, 4, 1)])
    s = spark.createDataFrame([(1,)], "node long")
    sssp = {r["node"]: r["dist"] for r in
            graph.sssp_bounded(e, s, rounds=3).collect()}
    bfs = {r["node"]: r["hops"] for r in graph.bfs_distances(
        e.select("src", "dst"), s, max_hops=3).collect()}
    assert sssp == bfs


# ---------------------------------------------------------------------------
# geo radius join
# ---------------------------------------------------------------------------


def test_geo_join_finds_only_in_radius_pairs(spark):
    L = spark.createDataFrame(
        [(1, 50.0, 8.0), (2, 10.0, 10.0)], "lid long, lat double, lon double"
    )
    R = spark.createDataFrame(
        [(7, 50.1, 8.1), (8, -40.0, 100.0), (9, 50.0, 8.0)],
        "rid long, rlat double, rlon double",
    )
    out = joins.geo_radius_join(
        L, R, radius_km=50.0, cell_deg=1.0,
        lat_l="lat", lon_l="lon", lat_r="rlat", lon_r="rlon",
    ).collect()
    pairs = {(r["lid"], r["rid"]): r["dist_km"] for r in out}
    assert set(pairs) == {(1, 7), (1, 9)}
    assert pairs[(1, 9)] == 0.0
    assert pairs[(1, 7)] == pytest.approx(13.2145, abs=0.01)


def test_geo_join_neighbor_cells_are_not_missed(spark):
    """Two points ~1.11 km apart straddling a cell boundary must pair."""
    L = spark.createDataFrame([(1, 0.999, 0.0)], "lid long, lat double, lon double")
    R = spark.createDataFrame([(2, 1.009, 0.0)], "rid long, rlat double, rlon double")
    out = joins.geo_radius_join(
        L, R, radius_km=5.0, cell_deg=1.0,
        lat_l="lat", lon_l="lon", lat_r="rlat", lon_r="rlon",
    ).collect()
    assert len(out) == 1


def test_geo_join_rejects_uncovering_cell(spark):
    df = spark.createDataFrame([(1, 0.0, 0.0)], "lid long, lat double, lon double")
    with pytest.raises(ValueError, match="cell_deg"):
        joins.geo_radius_join(df, df, radius_km=500.0, cell_deg=1.0,
                              lat_l="lat", lon_l="lon",
                              lat_r="lat", lon_r="lon")
    with pytest.raises(ValueError, match="radius_km"):
        joins.geo_radius_join(df, df, radius_km=0.0, cell_deg=1.0,
                              lat_l="lat", lon_l="lon",
                              lat_r="lat", lon_r="lon")


def test_haversine_known_distance(spark):
    """One degree of latitude at the equator ~ 111.19 km on R=6371."""
    df = spark.range(1).select(
        joins.haversine_km(F.lit(0.0), F.lit(0.0), F.lit(1.0), F.lit(0.0))
        .alias("d")
    )
    assert df.head()["d"] == pytest.approx(111.1949, abs=0.001)


# ---------------------------------------------------------------------------
# containment pairs
# ---------------------------------------------------------------------------


def test_containment_catches_doc_inside_doc(spark):
    rows = [
        (1, "alpha beta gamma", "en"),
        (2, "alpha beta gamma delta epsilon zeta eta theta", "en"),
        (3, "totally different words here", "en"),
        (4, "alpha beta gamma", "fr"),  # other block: never paired
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    out = {(r["id_a"], r["id_b"]): r for r in dedup.containment_pairs(
        df, "doc_id", "text", "lang", threshold=0.9).collect()}
    assert set(out) == {(1, 2)}
    r = out[(1, 2)]
    assert r["c_ab"] == 1.0          # doc 1 fully inside doc 2
    assert r["c_ba"] == 0.375        # 3 of doc 2's 8 tokens
    assert r["containment"] == 1.0


def test_containment_jaccard_blindspot(spark):
    """The exact pair containment flags is invisible to Jaccard at the
    same threshold — the reason the asymmetric measure exists."""
    rows = [
        (1, "alpha beta gamma", "en"),
        (2, "alpha beta gamma " + " ".join(f"w{i}" for i in range(37)), "en"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    cont = dedup.containment_pairs(df, "doc_id", "text", "lang", 0.9).collect()
    jac = dedup.ngram_jaccard_pairs(df, "doc_id", "text", "lang", 0.9).collect()
    assert len(cont) == 1 and cont[0]["containment"] == 1.0
    assert jac == []  # jaccard = 3/40 = 0.075
