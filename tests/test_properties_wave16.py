"""Property-based tests for the wave-16-20 operators: the Spark
implementations agree with plain-Python references on arbitrary inputs,
and the structural invariants (bounds, monotonicity, scale invariance)
hold on anything hypothesis throws at them."""


from __future__ import annotations

import pytest

import math

import numpy as np
from hypothesis import HealthCheck, given, settings, strategies as st
from pyspark.sql import Row, functions as F

from weather_api_automate_etl_spark.operators import (
    graph,
    stats,
    timeseries,
)
from weather_api_automate_etl_spark.sources import multimodal

SETTINGS = settings(
    max_examples=8,  # each example is a Spark job; keep the suite fast
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


# ---------------------------------------------------------------------------
# Spearman: bounds, tie handling, reference agreement
# ---------------------------------------------------------------------------


@given(
    xs=st.lists(st.integers(min_value=-50, max_value=50),
                min_size=3, max_size=40),
    ys=st.lists(st.integers(min_value=-50, max_value=50),
                min_size=3, max_size=40),
)
@SETTINGS
def test_spearman_matches_rank_pearson_reference(spark, xs, ys):
    n = min(len(xs), len(ys))
    xs, ys = xs[:n], ys[:n]
    df = spark.createDataFrame(
        [("g", float(x), float(y)) for x, y in zip(xs, ys)],
        "grp string, x double, y double",
    )
    (row,) = stats.spearman_by_group(df, "grp", "x", "y").collect()

    def avg_ranks(vals):
        order = sorted(range(n), key=lambda i: vals[i])
        ranks = [0.0] * n
        i = 0
        while i < n:
            j = i
            while j + 1 < n and vals[order[j + 1]] == vals[order[i]]:
                j += 1
            r = (i + j) / 2 + 1
            for k in range(i, j + 1):
                ranks[order[k]] = r
            i = j + 1
        return ranks

    rx, ry = avg_ranks(xs), avg_ranks(ys)
    mx = (n + 1) / 2
    sxy = sum((a - mx) * (b - mx) for a, b in zip(rx, ry))
    sxx = sum((a - mx) ** 2 for a in rx)
    syy = sum((b - mx) ** 2 for b in ry)
    if sxx == 0 or syy == 0:
        assert row["spearman_rho"] is None
    else:
        ref = sxy / math.sqrt(sxx * syy)
        assert row["spearman_rho"] is not None
        assert abs(row["spearman_rho"] - ref) < 1e-6
        assert -1.0 <= row["spearman_rho"] <= 1.0


# ---------------------------------------------------------------------------
# Holt: replay agreement on arbitrary series
# ---------------------------------------------------------------------------


@given(ys=st.lists(st.integers(min_value=-100, max_value=100),
                   min_size=2, max_size=30))
@SETTINGS
def test_holt_matches_python_fold(spark, ys):
    df = spark.createDataFrame(
        [("k", i, float(v)) for i, v in enumerate(ys)],
        "k string, t int, y double",
    )
    (row,) = timeseries.holt_linear(df, "k", "t", "y").collect()
    lvl, trd = float(ys[0]), float(ys[1] - ys[0])
    for y in ys[1:]:
        nl = 0.5 * y + 0.5 * (lvl + trd)
        trd = 0.25 * (nl - lvl) + 0.75 * trd
        lvl = nl
    # Spark (and DuckDB) round HALF-UP on the exact binary double;
    # Python's round() is banker's — dyadic alpha/beta make exact .5
    # ties REACHABLE here (e.g. ys=[1,0,0,0,0] -> -0.6953125), so the
    # reference must round the same way or it drifts one ulp-of-1e-6
    assert row["level"] == _round_half_up(lvl)
    assert row["trend"] == _round_half_up(trd)


def _round_half_up(x: float, digits: int = 6) -> float:
    from decimal import ROUND_HALF_UP, Decimal

    q = Decimal(1).scaleb(-digits)
    return float(Decimal(x).quantize(q, rounding=ROUND_HALF_UP))


# ---------------------------------------------------------------------------
# Kaplan-Meier: bounds + monotone non-increasing + lifelines-style ref
# ---------------------------------------------------------------------------


@given(
    subjects=st.lists(
        st.tuples(st.integers(min_value=1, max_value=15), st.booleans()),
        min_size=1, max_size=40,
    )
)
@SETTINGS
def test_km_matches_reference_and_is_monotone(spark, subjects):
    df = spark.createDataFrame(
        [("g", t, int(obs)) for t, obs in subjects],
        "g string, t long, obs int",
    )
    rows = sorted(
        stats.kaplan_meier(df, "g", "t", F.col("obs") == 1).collect(),
        key=lambda r: r["t"],
    )
    # pure-python KM
    times = sorted({t for t, obs in subjects if obs})
    s, ref = 1.0, {}
    for t in times:
        n = sum(1 for d, _ in subjects if d >= t)
        d = sum(1 for dd, obs in subjects if dd == t and obs)
        s *= 1 - d / n
        ref[t] = round(s, 6)
    assert [r["t"] for r in rows] == times
    prev = 1.0
    for r in rows:
        assert abs(r["survival"] - ref[r["t"]]) < 1e-6
        assert 0.0 <= r["survival"] <= prev + 1e-9
        prev = r["survival"]


# ---------------------------------------------------------------------------
# dHash: scale invariance + reference agreement on random rasters
# ---------------------------------------------------------------------------


@given(seed=st.integers(min_value=0, max_value=2**31 - 1),
       scale=st.integers(min_value=1, max_value=3))
@SETTINGS
def test_dhash_reference_and_scale_invariance(spark, seed, scale):
    from weather_api_automate_etl_spark.sources import codecs

    rng = np.random.default_rng(seed)
    base = rng.integers(0, 256, size=(8, 9), dtype=np.uint8)
    img = np.kron(base, np.ones((scale, scale), dtype=np.uint8))
    px = np.repeat(img[:, :, None], 3, axis=2)
    df = spark.createDataFrame(
        [Row(asset_id=1, media_type="image/x-portable-pixmap",
             content=bytearray(codecs.encode_ppm(px)),
             byte_len=px.size + 20)],
        multimodal.ASSET_SCHEMA,
    )
    (row,) = multimodal.image_dhash(df).collect()
    bits = base[:, 1:].astype(int) > base[:, :-1].astype(int)
    ref = "".join(
        f"{int((b << np.arange(7, -1, -1)).sum()):02x}" for b in bits
    )
    assert row["dhash"] == ref  # any integer upscale hashes identically


# ---------------------------------------------------------------------------
# BFS == SSSP on unit weights, for random graphs
# ---------------------------------------------------------------------------


@given(
    edges=st.lists(
        st.tuples(st.integers(min_value=0, max_value=12),
                  st.integers(min_value=0, max_value=12)),
        min_size=1, max_size=30,
    ),
    src=st.integers(min_value=0, max_value=12),
)
@SETTINGS
@pytest.mark.slow
def test_bfs_equals_unit_sssp_and_python_bfs(spark, edges, src):
    e = spark.createDataFrame(
        [(a, b, 1) for a, b in edges], "src long, dst long, w long"
    )
    s = spark.createDataFrame([(src,)], "node long")
    bfs = {r["node"]: r["hops"] for r in
           graph.bfs_distances(e.select("src", "dst"), s,
                               max_hops=4).collect()}
    sssp = {r["node"]: r["dist"] for r in
            graph.sssp_bounded(e, s, rounds=4).collect()}
    assert bfs == sssp
    # python BFS reference (undirected, capped at 4)
    adj: dict[int, set[int]] = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    ref, frontier = {src: 0}, {src}
    for hop in range(1, 5):
        nxt = {v for u in frontier for v in adj.get(u, ()) if v not in ref}
        for v in nxt:
            ref[v] = hop
        frontier = nxt
        if not frontier:
            break
    assert bfs == ref
