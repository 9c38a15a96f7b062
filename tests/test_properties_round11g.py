"""Round-11 property differentials, seventh batch: Pareto frontier,
sweep-line concurrency, clustering coefficient, and link prediction vs
brute-force Python references."""


from __future__ import annotations

import pytest

import datetime as dt
import math
from collections import Counter

from hypothesis import HealthCheck, given, settings, strategies as st

from weather_api_automate_etl_spark.operators import graph, stats, timeseries

SETTINGS = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


# ---------------------------------------------------------------------------
# skyline_2d vs brute-force dominance
# ---------------------------------------------------------------------------


@given(
    pts=st.lists(
        st.tuples(st.integers(0, 10), st.integers(0, 10)),
        min_size=1,
        max_size=25,
    ),
)
@SETTINGS
def test_skyline_matches_brute_force(spark, pts):
    df = spark.createDataFrame(
        [("g", float(mx), float(mn)) for mx, mn in pts],
        "g string, mx double, mn double",
    )
    got = sorted(
        (r["mx"], r["mn"])
        for r in stats.skyline_2d(df, "g", "mx", "mn").collect()
    )
    uniq = set(pts)
    want = sorted(
        (float(mx), float(mn))
        for mx, mn in uniq
        if not any(
            (omx >= mx and omn <= mn and (omx > mx or omn < mn))
            for omx, omn in uniq
        )
    )
    assert got == want


# ---------------------------------------------------------------------------
# concurrency_peak vs python sweep line
# ---------------------------------------------------------------------------


@given(
    ivs=st.lists(
        st.tuples(st.integers(0, 120), st.integers(0, 60)),
        min_size=1,
        max_size=20,
    ),
)
@SETTINGS
@pytest.mark.slow
def test_concurrency_peak_matches_python_sweep(spark, ivs):
    t0 = dt.datetime(2024, 1, 1)
    df = spark.createDataFrame(
        [
            ("g", t0 + dt.timedelta(seconds=s), float(d))
            for s, d in ivs
        ],
        "g string, s timestamp_ntz, dur double",
    )
    (r,) = timeseries.concurrency_peak(df, "g", "s", "dur").collect()
    # e = s + max(1, floor(dur)); starts sort before ends at equal t
    pts = []
    for s, d in ivs:
        e = s + max(1, math.floor(d))
        pts.append((s, 1))
        pts.append((e, -1))
    groups = Counter(pts)
    load, peak = 0, 0
    for (t, delta) in sorted(groups, key=lambda p: (p[0], -p[1])):
        load += delta * groups[(t, delta)]
        peak = max(peak, load)
    assert r["n_intervals"] == len(ivs)
    assert r["peak_concurrency"] == peak


# ---------------------------------------------------------------------------
# local_clustering vs brute force
# ---------------------------------------------------------------------------

_edges_st = st.lists(
    st.tuples(st.integers(0, 8), st.integers(0, 8)).filter(
        lambda e: e[0] < e[1]
    ),
    min_size=1,
    max_size=18,
    unique=True,
)


@given(edges=_edges_st)
@SETTINGS
@pytest.mark.slow
def test_local_clustering_matches_brute_force(spark, edges):
    df = spark.createDataFrame(edges, "id_a long, id_b long")
    got = {
        r["doc_id"]: (r["degree"], r["n_triangles"], r["lcc"])
        for r in graph.local_clustering(df).collect()
    }
    es = {frozenset(e) for e in edges}
    adj: dict[int, set[int]] = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    want = {}
    for v, nb in adj.items():
        deg = len(nb)
        if deg < 2:
            continue
        tri = sum(
            1
            for x in nb
            for y in nb
            if x < y and frozenset((x, y)) in es
        )
        want[v] = (deg, tri, round(2.0 * tri / (deg * (deg - 1)), 6))
    assert got == want


# ---------------------------------------------------------------------------
# common_neighbor_scores vs brute force
# ---------------------------------------------------------------------------


@given(edges=_edges_st, min_common=st.sampled_from([1, 2]))
@SETTINGS
@pytest.mark.slow
def test_link_prediction_matches_brute_force(spark, edges, min_common):
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {
        (r["id_a"], r["id_b"]): (r["common"], r["jaccard"], r["adamic_adar"])
        for r in graph.common_neighbor_scores(
            df, min_common=min_common
        ).collect()
    }
    adj: dict[int, set[int]] = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    es = {frozenset(e) for e in edges}
    nodes = sorted(adj)
    want = {}
    for i, a in enumerate(nodes):
        for b in nodes[i + 1:]:
            if frozenset((a, b)) in es:
                continue  # existing edges are excluded
            shared = adj[a] & adj[b]
            if len(shared) < min_common:
                continue
            jac = round(
                len(shared) / (len(adj[a]) + len(adj[b]) - len(shared)), 6
            )
            aa = round(
                sum(1.0 / math.log(len(adj[w])) for w in shared), 6
            )
            want[(a, b)] = (len(shared), jac, aa)
    assert got == want
