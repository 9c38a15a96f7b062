"""Round-11 property differentials: the deep-reviewed operators agree
with INDEPENDENT plain-Python references on arbitrary inputs — the class
of check the DuckDB oracle cannot provide (its SQL was written with the
same semantics, so a shared-semantics bug passes both twins)."""


from __future__ import annotations

import pytest

from collections import Counter

from hypothesis import HealthCheck, given, settings, strategies as st
from pyspark.sql import functions as F

from weather_api_automate_etl_spark.operators import (
    graph,
    joins,
    sampling,
    stats,
    windows,
)

SETTINGS = settings(
    max_examples=8,  # each example is a Spark job; keep the suite fast
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

_edges_st = st.lists(
    st.tuples(st.integers(0, 9), st.integers(0, 9)).filter(
        lambda e: e[0] < e[1]
    ),
    min_size=1,
    max_size=20,
    unique=True,
)


# ---------------------------------------------------------------------------
# asof_join vs pandas merge_asof
# ---------------------------------------------------------------------------


@given(
    lts=st.lists(st.integers(0, 50), min_size=1, max_size=15),
    rts=st.lists(st.integers(0, 50), min_size=1, max_size=15, unique=True),
    inclusive=st.booleans(),
)
@SETTINGS
def test_asof_join_matches_pandas_merge_asof(spark, lts, rts, inclusive):
    import pandas as pd

    left = spark.createDataFrame(
        [(1, t, i) for i, t in enumerate(lts)], "k int, ts long, lid int"
    )
    right = spark.createDataFrame(
        [(1, t, t * 10) for t in rts], "k int, ts long, payload long"
    )
    got = {
        r["lid"]: r["payload"]
        for r in joins.asof_join(
            left, right, "k", "ts", "ts", ["payload"], inclusive=inclusive
        ).collect()
    }
    lpd = pd.DataFrame({"ts": lts, "lid": range(len(lts))}).sort_values(
        ["ts", "lid"]
    )
    rpd = pd.DataFrame({"ts": sorted(rts)})
    rpd["payload"] = rpd["ts"] * 10
    want_pd = pd.merge_asof(
        lpd,
        rpd,
        on="ts",
        direction="backward",
        allow_exact_matches=inclusive,
    )
    want = {
        int(r.lid): (None if pd.isna(r.payload) else int(r.payload))
        for r in want_pd.itertuples()
    }
    assert got == want


# ---------------------------------------------------------------------------
# caliper_match vs brute-force nearest control
# ---------------------------------------------------------------------------


@given(
    units=st.lists(
        st.tuples(st.integers(0, 30), st.booleans()),
        min_size=2,
        max_size=20,
    ),
    caliper=st.integers(1, 10),
)
@SETTINGS
def test_caliper_match_matches_brute_force(spark, units, caliper):
    rows = [
        ("b", float(s), bool(t), i) for i, (s, t) in enumerate(units)
    ]
    df = spark.createDataFrame(rows, "blk string, s double, t boolean, u long")
    got = {
        r["treated_id"]: (r["control_id"], r["dist"], r["matched"])
        for r in sampling.caliper_match(
            df, "blk", "s", F.col("t"), "u", float(caliper)
        ).collect()
    }
    controls = [(s, i) for i, (s, t) in enumerate(units) if not t]
    treated = [(s, i) for i, (s, t) in enumerate(units) if t]
    assert set(got) == {i for _, i in treated}
    for s, i in treated:
        # the operator's documented rule: nearest at-or-below = the
        # latest control in (score, unit) order (ties -> HIGHEST id);
        # nearest above = the earliest (ties -> LOWEST id); equidistant
        # sides break toward the below (lower-score) side
        below = [c for c in controls if c[0] <= s]
        above = [c for c in controls if c[0] > s]
        lo = max(below) if below else None
        hi = min(above) if above else None
        if lo is not None and (hi is None or (s - lo[0]) <= (hi[0] - s)):
            best = lo
        else:
            best = hi
        if best is None:
            assert got[i] == (None, None, False)
            continue
        d = abs(best[0] - s)
        if d <= caliper:
            assert got[i] == (best[1], float(d), True)
        else:
            assert got[i] == (None, None, False)


# ---------------------------------------------------------------------------
# triangle_counts vs brute force
# ---------------------------------------------------------------------------


@given(edges=_edges_st)
@SETTINGS
@pytest.mark.slow
def test_triangle_counts_matches_brute_force(spark, edges):
    df = spark.createDataFrame(edges, "id_a long, id_b long")
    got = {
        r["doc_id"]: r["n_triangles"]
        for r in graph.triangle_counts(df).collect()
    }
    es = set(edges)
    nodes = sorted({n for e in edges for n in e})
    want: Counter = Counter()
    for i, a in enumerate(nodes):
        for b in nodes[i + 1:]:
            for c in nodes[nodes.index(b) + 1:]:
                if (a, b) in es and (b, c) in es and (a, c) in es:
                    want[a] += 1
                    want[b] += 1
                    want[c] += 1
    assert got == dict(want)


# ---------------------------------------------------------------------------
# label_propagation vs python synchronous LPA (same tie rule)
# ---------------------------------------------------------------------------


@given(edges=_edges_st, rounds=st.integers(1, 3))
@SETTINGS
@pytest.mark.slow
def test_label_propagation_matches_python_sync(spark, edges, rounds):
    df = spark.createDataFrame(edges, "id_a long, id_b long")
    got = {
        r["doc_id"]: r["label"]
        for r in graph.label_propagation(df, rounds=rounds).collect()
    }
    adj: dict[int, list[int]] = {}
    for a, b in edges:
        adj.setdefault(a, []).append(b)
        adj.setdefault(b, []).append(a)
    labels = {n: n for n in adj}
    for _ in range(rounds):
        nxt = {}
        for n, neigh in adj.items():
            cnt = Counter(labels[m] for m in neigh)
            # most frequent neighbour label, smallest label on ties
            nxt[n] = min(cnt, key=lambda l: (-cnt[l], l))
        labels = nxt
    assert got == labels


# ---------------------------------------------------------------------------
# k_core vs python synchronous peeling
# ---------------------------------------------------------------------------


@given(edges=_edges_st, k=st.integers(2, 4))
@SETTINGS
@pytest.mark.slow
def test_k_core_matches_python_peeling(spark, edges, k):
    df = spark.createDataFrame(edges, "id_a long, id_b long")
    got = {
        r["doc_id"]: r["core_degree"]
        for r in graph.k_core(df, k=k).collect()
    }
    es = {frozenset(e) for e in edges}
    while True:
        deg = Counter(n for e in es for n in e)
        bad = {n for n, d in deg.items() if d < k}
        if not bad:
            break
        es = {e for e in es if not (e & bad)}
    deg = Counter(n for e in es for n in e)
    assert got == dict(deg)


# ---------------------------------------------------------------------------
# longest_streak vs python gaps-and-islands
# ---------------------------------------------------------------------------


@given(
    days=st.lists(st.integers(0, 40), min_size=1, max_size=25),
)
@SETTINGS
def test_longest_streak_matches_python(spark, days):
    import datetime as dt

    base = dt.date(2024, 1, 1)
    rows = [("u", base + dt.timedelta(days=d)) for d in days]
    df = spark.createDataFrame(rows, "k string, d date")
    (r,) = windows.longest_streak(df, "k", "d").collect()
    uniq = sorted(set(days))
    best_len, best_start, cur_len, cur_start = 1, uniq[0], 1, uniq[0]
    for prev, d in zip(uniq, uniq[1:]):
        if d == prev + 1:
            cur_len += 1
        else:
            cur_len, cur_start = 1, d
        # ties keep the EARLIEST streak start (strict > never replaces)
        if cur_len > best_len:
            best_len, best_start = cur_len, cur_start
    assert r["n_active_days"] == len(uniq)
    assert r["longest_streak"] == best_len
    assert r["streak_start"] == base + dt.timedelta(days=best_start)


# ---------------------------------------------------------------------------
# gains_table (exact mode) vs python ntile reference
# ---------------------------------------------------------------------------


@given(
    rows=st.lists(
        st.tuples(st.integers(0, 20), st.booleans()),
        min_size=4,
        max_size=40,
    ),
    n_buckets=st.integers(2, 5),
)
@SETTINGS
def test_gains_table_exact_matches_python_ntile(spark, rows, n_buckets):
    df = spark.createDataFrame(
        [(float(s), bool(y), i) for i, (s, y) in enumerate(rows)],
        "s double, y boolean, i long",
    )
    got = {
        r["bucket"]: (r["n"], r["responders"])
        for r in stats.gains_table(
            df, "s", F.col("y"), n_buckets=n_buckets, order_cols=["i"]
        ).collect()
    }
    # SQL ntile over (s DESC, i ASC): first (n mod k) buckets get one
    # extra row
    ordered = sorted(
        [(s, i, y) for i, (s, y) in enumerate(rows)],
        key=lambda r: (-r[0], r[1]),
    )
    n = len(ordered)
    base, extra = divmod(n, n_buckets)
    want = {}
    pos = 0
    for b in range(1, n_buckets + 1):
        size = base + (1 if b <= extra else 0)
        chunk = ordered[pos:pos + size]
        pos += size
        if chunk:
            want[b] = (len(chunk), sum(1 for _, _, y in chunk if y))
    assert got == want
