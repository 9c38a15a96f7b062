"""Round-11 property differentials, fifth batch: multiple-testing
control, leakage-safe encoding, k-sample ranks, and feature prep vs
independent Python references."""


from __future__ import annotations

import pytest

from collections import Counter

from hypothesis import HealthCheck, given, settings, strategies as st
from pyspark.sql import functions as F

from weather_api_automate_etl_spark.operators import sampling, stats

SETTINGS = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


# ---------------------------------------------------------------------------
# bh_fdr vs python step-up
# ---------------------------------------------------------------------------


@given(
    ps=st.lists(
        st.integers(0, 1000).map(lambda x: x / 1000.0),
        min_size=1,
        max_size=25,
    ),
    q=st.sampled_from([0.05, 0.1, 0.25]),
)
@SETTINGS
def test_bh_fdr_matches_python_stepup(spark, ps, q):
    df = spark.createDataFrame(
        [(f"t{i}", p) for i, p in enumerate(ps)], "k string, p double"
    )
    got = {
        r["k"]: (r["rank"], r["significant"])
        for r in stats.bh_fdr(df, "k", "p", q=q).collect()
    }
    order = sorted(range(len(ps)), key=lambda i: (ps[i], f"t{i}"))
    m = len(ps)
    kstar = 0
    for rank, i in enumerate(order, start=1):
        if ps[i] <= rank / m * q:
            kstar = rank
    for rank, i in enumerate(order, start=1):
        assert got[f"t{i}"] == (rank, rank <= kstar)


# ---------------------------------------------------------------------------
# target_encode_oof vs python out-of-fold means
# ---------------------------------------------------------------------------


@given(
    rows=st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 5)),
        min_size=1,
        max_size=30,
    ),
    k=st.sampled_from([2, 3, 5]),
)
@SETTINGS
@pytest.mark.slow
def test_target_encode_oof_matches_python(spark, rows, k):
    data = [(i, f"c{c}", y) for i, (c, y) in enumerate(rows)]
    df = spark.createDataFrame(data, "id long, cat string, y long")
    got = {
        r["id"]: (r["fold"], r["te"])
        for r in sampling.target_encode_oof(df, "id", "cat", "y", k=k)
        .collect()
    }
    # reproduce the content-hash fold with the module's own kfold (the
    # fold rule is pinned elsewhere; HERE we pin the out-of-fold math)
    folds = {
        r["id"]: r["fold"]
        for r in sampling.kfold_assign(df, "id", k).collect()
    }
    agg: dict[tuple[str, int], list[int]] = {}
    for i, (c, y) in enumerate(rows):
        agg.setdefault((f"c{c}", folds[i]), []).append(y)
    for i, (c, y) in enumerate(rows):
        cat, fold = f"c{c}", folds[i]
        others = [
            v
            for (cc, ff), vs in agg.items()
            if cc == cat and ff != fold
            for v in vs
        ]
        want = sum(others) / len(others) if others else None
        te = got[i][1]
        assert got[i][0] == fold
        if want is None:
            assert te is None
        else:
            assert abs(te - want) < 1e-9


# ---------------------------------------------------------------------------
# kruskal_wallis vs python tie-corrected H
# ---------------------------------------------------------------------------


@given(
    groups=st.lists(
        st.lists(st.integers(0, 8), min_size=1, max_size=10),
        min_size=2,
        max_size=4,
    ),
)
@SETTINGS
@pytest.mark.slow
def test_kruskal_wallis_matches_python(spark, groups):
    rows = [(f"g{i}", float(v)) for i, g in enumerate(groups) for v in g]
    df = spark.createDataFrame(rows, "g string, v double")
    got = {
        r["g"]: (r["n"], r["rank_sum"], r["h_stat"])
        for r in stats.kruskal_wallis(df, "v", "g").collect()
    }
    pooled = [v for g in groups for v in g]
    n = len(pooled)
    order = sorted(range(n), key=lambda i: pooled[i])
    ranks = [0.0] * n
    i = 0
    while i < n:
        j = i
        while j + 1 < n and pooled[order[j + 1]] == pooled[order[i]]:
            j += 1
        r_ = (i + j) / 2 + 1
        for t in range(i, j + 1):
            ranks[order[t]] = r_
        i = j + 1
    pos = 0
    rank_sums = []
    for g in groups:
        rank_sums.append(sum(ranks[pos:pos + len(g)]))
        pos += len(g)
    ties = Counter(pooled)
    tie = sum(t**3 - t for t in ties.values())
    correction = 1 - tie / (n**3 - n) if n > 1 else 0.0
    for i, g in enumerate(groups):
        assert got[f"g{i}"][0] == len(g)
        assert abs(got[f"g{i}"][1] - rank_sums[i]) < 1e-9
    if correction > 0:
        h = (
            12.0 / (n * (n + 1))
            * sum(rs**2 / len(g) for rs, g in zip(rank_sums, groups))
            - 3.0 * (n + 1)
        ) / correction
        assert abs(got["g0"][2] - h) < 1e-5
    else:
        assert got["g0"][2] is None  # all values tied


# ---------------------------------------------------------------------------
# minmax_scale vs python per-group scaling
# ---------------------------------------------------------------------------


@given(
    rows=st.lists(
        st.tuples(st.integers(0, 2), st.integers(-20, 20)),
        min_size=1,
        max_size=25,
    ),
)
@SETTINGS
@pytest.mark.slow
def test_minmax_scale_matches_python(spark, rows):
    df = spark.createDataFrame(
        [(i, f"g{g}", float(v)) for i, (g, v) in enumerate(rows)],
        "id long, g string, v double",
    )
    got = {
        r["id"]: r["v_scaled"]
        for r in sampling.minmax_scale(df, "g", "v").collect()
    }
    assert set(got) == set(range(len(rows)))  # row-preserving
    by_g: dict[int, list[int]] = {}
    for g, v in rows:
        by_g.setdefault(g, []).append(v)
    for i, (g, v) in enumerate(rows):
        lo, hi = min(by_g[g]), max(by_g[g])
        if hi > lo:
            assert got[i] == round((v - lo) / (hi - lo), 6)
        else:
            assert got[i] is None  # constant group


# ---------------------------------------------------------------------------
# rare_category_collapse vs python threshold
# ---------------------------------------------------------------------------


@given(
    cats=st.lists(st.integers(0, 6), min_size=1, max_size=40),
    frac=st.sampled_from([0.05, 0.1, 0.3]),
)
@SETTINGS
@pytest.mark.slow
def test_rare_collapse_matches_python(spark, cats, frac):
    df = spark.createDataFrame(
        [(i, f"c{c}") for i, c in enumerate(cats)], "id long, cat string"
    )
    got = {
        r["id"]: r["cat_collapsed"]
        for r in stats.rare_category_collapse(df, "cat", min_frac=frac)
        .collect()
    }
    counts = Counter(cats)
    n = len(cats)
    for i, c in enumerate(cats):
        rare = counts[c] < frac * n
        assert got[i] == ("__other__" if rare else f"c{c}")
