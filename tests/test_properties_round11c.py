"""Round-11 property differentials, third batch: the nonparametric-test
and information-theory family vs independent Python references."""


from __future__ import annotations

import pytest

import math
from collections import Counter

from hypothesis import HealthCheck, given, settings, strategies as st
from pyspark.sql import functions as F

from weather_api_automate_etl_spark.operators import stats

SETTINGS = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _avg_ranks(vals):
    """Average ranks with ties, 1-based."""
    order = sorted(range(len(vals)), key=lambda i: vals[i])
    ranks = [0.0] * len(vals)
    i = 0
    while i < len(vals):
        j = i
        while j + 1 < len(vals) and vals[order[j + 1]] == vals[order[i]]:
            j += 1
        r = (i + j) / 2 + 1
        for k in range(i, j + 1):
            ranks[order[k]] = r
        i = j + 1
    return ranks


# ---------------------------------------------------------------------------
# wilcoxon_signed_rank vs python
# ---------------------------------------------------------------------------


@given(
    pairs=st.lists(
        st.tuples(st.integers(0, 10), st.integers(0, 10)),
        min_size=1,
        max_size=25,
    ),
)
@SETTINGS
def test_wilcoxon_matches_python(spark, pairs):
    df = spark.createDataFrame(
        [("g", x, y) for x, y in pairs], "g string, x long, y long"
    )
    out = stats.wilcoxon_signed_rank(df, "g", "x", "y").collect()
    ds = [x - y for x, y in pairs if x != y]
    if not ds:
        assert out == []
        return
    (r,) = out
    n = len(ds)
    ranks = _avg_ranks([abs(d) for d in ds])
    w_plus = sum(rk for d, rk in zip(ds, ranks) if d > 0)
    ties = Counter(abs(d) for d in ds)
    tie = sum(t**3 - t for t in ties.values())
    var = n * (n + 1) * (2 * n + 1) / 24.0 - tie / 48.0
    assert r["n"] == n
    assert r["w_plus"] == round(w_plus, 6)
    if var > 0:
        z = (w_plus - n * (n + 1) / 4.0) / math.sqrt(var)
        assert abs(r["z"] - z) < 1e-6
    else:
        assert r["z"] is None


# ---------------------------------------------------------------------------
# anova_oneway vs python
# ---------------------------------------------------------------------------


@given(
    groups=st.lists(
        st.lists(st.integers(0, 20), min_size=1, max_size=8),
        min_size=1,
        max_size=4,
    ),
)
@SETTINGS
def test_anova_matches_python(spark, groups):
    rows = [(f"g{i}", v) for i, g in enumerate(groups) for v in g]
    df = spark.createDataFrame(rows, "g string, y long")
    (r,) = stats.anova_oneway(df, "g", "y").collect()
    n = sum(len(g) for g in groups)
    k = len(groups)
    t_term = sum(sum(g) ** 2 / len(g) for g in groups)
    corr = sum(sum(g) for g in groups) ** 2 / n
    q = sum(v * v for g in groups for v in g)
    ssb, ssw = t_term - corr, q - t_term
    assert r["k"] == k and r["n"] == n
    assert abs(r["ssb"] - ssb) < 1e-5
    assert abs(r["ssw"] - ssw) < 1e-5
    if k > 1 and ssw > 1e-9 and n > k:
        f = (ssb / (k - 1)) / (ssw / (n - k))
        assert abs(r["f_stat"] - f) < 1e-4
    elif k < 2 or ssw <= 0:
        assert r["f_stat"] is None


# ---------------------------------------------------------------------------
# ks_two_sample vs python sup|Fa - Fb|
# ---------------------------------------------------------------------------


@given(
    a=st.lists(st.integers(0, 15), min_size=1, max_size=25),
    b=st.lists(st.integers(0, 15), min_size=1, max_size=25),
)
@SETTINGS
@pytest.mark.slow
def test_ks_two_sample_matches_python(spark, a, b):
    da = spark.createDataFrame([(v,) for v in a], "v long")
    db = spark.createDataFrame([(v,) for v in b], "v long")
    (r,) = stats.ks_two_sample(da, db, "v").collect()
    vals = sorted(set(a) | set(b))
    d = max(
        abs(
            sum(1 for x in a if x <= v) / len(a)
            - sum(1 for x in b if x <= v) / len(b)
        )
        for v in vals
    )
    assert r["n_a"] == len(a) and r["n_b"] == len(b)
    assert abs(r["d_stat"] - d) < 1e-6


# ---------------------------------------------------------------------------
# benford_deviation vs python
# ---------------------------------------------------------------------------


@given(
    vals=st.lists(st.integers(1, 99999), min_size=1, max_size=40),
)
@SETTINGS
def test_benford_matches_python(spark, vals):
    df = spark.createDataFrame([("g", v) for v in vals], "g string, v long")
    got = {
        r["digit"]: (r["n"], r["observed_p"], r["chi_square"])
        for r in stats.benford_deviation(df, "g", "v").collect()
    }
    digits = Counter(int(str(v)[0]) for v in vals)
    n = len(vals)
    chi = n * sum(
        (digits.get(d, 0) / n - math.log10(1 + 1 / d)) ** 2
        / math.log10(1 + 1 / d)
        for d in digits  # absent digits contribute nothing (no row)
    )
    assert set(got) == set(digits)
    for d, c in digits.items():
        assert got[d][0] == c
        assert abs(got[d][1] - c / n) < 1e-6
        assert abs(got[d][2] - chi) < 1e-4


# ---------------------------------------------------------------------------
# gini_by_group vs python sorted-rank identity
# ---------------------------------------------------------------------------


@given(
    vals=st.lists(st.integers(0, 50), min_size=1, max_size=30),
)
@SETTINGS
def test_gini_matches_python(spark, vals):
    df = spark.createDataFrame(
        [("g", float(v), i) for i, v in enumerate(vals)],
        "g string, x double, i long",
    )
    (r,) = stats.gini_by_group(df, "g", "x", "i").collect()
    xs = sorted(vals)
    n, sx = len(xs), sum(xs)
    if sx == 0:
        assert r["gini"] is None
        return
    six = sum((i + 1) * x for i, x in enumerate(xs))
    g = (2 * six - (n + 1) * sx) / (n * sx)
    assert r["n_rows"] == n
    assert abs(r["gini"] - g) < 1e-6


# ---------------------------------------------------------------------------
# mutual_information vs python
# ---------------------------------------------------------------------------


@given(
    rows=st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 3)),
        min_size=1,
        max_size=40,
    ),
)
@SETTINGS
@pytest.mark.slow
def test_mutual_information_matches_python(spark, rows):
    df = spark.createDataFrame(
        [(f"x{a}", f"y{b}") for a, b in rows], "x string, y string"
    )
    (r,) = stats.mutual_information(df, "x", "y").collect()
    n = len(rows)
    joint = Counter(rows)
    mx = Counter(a for a, _ in rows)
    my = Counter(b for _, b in rows)
    mi = sum(
        (c / n) * math.log((c / n) / ((mx[a] / n) * (my[b] / n)))
        for (a, b), c in joint.items()
    )
    hx = -sum((c / n) * math.log(c / n) for c in mx.values())
    hy = -sum((c / n) * math.log(c / n) for c in my.values())
    assert r["n"] == n
    assert abs(r["h_x"] - hx) < 1e-6 and abs(r["h_y"] - hy) < 1e-6
    assert abs(r["mi"] - mi) < 1e-6
    if hx > 0 and hy > 0:
        assert abs(r["nmi"] - mi / min(hx, hy)) < 1e-6
    else:
        assert r["nmi"] is None
