"""Round-11 property differentials, second batch: CDC, interval joins,
engagement windows, and the robust-trend pair vs independent Python
references on arbitrary inputs."""


from __future__ import annotations

import pytest

import datetime as dt
import math
from collections import Counter

from hypothesis import HealthCheck, given, settings, strategies as st
from pyspark.sql import functions as F

from weather_api_automate_etl_spark.operators import (
    cdc,
    joins,
    stats,
    windows,
)

SETTINGS = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

_BASE = dt.date(2024, 1, 1)


# ---------------------------------------------------------------------------
# scd2_apply vs python fold
# ---------------------------------------------------------------------------


@given(
    dim0=st.dictionaries(st.integers(0, 5), st.integers(0, 3), max_size=5),
    batch=st.dictionaries(st.integers(0, 5), st.integers(0, 3), max_size=5),
)
@SETTINGS
@pytest.mark.slow
def test_scd2_apply_matches_python_fold(spark, dim0, batch):
    t0 = dt.datetime(2024, 1, 1)
    t1 = dt.datetime(2024, 2, 1)
    dim_rows = [
        (k, v, t0, None) for k, v in dim0.items()
    ]
    schema = (
        "k long, v long, valid_from timestamp_ntz, valid_to timestamp_ntz"
    )
    dim = spark.createDataFrame(dim_rows, schema)
    upd = spark.createDataFrame(
        [(k, v) for k, v in batch.items()], "k long, v long"
    )
    got = sorted(
        (r["k"], r["v"], r["valid_from"], r["valid_to"])
        for r in cdc.scd2_apply(dim, upd, "k", ["v"], t1).collect()
    )
    want = []
    for k, v in dim0.items():
        if k in batch and batch[k] == v:
            want.append((k, v, t0, None))  # unchanged current
        else:
            want.append((k, v, t0, t1))  # changed or vanished: closed
    for k, v in batch.items():
        if not (k in dim0 and dim0[k] == v):
            want.append((k, v, t1, None))  # new / re-opened current
    assert got == sorted(want)


# ---------------------------------------------------------------------------
# interval_join_binned vs brute force
# ---------------------------------------------------------------------------


@given(
    pts=st.lists(st.integers(0, 2000), min_size=1, max_size=12),
    ivs=st.lists(
        st.tuples(st.integers(0, 2000), st.integers(0, 2000)),
        min_size=1,
        max_size=6,
    ),
    bin_s=st.sampled_from([60, 600, 3600]),
)
@SETTINGS
@pytest.mark.slow
def test_interval_join_binned_matches_brute_force(spark, pts, ivs, bin_s):
    ivs = [(min(a, b), max(a, b)) for a, b in ivs]
    t0 = dt.datetime(2024, 1, 1)
    points = spark.createDataFrame(
        [(1, t0 + dt.timedelta(seconds=p), i) for i, p in enumerate(pts)],
        "k int, ts timestamp_ntz, pid int",
    )
    intervals = spark.createDataFrame(
        [
            (
                1,
                t0 + dt.timedelta(seconds=lo),
                t0 + dt.timedelta(seconds=hi),
                j,
            )
            for j, (lo, hi) in enumerate(ivs)
        ],
        "k int, lo timestamp_ntz, hi timestamp_ntz, iid int",
    )
    got = sorted(
        (r["pid"], r["iid"])
        for r in joins.interval_join_binned(
            points, intervals, "k", "ts", "lo", "hi", bin_seconds=bin_s
        ).collect()
    )
    want = sorted(
        (i, j)
        for i, p in enumerate(pts)
        for j, (lo, hi) in enumerate(ivs)
        if lo <= p <= hi
    )
    assert got == want


# ---------------------------------------------------------------------------
# rolling_active_users vs python sliding distinct
# ---------------------------------------------------------------------------


@given(
    events=st.lists(
        st.tuples(st.integers(0, 4), st.integers(0, 15)),
        min_size=1,
        max_size=30,
    ),
    w=st.integers(1, 5),
)
@SETTINGS
@pytest.mark.slow
def test_rolling_actives_matches_python_sliding_distinct(spark, events, w):
    df = spark.createDataFrame(
        [
            (u, dt.datetime(2024, 1, 1) + dt.timedelta(days=d))
            for u, d in events
        ],
        "u long, ts timestamp_ntz",
    )
    got = {
        r["day"]: r["n_active"]
        for r in windows.rolling_active_users(df, "u", "ts", w).collect()
    }
    days_present = sorted({d for _, d in events})
    want = {}
    for d in days_present:
        active = {u for u, dd in events if d - (w - 1) <= dd <= d}
        want[_BASE + dt.timedelta(days=d)] = len(active)
    assert got == want


# ---------------------------------------------------------------------------
# sessionize vs python gap splitter
# ---------------------------------------------------------------------------


@given(
    offsets=st.lists(st.integers(0, 7200), min_size=1, max_size=20),
    gap_min=st.sampled_from([1, 10, 30]),
)
@SETTINGS
def test_sessionize_matches_python_gaps(spark, offsets, gap_min):
    t0 = dt.datetime(2024, 1, 1)
    rows = [
        (7, t0 + dt.timedelta(seconds=s), i, 1.0)
        for i, s in enumerate(offsets)
    ]
    df = spark.createDataFrame(
        rows, "user_id long, ts timestamp_ntz, event_id long, value double"
    )
    got = sorted(
        (r["session_seq"], r["n_events"])
        for r in windows.sessionize(df, gap_minutes=gap_min).collect()
    )
    ordered = sorted(zip(offsets, range(len(offsets))))
    sessions, cur = [], 1
    for (s, _), (sp, _) in zip(ordered[1:], ordered):
        if s - sp > gap_min * 60:
            sessions.append(cur)
            cur = 1
        else:
            cur += 1
    sessions.append(cur)
    want = sorted((i + 1, n) for i, n in enumerate(sessions))
    assert got == want


# ---------------------------------------------------------------------------
# trimmed_mean vs python sort-and-slice
# ---------------------------------------------------------------------------


@given(
    vals=st.lists(st.integers(-100, 100), min_size=1, max_size=30),
    frac=st.sampled_from([0.0, 0.1, 0.25, 0.4]),
)
@SETTINGS
def test_trimmed_mean_matches_python(spark, vals, frac):
    df = spark.createDataFrame([("g", v) for v in vals], "g string, v long")
    (r,) = stats.trimmed_mean(df, "g", "v", trim_frac=frac).collect()
    k = math.floor(len(vals) * frac)
    kept = sorted(vals)[k:len(vals) - k]
    assert r["n"] == len(vals) and r["n_trimmed_each_side"] == k
    assert r["mean_raw"] == round(sum(vals) / len(vals), 6)
    assert r["mean_trimmed"] == round(sum(kept) / len(kept), 6)


# ---------------------------------------------------------------------------
# mann_kendall vs brute-force S / Var(S)
# ---------------------------------------------------------------------------


@given(
    counts=st.lists(st.integers(1, 5), min_size=3, max_size=10),
)
@SETTINGS
@pytest.mark.slow
def test_mann_kendall_matches_brute_force(spark, counts):
    rows = [
        ("g", p) for p, c in enumerate(counts) for _ in range(c)
    ]
    df = spark.createDataFrame(rows, "g string, p int")
    (r,) = stats.mann_kendall_trend(df, "g", "p").collect()
    n = len(counts)
    s = sum(
        (counts[j] > counts[i]) - (counts[j] < counts[i])
        for i in range(n)
        for j in range(i + 1, n)
    )
    ties = Counter(counts)
    tie_term = sum(t * (t - 1) * (2 * t + 5) for t in ties.values() if t > 1)
    var_s = (n * (n - 1) * (2 * n + 5) - tie_term) / 18.0
    assert r["n_periods"] == n and r["s"] == s
    assert r["var_s"] == round(var_s, 6) or abs(r["var_s"] - var_s) < 1e-6
    if var_s > 0 and s != 0:
        z = (s - (1 if s > 0 else -1)) / math.sqrt(var_s)
        assert abs(r["z"] - z) < 1e-6


# ---------------------------------------------------------------------------
# theil_sen vs brute-force pairwise-slope median
# ---------------------------------------------------------------------------


def _median(xs):
    xs = sorted(xs)
    n = len(xs)
    mid = xs[n // 2] if n % 2 else (xs[n // 2 - 1] + xs[n // 2]) / 2.0
    return mid


@given(
    counts=st.lists(st.integers(1, 6), min_size=2, max_size=9),
)
@SETTINGS
@pytest.mark.slow
def test_theil_sen_matches_brute_force(spark, counts):
    rows = [
        ("g", p) for p, c in enumerate(counts) for _ in range(c)
    ]
    df = spark.createDataFrame(rows, "g string, p int")
    (r,) = stats.theil_sen_trend(df, "g", "p").collect()
    ps = list(range(len(counts)))
    slopes = [
        (counts[j] - counts[i]) / (ps[j] - ps[i])
        for i in range(len(ps))
        for j in range(i + 1, len(ps))
    ]
    slope = _median(slopes)
    intercept = _median([counts[i] - slope * ps[i] for i in range(len(ps))])
    assert abs(r["slope"] - slope) < 1e-6
    assert abs(r["intercept"] - intercept) < 1e-6
