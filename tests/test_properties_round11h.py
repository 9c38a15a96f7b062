"""Round-11 property differentials, eighth batch: hierarchy flattening,
change-point localization, burstiness, funnel timing, and first-touch
attribution vs independent Python references."""


from __future__ import annotations

import pytest

import datetime as dt
import math
import statistics

from hypothesis import HealthCheck, given, settings, strategies as st

from weather_api_automate_etl_spark.operators import graph, stats, timeseries

SETTINGS = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


# ---------------------------------------------------------------------------
# pointer_doubling_roots vs python walk
# ---------------------------------------------------------------------------


@given(
    parent_of=st.dictionaries(
        st.integers(0, 10), st.integers(0, 10), min_size=1, max_size=11
    ),
)
@SETTINGS
@pytest.mark.slow
def test_pointer_doubling_matches_python_walk(spark, parent_of):
    # break cycles deterministically: a parent pointer may only point to
    # a STRICTLY SMALLER node id (so the graph is a forest by construction)
    forest = {n: (p if p < n else n) for n, p in parent_of.items()}
    # close over the node set (referenced parents must exist as nodes)
    for p in list(forest.values()):
        forest.setdefault(p, p if p not in forest else forest[p])
    rows = [(n, p) for n, p in forest.items()]
    df = spark.createDataFrame(rows, "node long, parent long")
    got = {
        r["node"]: (r["root"], r["depth"])
        for r in graph.pointer_doubling_roots(df).collect()
    }

    def walk(n):
        d = 0
        while forest[n] != n:
            n = forest[n]
            d += 1
        return n, d

    want = {n: walk(n) for n in forest}
    assert got == want


# ---------------------------------------------------------------------------
# cusum_changepoint vs python running standardized sums
# ---------------------------------------------------------------------------


@given(
    vals=st.lists(st.integers(-20, 20), min_size=2, max_size=25),
)
@SETTINGS
@pytest.mark.slow
def test_cusum_matches_python(spark, vals):
    rows = [("g", i, float(v)) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "g string, i long, v double")
    (r,) = timeseries.cusum_changepoint(
        df, "g", "v", ("i",), "i"
    ).collect()
    mu = round(statistics.mean(vals), 6)
    sd = round(statistics.stdev(vals), 6) if len(vals) > 1 else None
    if not sd:  # constant series: sd rounds to 0 -> NULL cusum everywhere
        assert r["max_abs_cusum"] is None
        return
    cusum, cur = [], 0.0
    for v in vals:
        cur += (v - mu) / sd
        cusum.append(round(cur, 6))
    peak = max(abs(c) for c in cusum)
    # ties -> earliest index (the argmax orders by |cusum| desc, i asc)
    change = min(i for i, c in enumerate(cusum) if abs(c) == peak)
    assert r["n_events"] == len(vals)
    assert abs(r["max_abs_cusum"] - peak) < 1e-9
    assert r["change_event_id"] == change


# ---------------------------------------------------------------------------
# burstiness vs python (sigma - mu)/(sigma + mu)
# ---------------------------------------------------------------------------


@given(
    offsets=st.lists(st.integers(0, 5000), min_size=3, max_size=20),
)
@SETTINGS
def test_burstiness_matches_python(spark, offsets):
    t0 = dt.datetime(2024, 1, 1)
    rows = [
        ("s", t0 + dt.timedelta(seconds=o), i)
        for i, o in enumerate(sorted(set(offsets)))
    ]
    if len(rows) < 3:
        return  # fewer than 2 gaps: operator contract is NULL-ish output
    df = spark.createDataFrame(rows, "g string, ts timestamp_ntz, i long")
    (r,) = timeseries.burstiness(df, "g", "ts", ("ts", "i")).collect()
    srt = sorted(set(offsets))
    gaps = [b - a for a, b in zip(srt, srt[1:])]
    mu = round(statistics.mean(gaps), 6)
    sigma = round(statistics.stdev(gaps), 6)
    assert r["n_gaps"] == len(gaps)
    assert r["mu"] == mu and r["sigma"] == sigma
    if sigma + mu != 0:
        assert abs(r["burstiness"] - (sigma - mu) / (sigma + mu)) < 1e-6
    else:
        assert r["burstiness"] is None


# ---------------------------------------------------------------------------
# time_to_convert vs python order statistics
# ---------------------------------------------------------------------------


@given(
    users=st.dictionaries(
        st.integers(0, 9),
        st.tuples(
            st.one_of(st.none(), st.integers(0, 1000)),  # first view at s
            st.one_of(st.none(), st.integers(0, 1000)),  # first buy at s
        ),
        min_size=1,
        max_size=10,
    ),
)
@SETTINGS
@pytest.mark.slow
def test_time_to_convert_matches_python(spark, users):
    t0 = dt.datetime(2024, 1, 1)
    rows = []
    for u, (v, p) in users.items():
        if v is not None:
            rows.append((u, "view", t0 + dt.timedelta(seconds=v)))
        if p is not None:
            rows.append((u, "buy", t0 + dt.timedelta(seconds=p)))
    if not rows:
        return
    df = spark.createDataFrame(rows, "u long, et string, ts timestamp_ntz")
    (r,) = stats.time_to_convert(df, "u", "et", "ts", "view", "buy").collect()
    n_from = sum(1 for v, _ in users.values() if v is not None)
    delays = sorted(
        p - v
        for v, p in users.values()
        if v is not None and p is not None and p > v
    )
    assert r["n_from"] == n_from
    assert r["n_converted"] == len(delays)
    if delays:
        n = len(delays)

        def pick(q):
            # smallest distinct delay whose cumulative count >= ceil(q*n)
            need = math.ceil(q * n)
            return delays[need - 1]

        assert r["median_delay_s"] == pick(0.5)
        assert r["p90_delay_s"] == pick(0.9)
    else:
        assert r["median_delay_s"] is None and r["p90_delay_s"] is None


# ---------------------------------------------------------------------------
# first_touch_conversion vs python
# ---------------------------------------------------------------------------


@given(
    events=st.lists(
        st.tuples(
            st.integers(0, 5),  # user
            st.sampled_from(["ad", "email", "social", "buy"]),
        ),
        min_size=1,
        max_size=30,
    ),
)
@SETTINGS
def test_first_touch_matches_python(spark, events):
    rows = [(u, k, i) for i, (u, k) in enumerate(events)]
    df = spark.createDataFrame(rows, "u long, kind string, seq long")
    got = {
        r["first_touch"]: (r["n_units"], r["n_converted"])
        for r in stats.first_touch_conversion(
            df, "u", "kind", ("seq",), "buy"
        ).collect()
    }
    first: dict[int, str] = {}
    converted: dict[int, bool] = {}
    for u, k in events:
        first.setdefault(u, k)
        converted[u] = converted.get(u, False) or k == "buy"
    want: dict[str, list[int]] = {}
    for u, ch in first.items():
        want.setdefault(ch, [0, 0])
        want[ch][0] += 1
        want[ch][1] += int(converted[u])
    assert got == {ch: tuple(v) for ch, v in want.items()}
