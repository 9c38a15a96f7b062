"""Round-5 fourth-wave invariants: label propagation separates bridged
cliques (where connected components cannot), trailing-median robustness
to spikes, sweep-line concurrency on crafted intervals, CUSUM localizing
a constructed mean shift, and seasonal-baseline residual identities.
"""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import Row

from weather_api_automate_etl_spark.operators import dedup, graph, stats, timeseries


# ---------------------------------------------------------------------------
# label propagation
# ---------------------------------------------------------------------------


def _clique_edges(nodes):
    return [
        Row(id_a=a, id_b=b)
        for i, a in enumerate(nodes)
        for b in nodes[i + 1 :]
    ]


def test_lpa_separates_bridged_cliques(spark):
    # two 4-cliques joined by ONE bridge edge: connected components says
    # "one component"; LPA must give each clique its own label
    edges = (
        _clique_edges([1, 2, 3, 4])
        + _clique_edges([10, 11, 12, 13])
        + [Row(id_a=4, id_b=10)]
    )
    out = {
        r["doc_id"]: r["label"]
        for r in graph.label_propagation(
            spark.createDataFrame(edges), rounds=2
        ).collect()
    }
    left = {out[n] for n in (1, 2, 3)}
    right = {out[n] for n in (11, 12, 13)}
    assert len(left) == 1 and len(right) == 1
    assert left != right, "bridged cliques must keep distinct communities"


def test_lpa_deterministic_tie_rule(spark):
    # a single edge: each node's only neighbour label is the other node,
    # so after round 1 labels SWAP; after round 2 they swap back — the
    # fixed-round synchronous semantics, not a converged fixpoint
    edges = spark.createDataFrame([Row(id_a=1, id_b=2)])
    r1 = {
        r["doc_id"]: r["label"]
        for r in graph.label_propagation(edges, rounds=1).collect()
    }
    assert r1 == {1: 2, 2: 1}
    r2 = {
        r["doc_id"]: r["label"]
        for r in graph.label_propagation(edges, rounds=2).collect()
    }
    assert r2 == {1: 1, 2: 2}


def test_lpa_rejects_bad_rounds(spark):
    edges = spark.createDataFrame([Row(id_a=1, id_b=2)])
    with pytest.raises(ValueError, match="rounds"):
        graph.label_propagation(edges, rounds=0)


# ---------------------------------------------------------------------------
# trailing median: spike robustness (vs the EWMA it complements)
# ---------------------------------------------------------------------------


def test_trailing_median_shrugs_off_spike(spark):
    base = dt.datetime(2024, 1, 1)
    vals = [10.0] * 10
    vals[5] = 1000.0  # one wild spike
    df = spark.createDataFrame(
        [
            Row(event_id=i, user_id=1, ts=base + dt.timedelta(minutes=i), value=v)
            for i, v in enumerate(vals)
        ]
    )
    out = {
        r["event_id"]: r["trailing_median"]
        for r in timeseries.trailing_median(
            df, "user_id", "value", ("ts", "event_id"),
            window_rows=8, keep_cols=("event_id",),
        ).collect()
    }
    # the spike row itself and every later row still report the inlier level
    for i in range(len(vals)):
        assert out[i] == 10.0, f"median at {i} dragged by the spike: {out[i]}"


# ---------------------------------------------------------------------------
# sweep-line concurrency on crafted intervals
# ---------------------------------------------------------------------------


def test_concurrency_counts_known_overlap(spark):
    base = dt.datetime(2024, 1, 1)
    # type A: three intervals of 60s starting 0s/30s/45s apart -> peak 3;
    # type B: two back-to-back (touching) 60s intervals -> peak 2 under
    # the starts-before-ends tie rule
    rows = [
        Row(event_id=1, event_type="A", ts=base, value=60.0),
        Row(event_id=2, event_type="A", ts=base + dt.timedelta(seconds=30), value=60.0),
        Row(event_id=3, event_type="A", ts=base + dt.timedelta(seconds=45), value=60.0),
        Row(event_id=4, event_type="B", ts=base, value=60.0),
        Row(event_id=5, event_type="B", ts=base + dt.timedelta(seconds=60), value=60.0),
    ]
    out = {
        r["event_type"]: r
        for r in timeseries.concurrency_peak(
            spark.createDataFrame(rows), "event_type", "ts", "value"
        ).collect()
    }
    assert out["A"]["peak_concurrency"] == 3
    assert out["B"]["peak_concurrency"] == 2
    assert out["A"]["n_intervals"] == 3 and out["B"]["n_intervals"] == 2


# ---------------------------------------------------------------------------
# CUSUM localizes a constructed mean shift
# ---------------------------------------------------------------------------


def test_cusum_finds_constructed_shift(spark):
    base = dt.datetime(2024, 1, 1)
    # 30 points at level 0, then 30 at level 5: |CUSUM| of standardized
    # residuals peaks exactly at the last pre-shift point
    rows = [
        Row(event_id=i, event_type="t",
            ts=base + dt.timedelta(minutes=i),
            value=0.0 if i < 30 else 5.0)
        for i in range(60)
    ]
    out = timeseries.cusum_changepoint(
        spark.createDataFrame(rows), "event_type", "value",
        ("ts", "event_id"), "event_id",
    ).head()
    assert out["n_events"] == 60
    assert out["change_event_id"] == 29, (
        f"CUSUM peak at {out['change_event_id']}, expected the last "
        "pre-shift point"
    )


# ---------------------------------------------------------------------------
# wave 5: fuzzy match, freshness, skew profile, cumulative distinct
# ---------------------------------------------------------------------------


def test_fuzzy_match_blocks_and_threshold(spark):
    df = spark.createDataFrame(
        [
            Row(p_partkey=1, p_brand="A", p_name="goldenrod lace"),
            Row(p_partkey=2, p_brand="A", p_name="goldenrod lacy"),   # dist 1
            Row(p_partkey=3, p_brand="A", p_name="completely different thing"),
            Row(p_partkey=4, p_brand="B", p_name="goldenrod lace"),   # other block
        ]
    )
    pairs = dedup.fuzzy_match_blocked(
        df, "p_partkey", "p_brand", "p_name", max_dist=10
    ).collect()
    assert [(r["p1"], r["p2"], r["dist"]) for r in pairs] == [(1, 2, 1)], (
        "only the near-identical same-block pair may match: "
        "cross-block twins and far names must be excluded"
    )


def test_cumulative_distinct_hand_case(spark):
    base = dt.datetime(2024, 1, 1)
    seq = ["a", "b", "a", "c", "b", "d"]
    df = spark.createDataFrame(
        [
            Row(event_id=i, user_id=1, event_type=e,
                ts=base + dt.timedelta(minutes=i))
            for i, e in enumerate(seq)
        ]
    )
    out = {
        r["event_id"]: r["n_types_so_far"]
        for r in timeseries.cumulative_distinct(
            df, "user_id", "event_type", ("ts", "event_id"), "event_id"
        ).collect()
    }
    assert [out[i] for i in range(6)] == [1, 2, 2, 3, 3, 4]


def test_skew_profile_flags_known_hot_key(spark):
    rows = [Row(event_id=i, user_id=99) for i in range(80)] + [
        Row(event_id=100 + i, user_id=i % 10) for i in range(20)
    ]
    df = spark.createDataFrame(rows)
    top = stats.skew_profile(df, "user_id", top_k=1).head()
    assert top["rnk"] == 1 and top["user_id"] == 99 and top["cnt"] == 80
    assert top["share"] == 0.8
    assert top["x_median"] == 40.0  # hot key is 40x the median key


# ---------------------------------------------------------------------------
# wave 6: zipf fit, burstiness, gini
# ---------------------------------------------------------------------------


def test_zipf_separates_natural_from_uniform(spark):
    from weather_api_automate_etl_spark.operators import textops

    # source Z: Zipf-ish frequencies (freq ~ 1/rank); source U: uniform
    words = [f"w{i}" for i in range(20)]
    zipf_text = " ".join(
        " ".join([w] * max(1, 40 // (i + 1))) for i, w in enumerate(words)
    )
    uni_text = " ".join(" ".join([w] * 5) for w in words)
    df = spark.createDataFrame(
        [Row(doc_id=1, source="Z", text=zipf_text),
         Row(doc_id=2, source="U", text=uni_text)]
    )
    out = {r["source"]: r for r in textops.zipf_fit(df, "source").collect()}
    assert out["Z"]["slope"] < -0.8, f"Zipfian slope {out['Z']['slope']}"
    # a perfectly uniform spectrum is numerically constant in ln(freq):
    # the relative variance floor must yield NULL, not garbage
    assert out["U"]["slope"] is None or out["U"]["slope"] > -0.2
    assert out["Z"]["r2"] > 0.8


def test_burstiness_sign_on_crafted_streams(spark):
    base = dt.datetime(2024, 1, 1)
    rows = []
    # user 1: perfectly periodic (gap 60s) -> B = -1 (sigma 0)... sigma=0
    # gives B = (0-60)/(0+60) = -1
    for i in range(20):
        rows.append(Row(event_id=i, user_id=1,
                        ts=base + dt.timedelta(seconds=60 * i)))
    # user 2: bursty — 10 events in one second, then an hour gap, repeated
    t = base
    eid = 100
    for burst in range(4):
        for j in range(10):
            rows.append(Row(event_id=eid, user_id=2,
                            ts=t + dt.timedelta(seconds=j)))
            eid += 1
        t += dt.timedelta(hours=1)
    out = {
        r["user_id"]: r
        for r in timeseries.burstiness(
            spark.createDataFrame(rows), "user_id", "ts", ("ts", "event_id")
        ).collect()
    }
    assert out[1]["burstiness"] == -1.0, "periodic stream must be B = -1"
    assert out[2]["burstiness"] > 0.5, f"bursty stream B {out[2]['burstiness']}"


def test_gini_equal_vs_concentrated(spark):
    df = spark.createDataFrame(
        [Row(doc_id=i, source="EQ", n_chars=100) for i in range(10)]
        + [Row(doc_id=100 + i, source="CONC", n_chars=1) for i in range(9)]
        + [Row(doc_id=200, source="CONC", n_chars=10_000)]
    )
    out = {
        r["source"]: r["gini"]
        for r in stats.gini_by_group(df, "source", "n_chars", "doc_id").collect()
    }
    assert out["EQ"] == 0.0
    assert out["CONC"] > 0.85, f"concentrated stratum gini {out['CONC']}"


# ---------------------------------------------------------------------------
# DST regression: wall-clock semantics under a non-UTC session
# ---------------------------------------------------------------------------


def test_freshness_lag_is_wall_clock_across_dst(spark):
    """2024-03-10 01:30 -> 03:30 America/New_York spans the spring-forward
    gap: epoch difference is 3600 s but WALL-CLOCK difference is 7200 s.
    freshness must report the wall-clock lag regardless of session tz
    (the round-5 review finding: unix_timestamp on TIMESTAMP_NTZ
    round-trips the session zone and would report 3600)."""
    from weather_api_automate_etl_spark.operators import quality

    old_tz = spark.conf.get("spark.sql.session.timeZone")
    try:
        spark.conf.set("spark.sql.session.timeZone", "America/New_York")
        df = spark.sql(
            """
            SELECT * FROM VALUES
              ('a', TIMESTAMP_NTZ '2024-03-10 01:30:00'),
              ('b', TIMESTAMP_NTZ '2024-03-10 03:30:00')
            AS t(stream, ts)
            """
        )
        out = {
            r["stream"]: r
            for r in quality.freshness(df, "stream", "ts",
                                       stale_after_s=3600).collect()
        }
        assert out["a"]["lag_seconds"] == 7200, (
            f"wall-clock lag must be 7200s, got {out['a']['lag_seconds']} "
            "(3600 would mean the lag went through the session timezone)"
        )
        assert out["a"]["is_stale"] and not out["b"]["is_stale"]
    finally:
        spark.conf.set("spark.sql.session.timeZone", old_tz)


def test_sql_macro_pg_hour_ntz_in_dst_gap(spark):
    """pg_hour's param is TIMESTAMP_NTZ: 02:30 on the US spring-forward
    date is a NONEXISTENT New-York local time — an LTZ param would
    resolve it through the session zone to 03:30 and answer 3, the
    review-flagged divergence from the naive-timestamp oracle."""
    from weather_api_automate_etl_spark.sources.catalog import register_sql_macros

    register_sql_macros(spark)
    old_tz = spark.conf.get("spark.sql.session.timeZone")
    try:
        spark.conf.set("spark.sql.session.timeZone", "America/New_York")
        row = spark.sql(
            "SELECT pg_hour(TIMESTAMP_NTZ '2024-03-10 02:30:00') AS hr,"
            "       pg_dow(TIMESTAMP_NTZ '2024-03-10 02:30:00') AS dow"
        ).head()
        assert row["hr"] == 2, f"NTZ hour must be 2 (naive), got {row['hr']}"
        assert row["dow"] == 0  # 2024-03-10 is a Sunday
    finally:
        spark.conf.set("spark.sql.session.timeZone", old_tz)


# ---------------------------------------------------------------------------
# wave 7: A/B readout and first-touch attribution
# ---------------------------------------------------------------------------


def test_ab_assignment_deterministic_and_aa_null_effect(spark):
    import numpy as np

    rng = np.random.RandomState(3)
    # A/A test: values independent of the hash split -> |z| must be small
    df = spark.createDataFrame(
        [Row(user_id=i, value=float(v))
         for i, v in enumerate(rng.normal(50, 5, 4000))]
    )
    r1 = stats.ab_test_welch(df, "user_id", "value").head()
    r2 = stats.ab_test_welch(df, "user_id", "value").head()
    assert r1 == r2, "hash assignment must be replayable"
    assert abs(r1["z"]) < 3.0, f"A/A test found an effect: z={r1['z']}"
    assert r1["n_a"] + r1["n_b"] == 4000
    # a different salt re-randomizes the split
    r3 = stats.ab_test_welch(df, "user_id", "value", salt="exp2").head()
    assert (r3["n_a"], r3["n_b"]) != (r1["n_a"], r1["n_b"])


def test_ab_detects_constructed_effect(spark):
    # craft a true arm effect by first reading the assignment, then
    # setting value = 10 + 5*arm — z must be overwhelming and positive
    from pyspark.sql import functions as F

    base = spark.range(0, 2000).select(F.col("id").alias("user_id"))
    arm = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("exp1:"), F.col("user_id").cast("string"))),
                1, 8,
            ), 16, 10,
        ).cast("long") % 2
    )
    df = base.select(
        "user_id",
        (F.lit(10.0) + F.lit(5.0) * arm
         + (F.col("user_id") % 7).cast("double") / 10).alias("value"),
    )
    r = stats.ab_test_welch(df, "user_id", "value").head()
    assert r["z"] > 20, f"constructed +5 effect must dominate: z={r['z']}"
    assert 0.4 < r["rel_lift"] < 0.6


def test_first_touch_attribution_hand_case(spark):
    base = dt.datetime(2024, 1, 1)
    rows = []
    # user 1: ad -> purchase (converted, first touch 'ad')
    # user 2: email -> view (not converted, first touch 'email')
    # user 3: ad -> view (not converted, first touch 'ad')
    # user 4: purchase only (converted, first touch 'purchase')
    seqs = {1: ["ad", "purchase"], 2: ["email", "view"],
            3: ["ad", "view"], 4: ["purchase"]}
    eid = 0
    for uid, kinds in seqs.items():
        for j, k in enumerate(kinds):
            rows.append(Row(event_id=eid, user_id=uid, event_type=k,
                            ts=base + dt.timedelta(minutes=j)))
            eid += 1
    out = {
        r["first_touch"]: r
        for r in stats.first_touch_conversion(
            spark.createDataFrame(rows), "user_id", "event_type",
            ("ts", "event_id"), target="purchase",
        ).collect()
    }
    assert out["ad"]["n_units"] == 2 and out["ad"]["n_converted"] == 1
    assert out["ad"]["conversion_rate"] == 0.5
    assert out["email"]["n_converted"] == 0
    assert out["purchase"]["conversion_rate"] == 1.0


def test_trailing_median_null_leading_value_yields_null_not_crash(spark):
    """A series whose first value is NULL has an EMPTY first frame
    (collect_list skips NULLs): the median must be NULL for that row —
    not an INVALID_INDEX_OF_ZERO crash (third-review finding)."""
    base = dt.datetime(2024, 1, 1)
    df = spark.createDataFrame(
        [Row(event_id=0, user_id=1, ts=base, value=None),
         Row(event_id=1, user_id=1, ts=base + dt.timedelta(minutes=1),
             value=7.0)],
        "event_id long, user_id long, ts timestamp, value double",
    )
    out = {
        r["event_id"]: r["trailing_median"]
        for r in timeseries.trailing_median(
            df, "user_id", "value", ("ts", "event_id"),
            window_rows=8, keep_cols=("event_id",),
        ).collect()
    }
    assert out[0] is None
    assert out[1] == 7.0


def test_seasonal_decompose_identity_and_gap_anchoring(spark):
    """y = trend + seasonal + residual wherever trend is defined; edges
    (half-window) carry NULLs; the seasonal component is centered (phase
    effects sum ~0); and the phase is CALENDAR-anchored, so removing a
    row shifts no other row's phase."""
    from pyspark.sql import functions as F

    base = dt.date(2024, 1, 1)
    # weekly pattern + slow trend, 28 days
    rows = [
        ("s", base + dt.timedelta(days=i), float(10 + i * 0.5 + (i % 7) * 3))
        for i in range(28)
    ]
    df = spark.createDataFrame(rows, "sid string, day date, y double")
    out = {
        r.day: r
        for r in timeseries.seasonal_decompose(df, "sid", "day", "y").collect()
    }
    assert len(out) == 28
    for i, (d, r) in enumerate(sorted(out.items())):
        if i < 3 or i >= 25:  # half-window edges
            assert r.trend is None and r.seasonal is None and r.residual is None
        else:
            assert abs(r.y - (r.trend + r.seasonal + r.residual)) < 2e-6
    # centered seasonal: the 7 phase effects sum ~0
    effs = {r.seasonal for r in out.values() if r.seasonal is not None}
    assert abs(sum(effs)) < 1e-5 and len(effs) == 7
    # pure weekly pattern (no trend slope) → residuals ~0
    flat = spark.createDataFrame(
        [("s", base + dt.timedelta(days=i), float(5 + (i % 7) * 2)) for i in range(21)],
        "sid string, day date, y double",
    )
    fo = timeseries.seasonal_decompose(flat, "sid", "day", "y").collect()
    assert all(abs(r.residual) < 2e-6 for r in fo if r.residual is not None)
    # calendar anchoring: drop one middle day — the other rows' phases
    # (hence seasonal assignments) must be unchanged
    gap = df.filter(F.col("day") != dt.date(2024, 1, 10))
    go = {
        r.day: r.seasonal
        for r in timeseries.seasonal_decompose(gap, "sid", "day", "y").collect()
        if r.seasonal is not None
    }
    # a defined day keeps landing on its calendar phase: same-phase days
    # two weeks apart share one seasonal value
    d1, d2 = dt.date(2024, 1, 12), dt.date(2024, 1, 19)
    if d1 in go and d2 in go:
        assert go[d1] == go[d2]
    with pytest.raises(ValueError, match="period"):
        timeseries.seasonal_decompose(df, "sid", "day", "y", period=1)
