"""Round-12 property differentials: streaming, CDC/SCD2, session windows
and the snapshot ledger agree with INDEPENDENT plain-Python references on
arbitrary inputs — the operator families round 11's differential suite
left to oracle + example tests alone (round-11 verdict item 5). Each
reference below is a from-scratch model (dict replay, sweep-line merge,
dict-of-versions), never a call into the code under test."""


from __future__ import annotations

import pytest

import datetime as dt
import itertools
import tempfile

from hypothesis import HealthCheck, given, settings, strategies as st
from pyspark.sql import functions as F

from weather_api_automate_etl_spark.operators import cdc
from weather_api_automate_etl_spark.sources import ledger
from weather_api_automate_etl_spark.streaming import events as stream_events

SETTINGS = settings(
    max_examples=6,  # each example is one-or-more Spark jobs; keep it fast
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
STREAM_SETTINGS = settings(
    max_examples=4,  # each example drains a real micro-batch query
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

_sink_ids = itertools.count()


def _utc(sec: int) -> dt.datetime:
    """Naive UTC datetime — the session TZ is UTC, so this round-trips
    exactly through TimestampType and timestamp_ntz."""
    return dt.datetime(1970, 1, 1) + dt.timedelta(seconds=sec)


# ---------------------------------------------------------------------------
# streaming windowed_counts: drained micro-batch log ≡ python tumbling agg
# ---------------------------------------------------------------------------


@given(
    # ts bounded to [0, 7000 s] < the 2 h watermark, so no generated event
    # can ever fall behind the watermark mid-drain: the python reference
    # (which counts everything) stays the exact expected value regardless
    # of how the file source orders the micro-batches
    evs=st.lists(
        st.tuples(
            st.integers(0, 7000),  # ts seconds
            st.sampled_from(["view", "click"]),
            st.integers(0, 100),  # value
        ),
        min_size=1,
        max_size=30,
    ),
)
@STREAM_SETTINGS
@pytest.mark.slow
def test_streaming_windowed_counts_matches_python(spark, evs):
    src = tempfile.mkdtemp(prefix="r12stream_")
    rows = [
        (i, _utc(ts), i % 3, etype, float(val), None)
        for i, (ts, etype, val) in enumerate(evs)
    ]
    (
        spark.createDataFrame(rows, stream_events.EVENT_SCHEMA)
        .repartition(3)  # 3 files → 3 micro-batches under maxFilesPerTrigger=1
        .write.mode("overwrite")
        .parquet(src)
    )
    name = f"r12_win_{next(_sink_ids)}"
    stream_events.run_to_memory_sink(
        stream_events.windowed_counts(stream_events.read_event_stream(spark, src)),
        name,
    )
    got = {
        (r.window_start, r.event_type): (r.n, r.total_value)
        for r in spark.table(name).collect()
    }
    # independent reference: python dict tumbling agg on 1 h floors
    want: dict[tuple[dt.datetime, str], list[float]] = {}
    for ts, etype, val in evs:
        key = (_utc(ts // 3600 * 3600), etype)
        acc = want.setdefault(key, [0, 0.0])
        acc[0] += 1
        acc[1] += float(val)
    assert got == {k: (n, round(s, 2)) for k, (n, s) in want.items()}


# ---------------------------------------------------------------------------
# session_counts ≡ python sweep-line session merge (batch twin of the
# streaming operator: identical code path, withWatermark is a no-op)
# ---------------------------------------------------------------------------


@given(
    evs=st.lists(
        st.tuples(
            st.integers(0, 2),  # user
            st.integers(0, 3600),  # ts seconds
            st.integers(0, 50),  # value
        ),
        min_size=1,
        max_size=30,
        unique_by=lambda e: (e[0], e[1]),  # one event per (user, ts)
    ),
    gap_s=st.integers(60, 900),
)
@SETTINGS
def test_session_counts_matches_python_sweep_line(spark, evs, gap_s):
    rows = [
        (i, _utc(ts), user, "view", float(val), None)
        for i, (user, ts, val) in enumerate(evs)
    ]
    df = spark.createDataFrame(rows, stream_events.EVENT_SCHEMA)
    got = {
        (r.user_id, r.session_start, r.session_end): (r.n_events, r.total_value)
        for r in stream_events.session_counts(df, gap=f"{gap_s} seconds").collect()
    }
    # independent reference: per-user sort + greedy sweep-line merge —
    # a new session opens when ts_next - ts_prev >= gap; a session spans
    # [first ts, last ts + gap)
    by_user: dict[int, list[tuple[int, int]]] = {}
    for user, ts, val in evs:
        by_user.setdefault(user, []).append((ts, val))
    want = {}
    for user, uevs in by_user.items():
        uevs.sort()
        sessions: list[list[tuple[int, int]]] = [[uevs[0]]]
        for ev in uevs[1:]:
            if ev[0] - sessions[-1][-1][0] >= gap_s:
                sessions.append([ev])
            else:
                sessions[-1].append(ev)
        for sess in sessions:
            key = (user, _utc(sess[0][0]), _utc(sess[-1][0] + gap_s))
            want[key] = (
                len(sess),
                round(float(sum(v for _, v in sess)), 2),
            )
    assert got == want


# ---------------------------------------------------------------------------
# scd2_apply folded over a batch sequence ≡ python dict replay
# ---------------------------------------------------------------------------


@given(
    batches=st.lists(
        st.dictionaries(
            st.integers(0, 4), st.integers(0, 3), min_size=0, max_size=5
        ),
        min_size=1,
        max_size=4,
    ),
)
@SETTINGS
@pytest.mark.slow
def test_scd2_apply_matches_python_replay(spark, batches):
    dim = spark.createDataFrame(
        [], "k int, v int, valid_from timestamp_ntz, valid_to timestamp_ntz"
    )
    for b, batch in enumerate(batches):
        updates = spark.createDataFrame(
            [(k, v) for k, v in batch.items()] or [(None, None)], "k int, v int"
        ).filter(F.col("k").isNotNull())
        dim = spark.createDataFrame(  # materialize: break the iterative lineage
            cdc.scd2_apply(dim, updates, "k", ["v"], _utc(b + 1)).collect(),
            "k int, v int, valid_from timestamp_ntz, valid_to timestamp_ntz",
        )
    got = {(r.k, r.v, r.valid_from, r.valid_to) for r in dim.collect()}
    # independent reference: dict replay of the type-2 contract — change
    # closes + reopens, absence closes (hard delete), unchanged carries
    cur: dict[int, tuple[int, int]] = {}  # key -> (value, open_since batch)
    closed: list[tuple[int, int, int, int]] = []  # (k, v, from_b, to_b)
    for b, batch in enumerate(batches):
        ts = b + 1
        for k, (v, since) in list(cur.items()):
            if k not in batch:
                closed.append((k, v, since, ts))
                del cur[k]
            elif batch[k] != v:
                closed.append((k, v, since, ts))
                cur[k] = (batch[k], ts)
        for k, v in batch.items():
            if k not in cur:
                cur[k] = (v, ts)
    want = {(k, v, _utc(f), _utc(t)) for k, v, f, t in closed} | {
        (k, v, _utc(f), None) for k, (v, f) in cur.items()
    }
    assert got == want


# ---------------------------------------------------------------------------
# apply_cdc ≡ python change-log replay
# ---------------------------------------------------------------------------


@given(
    log=st.lists(
        st.tuples(
            st.integers(0, 3),  # key
            st.integers(0, 20),  # seq
            st.sampled_from(["I", "U", "D"]),
            st.integers(0, 9),  # payload
        ),
        min_size=1,
        max_size=25,
        unique_by=lambda r: (r[0], r[1]),  # seq unique per key (LSN contract)
    ),
)
@SETTINGS
def test_apply_cdc_matches_python_replay(spark, log):
    df = spark.createDataFrame(log, "k int, seq int, op string, v int")
    got = {(r.k, r.seq, r.op, r.v) for r in cdc.apply_cdc(df, "k", "seq").collect()}
    # independent reference: per-key highest-sequence winner; a winning
    # delete removes the key entirely
    best: dict[int, tuple[int, str, int]] = {}
    for k, seq, op, v in log:
        if k not in best or seq > best[k][0]:
            best[k] = (seq, op, v)
    want = {
        (k, seq, op, v) for k, (seq, op, v) in best.items() if op != "D"
    }
    assert got == want


# ---------------------------------------------------------------------------
# ledger time travel ≡ python dict-of-versions model
# ---------------------------------------------------------------------------


@given(
    initial=st.dictionaries(
        st.integers(0, 5), st.integers(0, 9), min_size=1, max_size=6
    ),
    ops=st.lists(
        st.one_of(
            st.tuples(
                st.just("merge"),
                st.dictionaries(
                    st.integers(0, 7), st.integers(0, 9), min_size=1, max_size=4
                ),
            ),
            st.tuples(
                st.just("delete"),
                st.sets(st.integers(0, 7), min_size=1, max_size=3),
            ),
        ),
        min_size=1,
        max_size=3,
    ),
    dv=st.booleans(),
)
@SETTINGS
@pytest.mark.slow
def test_ledger_time_travel_matches_dict_of_versions(spark, initial, ops, dv):
    path = tempfile.mkdtemp(prefix="r12ledger_")

    def _df(state: dict[int, int]):
        return spark.createDataFrame(
            [(k, v, k % 2) for k, v in state.items()], "k int, v int, p int"
        )

    versions: dict[int, dict[int, int]] = {}
    v = ledger.ledger_write(spark, _df(initial), path, "p")
    model = dict(initial)
    versions[v] = dict(model)
    for kind, arg in ops:
        if kind == "merge":
            v = ledger.ledger_merge(spark, path, _df(dict(arg)), "k")
            model.update(arg)
        else:
            keys = spark.createDataFrame([(k,) for k in arg], "k int")
            v = ledger.ledger_delete(
                spark, path, keys, "k", mode="dv" if dv else "rewrite"
            )
            for k in arg:
                model.pop(k, None)
        versions[v] = dict(model)
    # every historical version must replay exactly from its manifest —
    # including pre-delete snapshots when later deletes used DV sidecars
    for ver, state in versions.items():
        got = {
            (r.k): (r.v, r.p)
            for r in ledger.ledger_read(spark, path, version=ver).collect()
        }
        assert got == {k: (v_, k % 2) for k, v_ in state.items()}, f"v{ver}"
    # ...and the change feed between ANY two versions must equal the
    # python set/value diff of the modeled states (ledger CDF)
    vs = sorted(versions)
    pairs = [(vs[0], vs[-1])] + ([(vs[1], vs[-1])] if len(vs) > 2 else [])
    for vf, vt in pairs:
        sf_, st_ = versions[vf], versions[vt]
        got_c = {
            r.k: (r.change_type, r.v)
            for r in ledger.ledger_changes(
                spark, path, "k", ["v"], v_from=vf, v_to=vt
            ).collect()
        }
        want_c = {}
        for k in set(sf_) | set(st_):
            if k not in sf_:
                want_c[k] = ("added", st_[k])
            elif k not in st_:
                want_c[k] = ("removed", None)
            elif sf_[k] != st_[k]:
                want_c[k] = ("changed", st_[k])
        assert got_c == want_c, f"changes v{vf}->v{vt}"


# ---------------------------------------------------------------------------
# mv_refresh after each base mutation ≡ python groupby of the modeled state
# ---------------------------------------------------------------------------


@given(
    initial=st.dictionaries(
        st.integers(0, 5), st.integers(0, 9), min_size=2, max_size=6
    ),
    ops=st.lists(
        st.one_of(
            st.tuples(
                st.just("merge"),
                st.dictionaries(
                    st.integers(0, 7), st.integers(0, 9), min_size=1, max_size=4
                ),
            ),
            st.tuples(
                st.just("delete"),
                st.sets(st.integers(0, 7), min_size=1, max_size=3),
            ),
        ),
        min_size=1,
        max_size=3,
    ),
)
@SETTINGS
@pytest.mark.slow
def test_mv_refresh_matches_python_groupby(spark, initial, ops):
    from weather_api_automate_etl_spark.operators import matview

    base = tempfile.mkdtemp(prefix="r12mvbase_")
    mv = tempfile.mkdtemp(prefix="r12mv_")

    def _df(state: dict[int, int]):
        return spark.createDataFrame(
            [(k, v, k % 2) for k, v in state.items()], "k int, v int, p int"
        )

    def aggs():
        return [
            F.sum("v").cast("long").alias("sum_v"),
            F.count(F.lit(1)).cast("long").alias("n"),
        ]

    def check(state: dict[int, int]) -> None:
        got = {
            r.p: (r.sum_v, r.n)
            for r in ledger.ledger_read(spark, mv).collect()
        }
        want: dict[int, list[int]] = {}
        for k, v in state.items():
            acc = want.setdefault(k % 2, [0, 0])
            acc[0] += v
            acc[1] += 1
        assert got == {p: (s, n) for p, (s, n) in want.items()}

    model = dict(initial)
    ledger.ledger_write(spark, _df(model), base, "p")
    matview.mv_build(spark, base, mv, ["p"], aggs())
    check(model)
    for kind, arg in ops:
        if kind == "merge":
            ledger.ledger_merge(spark, base, _df(dict(arg)), "k")
            model.update(arg)
        else:
            keys = spark.createDataFrame([(k,) for k in arg], "k int")
            ledger.ledger_delete(spark, base, keys, "k")
            for k in arg:
                model.pop(k, None)
        matview.mv_refresh(spark, base, mv, ["p"], aggs())
        check(model)
