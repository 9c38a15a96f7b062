"""Differential tests for the time-series queries: the Spark window/agg
formulations must agree with independent pandas/numpy implementations of
the same semantics (ffill, np.interp, duration-weighted mean, dense
calendar grids) over the real sf0.001 events table."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd

from weather_api_automate_etl_spark.queries import REGISTRY, _load_extensions

_load_extensions()
SF = "/root/testdata/sf0.001"


def _events_pdf() -> pd.DataFrame:
    pdf = pd.read_parquet(f"{SF}/events.parquet")
    # Spark reads the ns timestamps truncated to µs (sources/tables.py);
    # mirror that so ordering ties resolve identically
    pdf["ts"] = pdf["ts"].dt.floor("us")
    return pdf.sort_values(["user_id", "ts", "event_id"]).reset_index(drop=True)


def _close(a, b, tol=1e-9) -> bool:
    if a is None and b is None:
        return True
    if a is None or b is None:
        return False
    return math.isclose(a, b, rel_tol=tol, abs_tol=tol)


def test_forward_fill_matches_pandas_ffill(spark):
    got = {
        r.event_id: r.last_purchase_value
        for r in REGISTRY["q_forward_fill"].fn(spark, SF).collect()
    }
    pdf = _events_pdf()
    pdf["pv"] = pdf["value"].where(pdf["event_type"] == "purchase")
    pdf["filled"] = pdf.groupby("user_id")["pv"].ffill().round(6)
    want = {
        int(r.event_id): (None if pd.isna(r.filled) else float(r.filled))
        for r in pdf.itertuples()
    }
    assert len(got) == len(want)
    assert all(_close(got[k], want[k]) for k in want)


def test_linear_interpolate_matches_numpy_interp(spark):
    got = {
        r.event_id: r.interp_value
        for r in REGISTRY["q_linear_interpolate"].fn(spark, SF).collect()
    }
    pdf = _events_pdf()
    want: dict[int, float | None] = {}
    for _, g in pdf.groupby("user_id"):
        ts_us = g["ts"].astype("int64").to_numpy() // 1000
        purchases = g["event_type"].to_numpy() == "purchase"
        ids = g["event_id"].to_numpy()
        if not purchases.any():
            want.update({int(i): None for i in ids})
            continue
        xp, fp = ts_us[purchases].astype(float), g["value"].to_numpy()[purchases]
        interp = np.interp(ts_us.astype(float), xp, fp)
        want.update({int(i): round(float(v), 6) for i, v in zip(ids, interp)})
    assert len(got) == len(want)
    assert all(_close(got[k], want[k], tol=1e-6) for k in want)


def test_time_weighted_avg_matches_pandas(spark):
    got = {
        r.user_id: (r.twa_value, r.n_intervals)
        for r in REGISTRY["q_time_weighted_avg"].fn(spark, SF).collect()
    }
    pdf = _events_pdf()
    want = {}
    for uid, g in pdf.groupby("user_id"):
        ts_us = g["ts"].astype("int64").to_numpy() // 1000
        dur = np.diff(ts_us).astype(float)
        vals = g["value"].to_numpy()[:-1]
        keep = dur > 0
        if keep.sum() == 0:
            continue
        twa = float((vals[keep] * dur[keep]).sum() / dur[keep].sum())
        want[int(uid)] = (round(twa, 4), int(keep.sum()))
    assert set(got) == set(want)
    assert all(
        _close(got[u][0], want[u][0], tol=1e-4) and got[u][1] == want[u][1]
        for u in want
    )


def test_gap_fill_grid_is_dense_and_zero_padded(spark):
    rows = REGISTRY["q_gap_fill"].fn(spark, SF).collect()
    pdf = _events_pdf()
    pdf["day"] = pdf["ts"].dt.date
    raw = pdf.groupby(["event_type", "day"]).size()
    by_type: dict[str, dict] = {}
    for r in rows:
        by_type.setdefault(r.event_type, {})[r.day] = r.n_events
    assert set(by_type) == set(pdf["event_type"].unique())
    for etype, days in by_type.items():
        lo, hi = min(days), max(days)
        # dense: every calendar day between the observed bounds is present
        assert len(days) == (hi - lo).days + 1
        for day, n in days.items():
            assert n == raw.get((etype, day), 0)


def test_hopping_windows_double_count_invariant(spark):
    # every event lands in exactly two 10min/5min hop windows, so the
    # window-level counts must sum to exactly 2x the raw event count
    rows = REGISTRY["q_hopping_windows"].fn(spark, SF).collect()
    raw = len(_events_pdf())
    assert sum(r.n for r in rows) == 2 * raw


def test_trailing_window_matches_pandas_rolling(spark):
    rows = REGISTRY["q_trailing_window"].fn(spark, SF).collect()
    pdf = pd.read_parquet(f"{SF}/orders.parquet")
    daily = (
        pdf.assign(day=pdf["o_orderdate"].dt.floor("us").dt.normalize())
        .groupby("day")["o_totalprice"].sum().sort_index()
    )
    want_sum = daily.rolling("7D").sum()
    want_cnt = daily.rolling("7D").count()
    got = {r.day: (r.trailing_7d, r.days_in_window) for r in rows}
    assert len(got) == len(daily)
    for day, s in want_sum.items():
        g_sum, g_cnt = got[day.date()]
        assert math.isclose(g_sum, round(s, 2), rel_tol=1e-9, abs_tol=1e-6)
        assert g_cnt == int(want_cnt[day])
