"""Wave-56 operator tests: cohort LTV curve."""

from __future__ import annotations

import datetime as dt

import pytest

from weather_api_automate_etl_spark.operators import marts


def _ltv(spark, rows):
    # rows: (customer, (year, month, day), revenue)
    df = spark.createDataFrame(
        [(c, dt.datetime(*d), float(r)) for c, d, r in rows],
        "cust long, ts timestamp, rev double",
    )
    out = marts.cohort_ltv(df, "cust", "ts", "rev")
    return {
        (r["cohort_month"].isoformat(), r["age_months"]): r
        for r in out.collect()
    }


def test_ltv_cohorts_and_ages(spark):
    rows = [
        (1, (2024, 1, 5), 10.0), (1, (2024, 2, 9), 20.0),
        (2, (2024, 1, 20), 5.0),
        (3, (2024, 2, 1), 100.0),
    ]
    got = _ltv(spark, rows)
    jan0 = got[("2024-01-01", 0)]
    assert jan0["n_customers"] == 2 and jan0["revenue"] == 15.0
    jan1 = got[("2024-01-01", 1)]
    assert jan1["revenue"] == 20.0 and jan1["cum_revenue"] == 35.0
    assert jan1["ltv_per_customer"] == pytest.approx(17.5)
    feb0 = got[("2024-02-01", 0)]
    assert feb0["n_customers"] == 1 and feb0["ltv_per_customer"] == 100.0


def test_ltv_cumulative_is_monotone(spark):
    rows = [(1, (2024, 1, 1), 10.0), (1, (2024, 3, 1), 1.0),
            (1, (2024, 5, 1), 2.0)]
    got = _ltv(spark, rows)
    cums = [got[k]["cum_revenue"] for k in sorted(got)]
    assert cums == sorted(cums)
    # gap months (age 1, 3) simply have no row — no zero-fill
    assert ("2024-01-01", 1) not in got


def test_ltv_single_order_customer(spark):
    got = _ltv(spark, [(1, (2024, 6, 15), 42.0)])
    assert got[("2024-06-01", 0)]["ltv_per_customer"] == 42.0
