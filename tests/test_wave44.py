"""Wave-44 operator tests: caliper propensity matching."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from weather_api_automate_etl_spark.operators import sampling


def _match(spark, rows, caliper=1.0):
    df = spark.createDataFrame(rows, "b string, s double, t boolean, u long")
    out = sampling.caliper_match(
        df, "b", "s", F.col("t"), "u", caliper=caliper
    )
    return {r["treated_id"]: r for r in out.collect()}


def test_nearest_control_either_side(spark):
    rows = [("d", 1.0, False, 10), ("d", 5.0, True, 1),
            ("d", 5.4, False, 11), ("d", 9.0, False, 12)]
    got = _match(spark, rows)
    r = got[1]
    assert r["control_id"] == 11 and r["dist"] == pytest.approx(0.4)
    assert r["matched"] is True


def test_tie_between_sides_takes_lower_score(spark):
    rows = [("d", 4.0, False, 10), ("d", 5.0, True, 1),
            ("d", 6.0, False, 11)]
    got = _match(spark, rows, caliper=2.0)
    assert got[1]["control_id"] == 10  # below wins the 1.0 = 1.0 tie


def test_exact_score_tie_matches_at_distance_zero(spark):
    rows = [("d", 5.0, False, 10), ("d", 5.0, True, 1)]
    got = _match(spark, rows)
    r = got[1]
    assert r["control_id"] == 10 and r["dist"] == 0.0


def test_caliper_rejects_far_controls(spark):
    rows = [("d", 1.0, False, 10), ("d", 9.0, True, 1)]
    got = _match(spark, rows, caliper=2.0)
    r = got[1]
    assert r["matched"] is False
    assert r["control_id"] is None and r["dist"] is None


def test_no_controls_in_block_is_unmatched(spark):
    rows = [("d", 5.0, True, 1), ("e", 5.0, False, 10)]
    got = _match(spark, rows)
    assert got[1]["matched"] is False and got[1]["control_id"] is None


def test_matching_is_with_replacement(spark):
    rows = [("d", 5.0, False, 10), ("d", 4.9, True, 1),
            ("d", 5.1, True, 2)]
    got = _match(spark, rows)
    assert got[1]["control_id"] == 10 and got[2]["control_id"] == 10


def test_blocks_never_cross(spark):
    rows = [("d", 5.0, True, 1), ("e", 5.0, False, 10),
            ("d", 5.2, False, 11)]
    got = _match(spark, rows)
    assert got[1]["control_id"] == 11


def test_rejects_nonpositive_caliper(spark):
    df = spark.createDataFrame(
        [("d", 1.0, True, 1)], "b string, s double, t boolean, u long"
    )
    with pytest.raises(ValueError):
        sampling.caliper_match(df, "b", "s", F.col("t"), "u", caliper=0.0)
