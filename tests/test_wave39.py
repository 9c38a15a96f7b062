"""Wave-39 operator tests: min-max scaling and ordinal encoding."""

from __future__ import annotations

import pytest

from weather_api_automate_etl_spark.operators import sampling


# ---------------------------------------------------------------------------
# min-max scaling
# ---------------------------------------------------------------------------


def _scale(spark, rows):
    df = spark.createDataFrame(rows, "g string, v double")
    return sampling.minmax_scale(df, "g", "v").collect()


def test_minmax_scales_per_group_range(spark):
    rows = [("a", 10.0), ("a", 20.0), ("a", 30.0),
            ("b", 0.0), ("b", 100.0)]
    got = {(r["g"], r["v"]): r["v_scaled"] for r in _scale(spark, rows)}
    assert got[("a", 10.0)] == 0.0 and got[("a", 30.0)] == 1.0
    assert got[("a", 20.0)] == pytest.approx(0.5)
    assert got[("b", 100.0)] == 1.0


def test_minmax_constant_group_yields_null(spark):
    rows = [("c", 5.0), ("c", 5.0)]
    got = _scale(spark, rows)
    assert all(r["v_scaled"] is None for r in got)


def test_minmax_null_group_rows_survive_and_scale_together(spark):
    """Round-8 advice: the range join must preserve every input row.
    NULL-group rows match the NULL group groupBy itself emits (null-safe
    left join), so they scale against each other — SQL grouping
    semantics, same row-preserving contract as median_impute."""
    rows = [("a", 10.0), ("a", 30.0), (None, 0.0), (None, 50.0)]
    got = _scale(spark, rows)
    assert len(got) == 4  # nothing dropped
    nulls = {r["v"]: r["v_scaled"] for r in got if r["g"] is None}
    assert nulls == {0.0: 0.0, 50.0: 1.0}


# ---------------------------------------------------------------------------
# ordinal encoding
# ---------------------------------------------------------------------------


def _enc(spark, cats):
    df = spark.createDataFrame([(c,) for c in cats], "c string")
    return sampling.ordinal_encode(df, "c").collect()


def test_ordinal_modal_category_gets_code_one(spark):
    cats = ["x"] * 5 + ["y"] * 3 + ["z"] * 1
    got = {r["c"]: r["c_code"] for r in _enc(spark, cats)}
    assert got == {"x": 1, "y": 2, "z": 3}


def test_ordinal_frequency_ties_break_lexicographically(spark):
    cats = ["b", "b", "a", "a", "c"]
    got = {r["c"]: r["c_code"] for r in _enc(spark, cats)}
    assert got["a"] == 1 and got["b"] == 2 and got["c"] == 3


def test_ordinal_null_passes_through(spark):
    got = _enc(spark, ["a", None, "a"])
    nulls = [r for r in got if r["c"] is None]
    assert len(nulls) == 1 and nulls[0]["c_code"] is None
