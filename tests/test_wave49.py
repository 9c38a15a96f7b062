"""Wave-49 operator tests: FD and monotonicity contract tests."""

from __future__ import annotations

from weather_api_automate_etl_spark.operators import quality


def _fd(spark, rows):
    df = spark.createDataFrame(rows, "d string, v string")
    out = quality.functional_dependency_violations(df, "d", "v")
    return {r["determinant"]: r for r in out.collect()}


def test_fd_healthy_mapping_is_empty(spark):
    rows = [("a", "x"), ("a", "x"), ("b", "y")]
    assert _fd(spark, rows) == {}


def test_fd_violation_reports_multiplicity_and_sample(spark):
    rows = [("a", "x"), ("a", "y"), ("a", "y"), ("b", "z")]
    got = _fd(spark, rows)
    assert set(got) == {"a"}
    r = got["a"]
    assert r["n_rows"] == 3 and r["n_distinct_dependents"] == 2
    assert r["dependent_min"] == "x" and r["dependent_max"] == "y"


def test_fd_null_dependent_beside_value_is_violation(spark):
    rows = [("a", "x"), ("a", None)]
    got = _fd(spark, rows)
    assert got["a"]["n_distinct_dependents"] == 2


def test_fd_all_null_dependents_is_single_mapping(spark):
    # one consistent (NULL) mapping: not a violation
    rows = [("a", None), ("a", None)]
    assert _fd(spark, rows) == {}


def test_fd_null_determinants_skipped(spark):
    rows = [(None, "x"), (None, "y")]
    assert _fd(spark, rows) == {}


def _mono(spark, rows, strict=False):
    df = spark.createDataFrame(rows, "k string, o int, v long")
    return quality.monotonic_violations(
        df, "k", "o", "v", strict=strict
    ).collect()


def test_monotonic_pass_is_empty(spark):
    rows = [("a", 1, 10), ("a", 2, 10), ("a", 3, 20)]
    assert _mono(spark, rows) == []


def test_monotonic_drop_reports_prev_value(spark):
    rows = [("a", 1, 10), ("a", 2, 5), ("a", 3, 7)]
    got = _mono(spark, rows)
    assert len(got) == 1
    assert got[0]["value"] == 5 and got[0]["prev_value"] == 10


def test_monotonic_strict_flags_plateaus(spark):
    rows = [("a", 1, 10), ("a", 2, 10)]
    assert _mono(spark, rows) == []
    got = _mono(spark, rows, strict=True)
    assert len(got) == 1 and got[0]["prev_value"] == 10


def test_monotonic_keys_independent(spark):
    rows = [("a", 1, 10), ("b", 2, 5)]
    assert _mono(spark, rows) == []


def test_monotonic_order_ties_value_sorted(spark):
    # same order key: values sorted within the tie, so no false positive
    rows = [("a", 1, 20), ("a", 1, 10)]
    assert _mono(spark, rows) == []
