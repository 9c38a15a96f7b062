"""dbt-test-operator parity: violations detected, empty = pass."""

from __future__ import annotations

import pytest
from pyspark.sql import Row

from weather_api_automate_etl_spark.operators import quality


@pytest.fixture()
def df(spark):
    return spark.createDataFrame(
        [Row(k=1, v="a"), Row(k=1, v="b"), Row(k=2, v=None), Row(k=3, v="zz")]
    )


def test_unique_violations(df):
    got = quality.unique_violations(df, "k").collect()
    assert [(r.key, r.n) for r in got] == [(1, 2)]


def test_not_null_violations(df):
    assert quality.not_null_violations(df, "v").count() == 1
    counts = {
        r.column_name: r.violations
        for r in quality.not_null_violation_counts(df, ["k", "v"]).collect()
    }
    assert counts == {"k": 0, "v": 1}


def test_accepted_values_violations(df):
    got = quality.accepted_values_violations(df, "v", ["a", "b"]).collect()
    # NULLs excluded (dbt semantics); 'zz' flagged with count
    assert [(r.value_field, r.n) for r in got] == [("zz", 1)]


def test_expect_empty_raises(df):
    quality.expect_empty(quality.unique_violations(df, "v"), "v unique")  # passes
    with pytest.raises(AssertionError, match="k unique"):
        quality.expect_empty(quality.unique_violations(df, "k"), "k unique")


def test_relationships_violations_detect_orphans(spark):
    child = spark.createDataFrame([(1, "a"), (2, "b"), (None, "c"), (9, "d")],
                                  "fk long, payload string")
    parent = spark.createDataFrame([(1,), (2,)], "pk long")
    from weather_api_automate_etl_spark.operators.quality import (
        relationship_violation_counts,
        relationships_violations,
    )
    bad = relationships_violations(child, "fk", parent, "pk").collect()
    # NULL fk passes (dbt semantics); only the unmatched non-null key fails
    assert [(r.fk, r.payload) for r in bad] == [(9, "d")]
    counts = relationship_violation_counts(
        [("child.fk -> parent.pk", child, "fk", parent, "pk")]
    ).collect()
    assert [(r.relationship, r.violations) for r in counts] == [
        ("child.fk -> parent.pk", 1)
    ]
