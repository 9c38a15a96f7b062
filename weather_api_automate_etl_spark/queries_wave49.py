"""Round-9 forty-ninth-wave queries: two more data-contract tests.

Per-query rationale lives in each function docstring; registry/oracle
conventions in queries.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from weather_api_automate_etl_spark.queries import query, t

_FD_ORACLE = """
    SELECT l_partkey AS determinant,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(COUNT(DISTINCT l_suppkey)
                + MAX(CASE WHEN l_suppkey IS NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_distinct_dependents,
           MIN(l_suppkey) AS dependent_min,
           MAX(l_suppkey) AS dependent_max
    FROM lineitem
    WHERE l_partkey IS NOT NULL
    GROUP BY l_partkey
    HAVING COUNT(DISTINCT l_suppkey)
           + MAX(CASE WHEN l_suppkey IS NULL THEN 1 ELSE 0 END) > 1
"""


@query("q_test_functional_dep", oracle=_FD_ORACLE, tags=("quality",))
def q_test_functional_dep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Functional-dependency contract test (operators/quality.py::
    functional_dependency_violations): l_partkey → l_suppkey, reported
    per violating determinant with multiplicity and a deterministic
    min/max dependent sample. One determinant-keyed aggregate with
    map-side combine — the same shape as dbt's compiled unique test,
    one column wider."""
    from weather_api_automate_etl_spark.operators import quality

    return quality.functional_dependency_violations(
        t(spark, sf_dir, "lineitem"), "l_partkey", "l_suppkey"
    )


_MONO_ORACLE = """
    WITH r AS (
      SELECT o_custkey AS key, o_orderdate AS "order",
             o_totalprice AS value,
             lag(o_totalprice) OVER (
               PARTITION BY o_custkey
               ORDER BY o_orderdate, o_totalprice) AS prev_value
      FROM orders
    )
    SELECT key, "order", value, prev_value
    FROM r
    WHERE prev_value IS NOT NULL AND value < prev_value
"""


@query("q_test_monotonic", oracle=_MONO_ORACLE, tags=("quality",))
def q_test_monotonic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monotonicity contract test (operators/quality.py::
    monotonic_violations): o_totalprice non-decreasing per customer in
    o_orderdate order — each violating row carries its predecessor
    value so the break is self-explanatory. One window shuffle on the
    key; ties on the ordering are value-ordered so same-date rows
    cannot false-positive."""
    from weather_api_automate_etl_spark.operators import quality

    return quality.monotonic_violations(
        t(spark, sf_dir, "orders"),
        "o_custkey",
        "o_orderdate",
        "o_totalprice",
    )
