"""Round-9 fifty-sixth-wave query: cohort LTV curve.

Per-query rationale lives in each function docstring; registry/oracle
conventions in queries.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from weather_api_automate_etl_spark.queries import query, t

_LTV_ORACLE = """
    WITH base AS (
      SELECT o_custkey AS c, date_trunc('month', o_orderdate) AS m,
             o_totalprice AS r
      FROM orders
    ),
    fst AS (SELECT c, MIN(m) AS cohort FROM base GROUP BY c),
    sizes AS (
      SELECT cohort, CAST(COUNT(*) AS BIGINT) AS n_customers
      FROM fst GROUP BY cohort
    ),
    cells AS (
      SELECT cohort,
             CAST(datediff('month', cohort, m) AS INTEGER) AS age_months,
             SUM(r) AS rev
      FROM base JOIN fst USING (c) GROUP BY 1, 2
    ),
    cum AS (
      SELECT cohort, age_months, rev,
             SUM(rev) OVER (PARTITION BY cohort ORDER BY age_months
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cumr
      FROM cells
    )
    SELECT CAST(cohort AS DATE) AS cohort_month, age_months, n_customers,
           ROUND(rev, 6) AS revenue,
           ROUND(cumr, 6) AS cum_revenue,
           ROUND(cumr / CAST(n_customers AS DOUBLE), 6) AS ltv_per_customer
    FROM cum JOIN sizes USING (cohort)
"""


@query("q_cohort_ltv", oracle=_LTV_ORACLE, tags=("analytics", "marts"))
def q_cohort_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monthly-cohort LTV curve (operators/marts.py::cohort_ltv): one
    per-customer min aggregate joined back on the customer key, one
    months-sized (cohort, age) rollup, a cumulative window over that
    tiny table — nothing row-scale past the first two shuffles."""
    from weather_api_automate_etl_spark.operators import marts

    return marts.cohort_ltv(
        t(spark, sf_dir, "orders"), "o_custkey", "o_orderdate",
        "o_totalprice",
    )
