"""Round-9 fifty-first-wave query: order-statistic median CI.

Per-query rationale lives in each function docstring; registry/oracle
conventions in queries.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from weather_api_automate_etl_spark.queries import query, t

_MEDIAN_CI_ORACLE = """
    WITH ranked AS (
      SELECT event_type AS g, value AS v,
             row_number() OVER (PARTITION BY event_type ORDER BY value)
               AS rn,
             COUNT(*) OVER (PARTITION BY event_type) AS n
      FROM events
    ),
    rk AS (
      SELECT g, v, rn, n,
             GREATEST(CAST(floor(n / 2.0 - 1.96 * sqrt(n) / 2.0)
                           AS BIGINT), 1) AS lo_rank,
             LEAST(CAST(ceil(n / 2.0 + 1 + 1.96 * sqrt(n) / 2.0)
                        AS BIGINT), n) AS hi_rank,
             CAST(floor((n + 1) / 2.0) AS BIGINT) AS med_rank
      FROM ranked
    )
    SELECT g AS event_type,
           CAST(MAX(n) AS BIGINT) AS n,
           MAX(CASE WHEN rn = med_rank THEN v END) AS median,
           MAX(CASE WHEN rn = lo_rank THEN v END) AS ci_lo,
           MAX(CASE WHEN rn = hi_rank THEN v END) AS ci_hi
    FROM rk GROUP BY g
"""


@query("q_median_ci", oracle=_MEDIAN_CI_ORACLE, tags=("stats",))
def q_median_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sign-test median CI per event type (operators/stats.py::
    median_ci): rank window + same-keyed aggregate, endpoints are
    order statistics of the raw doubles — nothing to round, nothing
    engine-dependent."""
    from weather_api_automate_etl_spark.operators import stats

    return stats.median_ci(
        t(spark, sf_dir, "events"), "event_type", "value", z=1.96
    )
