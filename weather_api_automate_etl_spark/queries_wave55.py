"""Round-9 fifty-fifth-wave queries: ops percentiles and stickiness.

Per-query rationale lives in each function docstring; registry/oracle
conventions in queries.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from weather_api_automate_etl_spark.queries import query, t

_PCT_ORACLE = """
    WITH ranked AS (
      SELECT CAST(CAST(ts AS TIMESTAMP) AS DATE) AS g, value AS v,
             row_number() OVER (
               PARTITION BY CAST(CAST(ts AS TIMESTAMP) AS DATE)
               ORDER BY value) AS rn,
             COUNT(*) OVER (
               PARTITION BY CAST(CAST(ts AS TIMESTAMP) AS DATE)) AS n
      FROM events
    )
    SELECT g AS day, CAST(MAX(n) AS BIGINT) AS n,
           MAX(CASE WHEN rn = GREATEST(CAST(ceil(n * 0.5) AS BIGINT), 1)
                    THEN v END) AS p_50,
           MAX(CASE WHEN rn = GREATEST(CAST(ceil(n * 0.95) AS BIGINT), 1)
                    THEN v END) AS p_95
    FROM ranked GROUP BY g
"""


@query("q_daily_percentiles", oracle=_PCT_ORACLE, tags=("stats", "timeseries"))
def q_daily_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact nearest-rank daily p50/p95 (operators/stats.py::
    group_percentiles_exact): one day-partitioned rank window folded
    into the same-keyed aggregate; every reported number is an actual
    event value."""
    from weather_api_automate_etl_spark.operators import stats

    ev = t(spark, sf_dir, "events")
    return stats.group_percentiles_exact(
        ev,
        F.to_date(F.col("ts").cast("timestamp")).alias("day"),
        "value",
        quantiles=(0.5, 0.95),
    ).withColumnRenamed("group", "day")


_STICKY_ORACLE = """
    WITH ud AS (
      SELECT DISTINCT user_id AS u,
             CAST(CAST(ts AS TIMESTAMP) AS DATE) AS d
      FROM events
    ),
    days AS (SELECT DISTINCT d AS day FROM ud),
    dau AS (
      SELECT d AS day, CAST(COUNT(*) AS BIGINT) AS n_dau
      FROM ud GROUP BY d
    ),
    contrib AS (
      SELECT DISTINCT u, d + CAST(i AS INTEGER) AS day
      FROM ud, UNNEST(range(0, 7)) AS t(i)
    ),
    wau AS (
      SELECT c.day AS day, CAST(COUNT(*) AS BIGINT) AS n_wau
      FROM contrib c JOIN days USING (day)
      GROUP BY c.day
    )
    SELECT day, n_dau, n_wau,
           ROUND(n_dau / CAST(n_wau AS DOUBLE), 6) AS stickiness
    FROM dau JOIN wau USING (day)
"""


@query("q_stickiness", oracle=_STICKY_ORACLE, tags=("windows", "analytics"))
def q_stickiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DAU/WAU stickiness per day (operators/windows.py::
    rolling_active_users at w=1 joined with w=7): the engagement-depth
    ratio — WAU ≥ DAU by construction so the division never needs a
    zero guard on observed days."""
    from weather_api_automate_etl_spark.operators import windows

    ev = t(spark, sf_dir, "events")
    dau = windows.rolling_active_users(
        ev, "user_id", "ts", window_days=1
    ).withColumnRenamed("n_active", "n_dau")
    wau = windows.rolling_active_users(
        ev, "user_id", "ts", window_days=7
    ).withColumnRenamed("n_active", "n_wau")
    return dau.join(wau, "day").select(
        "day",
        "n_dau",
        "n_wau",
        F.round(
            F.col("n_dau") / F.col("n_wau").cast("double"), 6
        ).alias("stickiness"),
    )
