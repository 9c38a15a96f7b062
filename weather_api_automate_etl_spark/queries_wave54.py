"""Round-9 fifty-fourth-wave queries: engagement actives.

Per-query rationale lives in each function docstring; registry/oracle
conventions in queries.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from weather_api_automate_etl_spark.queries import query, t

_ROLLING_ORACLE = """
    WITH ud AS (
      SELECT DISTINCT user_id AS u,
             CAST(CAST(ts AS TIMESTAMP) AS DATE) AS d
      FROM events
    ),
    days AS (SELECT DISTINCT d AS day FROM ud),
    contrib AS (
      SELECT DISTINCT u, d + CAST(i AS INTEGER) AS day
      FROM ud, UNNEST(range(0, 7)) AS t(i)
    )
    SELECT c.day AS day, CAST(COUNT(*) AS BIGINT) AS n_active
    FROM contrib c JOIN days USING (day)
    GROUP BY c.day
"""


@query("q_rolling_actives", oracle=_ROLLING_ORACLE, tags=("windows", "analytics"))
def q_rolling_actives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """7-day rolling distinct actives (operators/windows.py::
    rolling_active_users): the (user, day) dedupe is the only row-scale
    shuffle; the ×7 contribute-forward explode runs on the deduped
    grain, and target days clamp to the data's own day set via a tiny
    broadcast."""
    from weather_api_automate_etl_spark.operators import windows

    return windows.rolling_active_users(
        t(spark, sf_dir, "events"), "user_id", "ts", window_days=7
    )


_NVR_ORACLE = """
    WITH ud AS (
      SELECT DISTINCT user_id AS u,
             CAST(CAST(ts AS TIMESTAMP) AS DATE) AS d
      FROM events
    ),
    fd AS (SELECT u, MIN(d) AS first_d FROM ud GROUP BY u)
    SELECT ud.d AS day,
           CAST(SUM(CASE WHEN ud.d = fd.first_d THEN 1 ELSE 0 END)
                AS BIGINT) AS n_new,
           CAST(SUM(CASE WHEN ud.d > fd.first_d THEN 1 ELSE 0 END)
                AS BIGINT) AS n_returning,
           CAST(COUNT(*) AS BIGINT) AS n_active
    FROM ud JOIN fd USING (u)
    GROUP BY ud.d
"""


@query("q_new_vs_returning", oracle=_NVR_ORACLE, tags=("windows", "analytics"))
def q_new_vs_returning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily new-vs-returning user split (operators/windows.py::
    new_vs_returning): per-user first-day aggregate joined back on the
    user key the grain is already partitioned by, then one day
    rollup — exact counts everywhere."""
    from weather_api_automate_etl_spark.operators import windows

    return windows.new_vs_returning(
        t(spark, sf_dir, "events"), "user_id", "ts"
    )
