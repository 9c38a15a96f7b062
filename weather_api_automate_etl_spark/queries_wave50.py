"""Round-9 fiftieth-wave query: CUPED variance reduction.

Per-query rationale lives in each function docstring; registry/oracle
conventions in queries.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from weather_api_automate_etl_spark.queries import query, t

_CUPED_ORACLE = """
    WITH pu AS (
      SELECT user_id,
             COALESCE(SUM(CASE WHEN CAST(ts AS TIMESTAMP)
                                    < TIMESTAMP '2024-01-16'
                               THEN CAST(floor(value) AS BIGINT) END), 0)
               AS x,
             COALESCE(SUM(CASE WHEN CAST(ts AS TIMESTAMP)
                                    >= TIMESTAMP '2024-01-16'
                               THEN CAST(floor(value) AS BIGINT) END), 0)
               AS y
      FROM events GROUP BY user_id
    ),
    armed AS (
      SELECT CAST(CAST(concat('0x',
               substr(md5('exp1:' || CAST(user_id AS VARCHAR)), 1, 8))
               AS UBIGINT) % 2 AS INTEGER) AS arm, x, y
      FROM pu
    ),
    m AS (
      SELECT CAST(COUNT(CASE WHEN arm = 0 THEN 1 END) AS BIGINT) AS n_a,
             CAST(COUNT(CASE WHEN arm = 1 THEN 1 END) AS BIGINT) AS n_b,
             CAST(SUM(CASE WHEN arm = 0 THEN y END) AS BIGINT) AS ya,
             CAST(SUM(CASE WHEN arm = 1 THEN y END) AS BIGINT) AS yb,
             CAST(SUM(CASE WHEN arm = 0 THEN x END) AS BIGINT) AS xa,
             CAST(SUM(CASE WHEN arm = 1 THEN x END) AS BIGINT) AS xb,
             CAST(COUNT(*) AS DOUBLE) AS n,
             CAST(SUM(x) AS DOUBLE) AS sx,
             CAST(SUM(y) AS DOUBLE) AS sy,
             CAST(SUM(x * y) AS DOUBLE) AS sxy,
             CAST(SUM(x * x) AS DOUBLE) AS sxx,
             CAST(SUM(y * y) AS DOUBLE) AS syy
      FROM armed
    ),
    g AS (
      SELECT *,
             CASE WHEN n * sxx - sx * sx > 1e-14 * n * sxx
                  THEN n * sxx - sx * sx END AS vx,
             CASE WHEN n * syy - sy * sy > 1e-14 * n * syy
                  THEN n * syy - sy * sy END AS vy,
             n * sxy - sx * sy AS cn
      FROM m
    )
    SELECT n_a, n_b,
           ROUND(cn / vx, 6) AS theta,
           ROUND(cn * cn / (vx * vy), 6) AS rho2,
           ROUND(ya / CAST(n_a AS DOUBLE), 6) AS mean_y_a,
           ROUND(yb / CAST(n_b AS DOUBLE), 6) AS mean_y_b,
           ROUND(yb / CAST(n_b AS DOUBLE) - ya / CAST(n_a AS DOUBLE), 6)
             AS raw_diff,
           ROUND(yb / CAST(n_b AS DOUBLE) - ya / CAST(n_a AS DOUBLE)
                 - (cn / vx) * (xb / CAST(n_b AS DOUBLE)
                                - xa / CAST(n_a AS DOUBLE)), 6)
             AS adj_diff
    FROM g
"""


@query("q_cuped", oracle=_CUPED_ORACLE, tags=("stats", "analytics"))
def q_cuped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUPED variance-reduced lift (operators/stats.py::
    cuped_adjusted_lift): one user-keyed aggregate builds exact-integer
    (pre-covariate, post-metric) pairs, one conditional aggregate
    yields both arms' means and the pooled θ moments; the closed-form
    diff_adj identity needs no second per-unit pass. ρ² reports how
    much variance the covariate actually bought."""
    from weather_api_automate_etl_spark.operators import stats

    ev = t(spark, sf_dir, "events")
    post = F.col("ts").cast("timestamp") >= F.to_timestamp(
        F.lit("2024-01-16")
    )
    return stats.cuped_adjusted_lift(
        ev,
        "user_id",
        F.floor(F.col("value")),
        F.floor(F.col("value")),
        post,
        salt="exp1",
    )
