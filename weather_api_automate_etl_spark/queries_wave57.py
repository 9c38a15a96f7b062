"""Round-9 fifty-seventh-wave queries: funnel timing and experiment
design power.

Per-query rationale lives in each function docstring; registry/oracle
conventions in queries.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from weather_api_automate_etl_spark.queries import query, t

_TTC_ORACLE = """
    WITH u AS (
      SELECT user_id,
             MIN(CASE WHEN event_type = 'view'
                      THEN CAST(ts AS TIMESTAMP) END) AS fv,
             MIN(CASE WHEN event_type = 'purchase'
                      THEN CAST(ts AS TIMESTAMP) END) AS fp
      FROM events GROUP BY user_id
    ),
    d AS (
      SELECT CAST(floor((epoch_us(fp) - epoch_us(fv)) / 1000000.0)
                  AS BIGINT) AS ds
      FROM u WHERE fv IS NOT NULL AND fp IS NOT NULL AND fp > fv
    ),
    g AS (SELECT ds, COUNT(*) AS c FROM d GROUP BY ds),
    cum AS (
      SELECT ds,
             SUM(c) OVER (ORDER BY ds
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cc,
             SUM(c) OVER () AS n
      FROM g
    ),
    qs AS (
      SELECT CAST(MAX(n) AS BIGINT) AS nconv,
             MIN(CASE WHEN cc >= ceil(n * 0.5) THEN ds END)
               AS median_delay_s,
             MIN(CASE WHEN cc >= ceil(n * 0.9) THEN ds END)
               AS p90_delay_s
      FROM cum
    ),
    cnt AS (
      SELECT CAST(COUNT(fv) AS BIGINT) AS n_from FROM u
    )
    SELECT n_from,
           COALESCE(nconv, 0) AS n_converted,
           ROUND(COALESCE(nconv, 0)
                 / NULLIF(CAST(n_from AS DOUBLE), 0), 6) AS conv_rate,
           median_delay_s, p90_delay_s
    FROM cnt, qs
"""


@query("q_time_to_convert", oracle=_TTC_ORACLE, tags=("stats", "analytics"))
def q_time_to_convert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """View → purchase conversion timing (operators/stats.py::
    time_to_convert): per-user first-timestamp aggregate, exact
    epoch-micro delays quantized to seconds, and order statistics over
    the distinct delay domain — scale-safe at any converter count."""
    from weather_api_automate_etl_spark.operators import stats

    return stats.time_to_convert(
        t(spark, sf_dir, "events"), "user_id", "event_type", "ts",
        "view", "purchase",
    )


_MDE_ORACLE = """
    WITH armed AS (
      SELECT CAST(CAST(concat('0x',
               substr(md5('exp1:' || CAST(user_id AS VARCHAR)), 1, 8))
               AS UBIGINT) % 2 AS INTEGER) AS arm,
             value AS v
      FROM events
    ),
    m AS (
      SELECT CAST(COUNT(CASE WHEN arm = 0 THEN v END) AS BIGINT) AS n_a,
             CAST(COUNT(CASE WHEN arm = 1 THEN v END) AS BIGINT) AS n_b,
             ROUND(AVG(CASE WHEN arm = 0 THEN v END), 6) AS mean_a,
             ROUND(stddev_samp(CASE WHEN arm = 0 THEN v END), 6) AS sd_a,
             ROUND(stddev_samp(CASE WHEN arm = 1 THEN v END), 6) AS sd_b
      FROM armed
    ),
    g AS (
      SELECT *, sqrt(sd_a * sd_a / n_a + sd_b * sd_b / n_b) AS se
      FROM m
    )
    SELECT n_a, n_b, mean_a, sd_a, sd_b,
           ROUND(CASE WHEN se > 0 THEN 2.801585 * se END, 6) AS mde_abs,
           ROUND(CASE WHEN se > 0 THEN 2.801585 * se END
                 / NULLIF(mean_a, 0), 6) AS mde_rel
    FROM g
"""


@query("q_mde", oracle=_MDE_ORACLE, tags=("stats", "analytics"))
def q_mde(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Post-hoc minimum detectable effect (operators/stats.py::
    minimum_detectable_effect): one conditional aggregate on the shared
    salted-md5 split, rounded-moment inputs, closed-form
    (z_{α/2}+z_β)·SE — the is-this-test-even-powered sanity number."""
    from weather_api_automate_etl_spark.operators import stats

    return stats.minimum_detectable_effect(
        t(spark, sf_dir, "events"), "user_id", "value"
    )
