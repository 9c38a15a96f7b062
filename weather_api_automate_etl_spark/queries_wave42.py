"""Round-9 forty-second-wave queries: interval union and lead/lag
series screening.

Per-query rationale lives in each function docstring; registry/oracle
conventions in queries.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from weather_api_automate_etl_spark.queries import query, t

_COALESCE_ORACLE = """
    WITH iv AS (
      SELECT user_id,
             epoch_us(CAST(ts AS TIMESTAMP)) AS s,
             epoch_us(CAST(ts AS TIMESTAMP))
               + CAST(floor(value * 60) AS BIGINT) * 1000000 AS e
      FROM events
    ),
    marked AS (
      SELECT user_id, s, e,
             CASE WHEN s > MAX(e) OVER (
                    PARTITION BY user_id ORDER BY s, e
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                  OR MAX(e) OVER (
                    PARTITION BY user_id ORDER BY s, e
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                    IS NULL
                  THEN 1 ELSE 0 END AS new_island
      FROM iv
    ),
    isl AS (
      SELECT user_id, s, e,
             SUM(new_island) OVER (
               PARTITION BY user_id ORDER BY s, e
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS island_seq
      FROM marked
    )
    SELECT user_id,
           CAST(island_seq AS BIGINT) AS island_seq,
           MIN(s) AS island_start_us,
           MAX(e) AS island_end_us,
           CAST(COUNT(*) AS BIGINT) AS n_intervals,
           MAX(e) - MIN(s) AS covered_us
    FROM isl GROUP BY user_id, island_seq
"""


@query(
    "q_interval_coalesce",
    oracle=_COALESCE_ORACLE,
    tags=("windows", "analytics"),
)
def q_interval_coalesce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user interval union (operators/windows.py::coalesce_intervals):
    merge every overlapping/touching [ts, ts + ⌊value·60⌋ s] activity
    interval into islands and report covered micros — one shuffle on
    user_id shared by both window passes and the island aggregate. The
    running-max-end island rule handles containment (a long interval
    swallowing later short ones), which naive lag(end) misses."""
    from weather_api_automate_etl_spark.operators import windows

    ev = t(spark, sf_dir, "events")
    start = F.unix_micros(F.col("ts").cast("timestamp"))
    dur_us = F.floor(F.col("value") * 60).cast("long") * F.lit(1_000_000)
    return windows.coalesce_intervals(
        ev, "user_id", start, start + dur_us
    )


_CCF_ORACLE = """
    WITH daily AS (
      SELECT CAST(CAST(ts AS TIMESTAMP) AS DATE) AS d,
             CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                  AS DOUBLE) AS x,
             CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
                  AS DOUBLE) AS y
      FROM events GROUP BY 1
    ),
    lags AS (SELECT unnest(range(-7, 8)) AS lag),
    p AS (
      SELECT l.lag AS lag, a.x AS x, b.y AS y
      FROM daily a
      CROSS JOIN lags l
      JOIN daily b ON b.d = a.d + CAST(l.lag AS INTEGER)
    ),
    m AS (
      SELECT lag, CAST(COUNT(*) AS DOUBLE) AS n,
             SUM(x) AS sx, SUM(y) AS sy, SUM(x * y) AS sxy,
             SUM(x * x) AS sxx, SUM(y * y) AS syy
      FROM p GROUP BY lag
    )
    SELECT CAST(lag AS INTEGER) AS lag, CAST(n AS BIGINT) AS n_days,
           ROUND((n * sxy - sx * sy) / SQRT(vx * vy), 6) + 0.0 AS r_xy
    FROM (
      SELECT *,
             CASE WHEN n * sxx - sx * sx > 1e-14 * n * sxx
                  THEN n * sxx - sx * sx END AS vx,
             CASE WHEN n * syy - sy * sy > 1e-14 * n * syy
                  THEN n * syy - sy * sy END AS vy
      FROM m
    )
"""


@query("q_cross_corr", oracle=_CCF_ORACLE, tags=("timeseries", "stats"))
def q_cross_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """±7-day cross-correlation of daily purchase vs click counts
    (operators/timeseries.py::cross_correlation): the event stream is
    scanned ONCE into a days-sized table; the lag explode and
    self-join run on that tiny table (AQE broadcasts it), and each
    lag's Pearson r comes from exact-integer moment sums behind the
    shared relative variance floor."""
    from weather_api_automate_etl_spark.operators import timeseries

    ev = t(spark, sf_dir, "events")
    return timeseries.cross_correlation(
        ev,
        "ts",
        F.when(F.col("event_type") == "purchase", 1).otherwise(0),
        F.when(F.col("event_type") == "click", 1).otherwise(0),
        max_lag=7,
    )
