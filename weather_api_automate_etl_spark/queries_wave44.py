"""Round-9 forty-fourth-wave query: caliper propensity matching.

Per-query rationale lives in each function docstring; registry/oracle
conventions in queries.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from weather_api_automate_etl_spark.queries import query, t

_MATCH_ORACLE = """
    WITH base AS (
      SELECT CAST(CAST(ts AS TIMESTAMP) AS DATE) AS b,
             value AS s,
             event_type = 'purchase' AS t,
             event_id AS u
      FROM events WHERE event_type IN ('purchase', 'view')
    ),
    cand AS (
      SELECT b, s, t, u,
             last_value(CASE WHEN NOT t THEN s END IGNORE NULLS) OVER w_lo
               AS lo_s,
             last_value(CASE WHEN NOT t THEN u END IGNORE NULLS) OVER w_lo
               AS lo_u,
             first_value(CASE WHEN NOT t THEN s END IGNORE NULLS) OVER w_hi
               AS hi_s,
             first_value(CASE WHEN NOT t THEN u END IGNORE NULLS) OVER w_hi
               AS hi_u
      FROM base
      WINDOW
        w_lo AS (PARTITION BY b ORDER BY s, CAST(t AS INTEGER), u
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
        w_hi AS (PARTITION BY b ORDER BY s, CAST(t AS INTEGER), u
                 ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)
    ),
    picked AS (
      SELECT b, s, u,
             CASE WHEN lo_s IS NOT NULL
                       AND (hi_s IS NULL OR s - lo_s <= hi_s - s)
                  THEN lo_s ELSE hi_s END AS ps,
             CASE WHEN lo_s IS NOT NULL
                       AND (hi_s IS NULL OR s - lo_s <= hi_s - s)
                  THEN lo_u ELSE hi_u END AS pu
      FROM cand WHERE t
    )
    SELECT b AS block,
           u AS treated_id,
           s AS treated_score,
           CASE WHEN abs(s - ps) <= 2.0 THEN pu END AS control_id,
           CASE WHEN abs(s - ps) <= 2.0 THEN ps END AS control_score,
           CASE WHEN abs(s - ps) <= 2.0 THEN abs(s - ps) END AS dist,
           COALESCE(abs(s - ps) <= 2.0, FALSE) AS matched
    FROM picked
"""


@query("q_caliper_match", oracle=_MATCH_ORACLE, tags=("sampling", "stats"))
def q_caliper_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Caliper nearest-neighbor matching (operators/sampling.py::
    caliper_match, caliper 2.0, blocks = dates): the asof union-merge
    trick on the score axis — one shuffle on the block key, one window
    pass for both match directions, never a treated×control pairwise
    join; every distance/tiebreak comparison runs on exact raw doubles
    so the pick sequence is engine-reproducible."""
    from weather_api_automate_etl_spark.operators import sampling

    ev = t(spark, sf_dir, "events").filter(
        F.col("event_type").isin("purchase", "view")
    )
    return sampling.caliper_match(
        ev,
        F.to_date(F.col("ts").cast("timestamp")),
        F.col("value"),
        F.col("event_type") == "purchase",
        "event_id",
        caliper=2.0,
    )
