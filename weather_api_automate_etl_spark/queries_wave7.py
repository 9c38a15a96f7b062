"""Round-5 seventh-wave queries: deterministic A/B experiment readout
(hash split + Welch z) and first-touch conversion attribution — the
experimentation / funnel-reporting surface.

Per-query rationale lives in each function docstring; registry/oracle
conventions in queries.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from weather_api_automate_etl_spark.operators import stats
from weather_api_automate_etl_spark.queries import query, t

# ---------------------------------------------------------------------------
# A/B lift (deterministic hash split + Welch z)
# ---------------------------------------------------------------------------

_AB_SALT = "exp1"


@query(
    "q_ab_lift",
    oracle=f"""
    WITH armed AS (
      SELECT CAST(CAST(concat('0x', substr(md5(concat('{_AB_SALT}:',
                                                      CAST(user_id AS VARCHAR))),
                                            1, 8)) AS UBIGINT) % 2 AS INTEGER)
               AS arm,
             value AS v
      FROM events
    ),
    m AS (
      SELECT CAST(count(CASE WHEN arm = 0 THEN v END) AS BIGINT) AS n_a,
             CAST(count(CASE WHEN arm = 1 THEN v END) AS BIGINT) AS n_b,
             ROUND(avg(CASE WHEN arm = 0 THEN v END), 6) AS mean_a,
             ROUND(avg(CASE WHEN arm = 1 THEN v END), 6) AS mean_b,
             ROUND(stddev_samp(CASE WHEN arm = 0 THEN v END), 6) AS sd_a,
             ROUND(stddev_samp(CASE WHEN arm = 1 THEN v END), 6) AS sd_b
      FROM armed
    )
    SELECT n_a, n_b, mean_a, mean_b, sd_a, sd_b,
           ROUND((mean_b - mean_a)
                 / NULLIF(SQRT(sd_a * sd_a / n_a + sd_b * sd_b / n_b), 0),
                 6) + 0.0 AS z,
           ROUND((mean_b - mean_a) / NULLIF(mean_a, 0), 6) + 0.0 AS rel_lift
    FROM m
    """,
    tags=("agg", "analytics"),
)
def q_ab_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic A/B experiment readout
    (operators/stats.py::ab_test_welch): users hash-split 50/50 on a
    salted md5 (replayable, engine-portable — a unit keeps its arm
    across reruns and engines, the mixture-sampling discipline), then
    Welch's unequal-variance z and relative lift between the arms. ONE
    conditional aggregate produces both arms' moments (map-side
    combined, 1-row output); the z derives from the ROUNDED means/sds
    so it is hash-stable."""
    return stats.ab_test_welch(
        t(spark, sf_dir, "events"), "user_id", "value", salt=_AB_SALT
    )


# ---------------------------------------------------------------------------
# first-touch conversion attribution
# ---------------------------------------------------------------------------

_CONV_TARGET = "purchase"


@query(
    "q_first_touch",
    oracle=f"""
    WITH seq AS (
      SELECT user_id, event_type,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY CAST(ts AS TIMESTAMP), event_id)
               AS rn
      FROM events
    ),
    per_unit AS (
      SELECT user_id,
             max(CASE WHEN rn = 1 THEN event_type END) AS first_touch,
             max(CASE WHEN event_type = '{_CONV_TARGET}' THEN 1 ELSE 0 END)
               AS converted
      FROM seq GROUP BY user_id
    )
    SELECT first_touch, CAST(count(*) AS BIGINT) AS n_units,
           CAST(sum(converted) AS BIGINT) AS n_converted,
           ROUND(sum(converted) / CAST(count(*) AS DOUBLE), 6) + 0.0
             AS conversion_rate
    FROM per_unit GROUP BY first_touch
    """,
    tags=("analytics", "windows", "agg"),
)
def q_first_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-touch attribution
    (operators/stats.py::first_touch_conversion): each user's FIRST
    event type (acquisition channel) against whether they ever reached
    'purchase' — conversion counts and rate per channel, the question
    every funnel report starts with. One user-keyed window picks the
    first touch, one user-keyed aggregate flags conversion, then a
    channel-cardinality rollup — nothing joins at event scale."""
    return stats.first_touch_conversion(
        t(spark, sf_dir, "events"),
        "user_id",
        "event_type",
        ("ts", "event_id"),
        target=_CONV_TARGET,
    )
