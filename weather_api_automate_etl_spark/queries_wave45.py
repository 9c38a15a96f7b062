"""Round-9 forty-fifth-wave queries: k-group rank test and
recency-weighted attribution.

Per-query rationale lives in each function docstring; registry/oracle
conventions in queries.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from weather_api_automate_etl_spark.queries import query, t

_KW_ORACLE = """
    WITH base AS (
      SELECT floor(value * 10) / 10 AS v, event_type AS g
      FROM events
      WHERE value IS NOT NULL AND event_type IS NOT NULL
    ),
    vg AS (
      SELECT v, g, CAST(COUNT(*) AS BIGINT) AS c FROM base GROUP BY v, g
    ),
    tot AS (SELECT v, SUM(c) AS cnt FROM vg GROUP BY v),
    ranks AS (
      SELECT v, cnt,
             COALESCE(SUM(cnt) OVER (ORDER BY v
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               + (cnt + 1) / 2.0 AS avg_rank
      FROM tot
    ),
    sc AS (
      SELECT CAST(SUM(cnt) AS DOUBLE) AS nn,
             SUM(CAST(cnt AS DOUBLE) * cnt * cnt - cnt) AS tie
      FROM tot
    ),
    pg AS (
      SELECT g, CAST(SUM(c) AS BIGINT) AS n,
             SUM(c * avg_rank) AS rank_sum
      FROM vg JOIN ranks USING (v) GROUP BY g
    ),
    agg AS (
      SELECT g, n, rank_sum,
             SUM(rank_sum * rank_sum / n) OVER () AS st,
             COUNT(*) OVER () AS k
      FROM pg
    )
    SELECT g AS event_type, n, rank_sum,
           ROUND(rank_sum / n, 6) AS mean_rank,
           ROUND(CASE WHEN k > 1 THEN
             (12.0 / (nn * (nn + 1)) * st - 3.0 * (nn + 1))
             / NULLIF(1.0 - tie / NULLIF(nn * nn * nn - nn, 0), 0)
           END, 6) AS h_stat,
           CAST(k - 1 AS BIGINT) AS dof
    FROM agg, sc
"""


@query("q_kruskal_wallis", oracle=_KW_ORACLE, tags=("stats",))
def q_kruskal_wallis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kruskal-Wallis H over the five event types (operators/stats.py::
    kruskal_wallis, quantized score for real tie structure): one
    (value, group) aggregate, one distinct-value running-sum window
    (the mann_whitney_u dispensation), a value-keyed rank join, and a
    5-row reduction — rank sums exact in doubles, H rounded to 6 with
    the standard tie correction."""
    from weather_api_automate_etl_spark.operators import stats

    ev = t(spark, sf_dir, "events").select(
        (F.floor(F.col("value") * 10) / 10).alias("score"), "event_type"
    )
    return stats.kruskal_wallis(ev, "score", "event_type")


_DECAY_ORACLE = """
    WITH conv AS (
      SELECT user_id AS u, event_id AS cid,
             epoch_us(CAST(ts AS TIMESTAMP)) AS cus
      FROM events WHERE event_type = 'purchase'
    ),
    touch AS (
      SELECT user_id AS u, event_type AS channel,
             epoch_us(CAST(ts AS TIMESTAMP)) AS tus
      FROM events WHERE event_type IN ('view', 'click')
    ),
    tc AS (
      SELECT cid, channel,
             POW(2.0, -CAST(cus - tus AS DOUBLE) / 172800000000.0) AS w
      FROM conv JOIN touch USING (u)
      WHERE tus < cus AND tus >= cus - 604800000000
    ),
    pc AS (SELECT cid, SUM(w) AS wsum FROM tc GROUP BY cid),
    cr AS (
      SELECT channel,
             CAST(COUNT(*) AS BIGINT) AS n_touchpoints,
             CAST(COUNT(DISTINCT cid) AS BIGINT) AS n_conversions,
             ROUND(SUM(w / wsum), 6) AS credit
      FROM tc JOIN pc USING (cid) GROUP BY channel
    ),
    d AS (
      SELECT '(direct)' AS channel,
             CAST(0 AS BIGINT) AS n_touchpoints,
             CAST(COUNT(*) AS BIGINT) AS n_conversions,
             ROUND(CAST(COUNT(*) AS DOUBLE), 6) AS credit
      FROM conv WHERE cid NOT IN (SELECT cid FROM pc)
      HAVING COUNT(*) > 0
    )
    SELECT * FROM cr UNION ALL SELECT * FROM d
"""


@query(
    "q_attribution_decay",
    oracle=_DECAY_ORACLE,
    tags=("stats", "analytics"),
)
def q_attribution_decay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-decay attribution of purchases to view/click touches
    (operators/stats.py::time_decay_attribution, half-life 2 d, window
    7 d): user-keyed join of two filtered scans (fan-out bounded per
    user-week), conversion-keyed weight sum, channel rollup; the
    '(direct)' row keeps total credit = total conversions."""
    from weather_api_automate_etl_spark.operators import stats

    return stats.time_decay_attribution(
        t(spark, sf_dir, "events"),
        "user_id",
        "event_type",
        "ts",
        "event_id",
        "purchase",
        ("view", "click"),
        window_days=7,
        half_life_days=2.0,
    )
