"""Round-9 fifty-third-wave queries: operating-point selection and
campaign gains.

Per-query rationale lives in each function docstring; registry/oracle
conventions in queries.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from weather_api_automate_etl_spark.queries import query, t

_SCORED = """
      SELECT floor(value * 10) / 10 AS s,
             CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y,
             event_id
      FROM events
"""

_YOUDEN_ORACLE = f"""
    WITH base AS ({_SCORED}),
    g AS (
      SELECT s, SUM(y) AS pos, SUM(1 - y) AS neg FROM base GROUP BY s
    ),
    c AS (
      SELECT s,
             COALESCE(SUM(pos) OVER (ORDER BY s
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS pos_below,
             COALESCE(SUM(neg) OVER (ORDER BY s
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS neg_below,
             SUM(pos) OVER () AS p,
             SUM(neg) OVER () AS n
      FROM g
    ),
    scored AS (
      SELECT s AS threshold,
             CAST(p AS BIGINT) AS n_pos, CAST(n AS BIGINT) AS n_neg,
             CAST(p - pos_below AS BIGINT) AS tp,
             CAST(n - neg_below AS BIGINT) AS fp,
             (p - pos_below) * n - (n - neg_below) * p AS jnum
      FROM c WHERE p > 0 AND n > 0
    )
    SELECT threshold, n_pos, n_neg, tp, fp,
           ROUND(tp / CAST(n_pos AS DOUBLE), 6) AS tpr,
           ROUND(fp / CAST(n_neg AS DOUBLE), 6) AS fpr,
           ROUND(tp / CAST(n_pos AS DOUBLE)
                 - fp / CAST(n_neg AS DOUBLE), 6) AS youden_j
    FROM scored
    ORDER BY jnum DESC, threshold ASC
    LIMIT 1
"""


@query("q_youden_cutoff", oracle=_YOUDEN_ORACLE, tags=("stats", "mlprep"))
def q_youden_cutoff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Youden-J optimal cutoff (operators/stats.py::
    youden_optimal_cutoff): the roc_auc distinct-score shape plus a
    1-row TakeOrdered argmax on exact integer cross-multiples — never
    a float J comparison, never a per-row global rank."""
    from weather_api_automate_etl_spark.operators import stats

    ev = t(spark, sf_dir, "events")
    return stats.youden_optimal_cutoff(
        ev,
        F.floor(F.col("value") * 10) / 10,
        F.col("event_type") == "purchase",
    )


_GAINS_ORACLE = f"""
    WITH base AS ({_SCORED}),
    b AS (
      SELECT y, ntile(10) OVER (ORDER BY s DESC, event_id) AS bucket
      FROM base
    ),
    agg AS (
      SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(y) AS BIGINT) AS responders
      FROM b GROUP BY bucket
    ),
    w AS (
      SELECT bucket, n, responders,
             SUM(responders) OVER () AS tr,
             SUM(n) OVER () AS tn,
             SUM(responders) OVER (ORDER BY bucket
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cr
      FROM agg
    )
    SELECT bucket, n, responders,
           ROUND(responders / CAST(n AS DOUBLE), 6) AS response_rate,
           ROUND((responders / CAST(n AS DOUBLE))
                 / NULLIF(tr / CAST(tn AS DOUBLE), 0), 6) AS lift,
           ROUND(cr / NULLIF(CAST(tr AS DOUBLE), 0), 6) AS cum_gain
    FROM w
"""


@query("q_gains_table", oracle=_GAINS_ORACLE, tags=("stats", "analytics"))
def q_gains_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decile gains/lift table (operators/stats.py::gains_table): one
    global ntile (the calibration_bins dispensation, deterministic via
    the event-id tiebreak), a bucket-keyed aggregate, and window sums
    over the 10-row result. Exact mode here for oracle parity; the
    100 TB twin is ``boundaries="approx"`` (plan-pinned in
    tests/test_scale_plans.py::test_global_rank_scale_twins)."""
    from weather_api_automate_etl_spark.operators import stats

    ev = t(spark, sf_dir, "events")
    return stats.gains_table(
        ev,
        F.floor(F.col("value") * 10) / 10,
        F.col("event_type") == "purchase",
        n_buckets=10,
        order_cols=["event_id"],
    )
