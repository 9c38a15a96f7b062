"""Round-9 forty-first-wave queries: binary-classifier evaluation.

Per-query rationale lives in each function docstring; registry/oracle
conventions in queries.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from weather_api_automate_etl_spark.queries import query, t

_SCORED = """
      SELECT floor(value * 10) / 10 AS s,
             CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
      FROM events
"""

_ROC_ORACLE = f"""
    WITH base AS ({_SCORED}),
    g AS (
      SELECT s, SUM(y) AS pos, SUM(1 - y) AS neg FROM base GROUP BY s
    ),
    c AS (
      SELECT pos, neg,
             SUM(neg) OVER (ORDER BY s
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - neg
               AS neg_below
      FROM g
    ),
    a AS (
      SELECT CAST(SUM(pos) + SUM(neg) AS BIGINT) AS n,
             CAST(SUM(pos) AS BIGINT) AS n_pos,
             CAST(SUM(neg) AS BIGINT) AS n_neg,
             CAST(COUNT(*) AS BIGINT) AS n_scores,
             CAST(SUM(pos * (2 * neg_below + neg)) AS BIGINT) AS num2
      FROM c
    )
    SELECT n, n_pos, n_neg, n_scores,
           ROUND(num2 / (2.0 * NULLIF(n_pos * n_neg, 0)), 6) AS auc,
           ROUND(num2 / (1.0 * NULLIF(n_pos * n_neg, 0)) - 1.0, 6) AS gini
    FROM a
"""


@query("q_roc_auc", oracle=_ROC_ORACLE, tags=("stats", "mlprep"))
def q_roc_auc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tie-aware ROC AUC (operators/stats.py::roc_auc): does the event
    value discriminate purchases from everything else? AUC via the
    rank identity AUC = Σ pos_s·(neg_below + neg_s/2) / (P·N) over the
    distinct quantized-score domain — all counts exact BIGINT, the one
    unpartitioned window runs on the ~1.8 k-row aggregated score table,
    not the event stream."""
    from weather_api_automate_etl_spark.operators import stats

    ev = t(spark, sf_dir, "events")
    return stats.roc_auc(
        ev,
        F.floor(F.col("value") * 10) / 10,
        F.col("event_type") == "purchase",
    )


_THRESHOLDS = tuple(float(v) for v in range(50, 451, 50))


def _pr_oracle() -> str:
    buf = []
    for i, thr in enumerate(_THRESHOLDS):
        buf.append(
            f"CAST(SUM(CASE WHEN s >= {thr} THEN y END) AS BIGINT)"
            f" AS tp{i}"
        )
        buf.append(
            f"CAST(COUNT(CASE WHEN s >= {thr} THEN 1 END) AS BIGINT)"
            f" AS pp{i}"
        )
    arms = []
    for i, thr in enumerate(_THRESHOLDS):
        arms.append(f"""
      SELECT CAST({thr} AS DOUBLE) AS threshold, n, n_pos,
             pp{i} AS pred_pos, COALESCE(tp{i}, 0) AS tp
      FROM a""")
    return f"""
    WITH base AS ({_SCORED}),
    a AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(y) AS BIGINT) AS n_pos,
             {", ".join(buf)}
      FROM base
    ),
    pts AS ({" UNION ALL ".join(arms)})
    SELECT threshold, n, n_pos, pred_pos, tp,
           ROUND(tp / NULLIF(CAST(pred_pos AS DOUBLE), 0), 6) AS precision,
           ROUND(tp / NULLIF(CAST(n_pos AS DOUBLE), 0), 6) AS recall,
           ROUND(2.0 * (tp / NULLIF(CAST(pred_pos AS DOUBLE), 0))
                     * (tp / NULLIF(CAST(n_pos AS DOUBLE), 0))
                 / NULLIF(tp / NULLIF(CAST(pred_pos AS DOUBLE), 0)
                        + tp / NULLIF(CAST(n_pos AS DOUBLE), 0), 0),
                 6) AS f1
    FROM pts
    """


@query("q_pr_sweep", oracle=_pr_oracle(), tags=("stats", "mlprep"))
def q_pr_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Precision/recall/F1 operating-point sweep (operators/stats.py::
    pr_threshold_sweep, 9-point grid 50..450): the cutoff-selection
    table for any score that gates data. One scan, one single-row
    aggregate (two exact counters per threshold), per-threshold rows
    unfolded from the aggregated row — map-side partials stay one row
    per partition at any scale."""
    from weather_api_automate_etl_spark.operators import stats

    ev = t(spark, sf_dir, "events")
    return stats.pr_threshold_sweep(
        ev,
        F.floor(F.col("value") * 10) / 10,
        F.col("event_type") == "purchase",
        _THRESHOLDS,
    )
