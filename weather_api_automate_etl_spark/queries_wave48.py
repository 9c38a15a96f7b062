"""Round-9 forty-eighth-wave queries: distribution-free intervals and
classical count smoothing.

Per-query rationale lives in each function docstring; registry/oracle
conventions in queries.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from weather_api_automate_etl_spark.queries import query, t

_CONFORMAL_ORACLE = """
    WITH base AS (
      SELECT event_type AS g, value AS y, event_id % 2 = 0 AS cal
      FROM events
    ),
    calr AS (
      SELECT g, y,
             row_number() OVER (PARTITION BY g ORDER BY y) AS rn,
             COUNT(*) OVER (PARTITION BY g) AS n
      FROM base WHERE cal
    ),
    med AS (
      SELECT g, y AS pred FROM calr WHERE rn = floor((n + 1) / 2)
    ),
    res AS (
      SELECT c.g AS g, pred, abs(c.y - pred) AS r
      FROM (SELECT g, y FROM base WHERE cal) c JOIN med USING (g)
    ),
    qh AS (
      SELECT g, pred, r AS qhat, n AS ncal
      FROM (
        SELECT g, pred, r,
               row_number() OVER (PARTITION BY g ORDER BY r) AS rn,
               COUNT(*) OVER (PARTITION BY g) AS n
        FROM res
      )
      WHERE rn = LEAST(CAST(ceil((n + 1) * 0.9) AS BIGINT), n)
    ),
    tst AS (SELECT g, y FROM base WHERE NOT cal)
    SELECT qh.g AS event_type,
           CAST(ncal AS BIGINT) AS n_cal,
           CAST(COUNT(tst.y) AS BIGINT) AS n_test,
           pred, qhat,
           ROUND(SUM(CASE WHEN abs(tst.y - pred) <= qhat
                          THEN 1 ELSE 0 END)
                 / NULLIF(CAST(COUNT(tst.y) AS DOUBLE), 0), 6) AS coverage
    FROM qh LEFT JOIN tst ON tst.g = qh.g
    GROUP BY qh.g, ncal, pred, qhat
"""


@query("q_conformal", oracle=_CONFORMAL_ORACLE, tags=("stats", "mlprep"))
def q_conformal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split-conformal calibration per event type (operators/stats.py::
    conformal_calibration, α = 0.1, calibration = even event ids):
    group-partitioned order-statistic windows only — the empirical
    coverage should sit at or above 0.9, which is the guarantee the
    operator exists to audit."""
    from weather_api_automate_etl_spark.operators import stats

    return stats.conformal_calibration(
        t(spark, sf_dir, "events"),
        "event_type",
        "value",
        F.col("event_id") % 2 == 0,
        alpha=0.1,
    )


_GT_ORACLE = """
    WITH base AS (
      SELECT regexp_split_to_array(lower(trim(text)), '\\s+') AS tk
      FROM documents
    ),
    tok AS (
      SELECT unnest([array_to_string(tk[i:i+2], ' ')
                     FOR i IN range(1, len(tk) - 1)]) AS t
      FROM base WHERE len(tk) >= 3
    ),
    cnt AS (SELECT t, COUNT(*) AS r FROM tok GROUP BY t),
    fof AS (SELECT r, CAST(COUNT(*) AS BIGINT) AS s FROM cnt GROUP BY r),
    tot AS (
      SELECT SUM(r * s) AS nn,
             SUM(CASE WHEN r = 1 THEN s END) AS s1
      FROM fof
    )
    SELECT CAST(f.r AS BIGINT) AS r,
           f.s AS s_r,
           CAST(COALESCE(n2.s, 0) AS BIGINT) AS s_r_next,
           ROUND((f.r + 1) * CAST(n2.s AS DOUBLE) / f.s, 6) AS r_star,
           ROUND(COALESCE(s1, 0) / CAST(nn AS DOUBLE), 6) AS unseen_mass
    FROM fof f LEFT JOIN fof n2 ON n2.r = f.r + 1, tot
    WHERE f.r <= 10
"""


@query("q_good_turing", oracle=_GT_ORACLE, tags=("text",))
def q_good_turing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Good-Turing adjusted counts r* and unseen-type mass over the
    corpus's word-trigram types (operators/textops.py::
    good_turing_counts, shingle_k = 3, r ≤ 10): type-keyed count
    aggregate → vocabulary-sized frequency-of-frequencies → tiny r+1
    self-join; exact BIGINT counts everywhere, r* NULL where
    S(r+1) = 0 (the classical estimator's undefined region, reported
    honestly rather than smoothed)."""
    from weather_api_automate_etl_spark.operators import textops

    return textops.good_turing_counts(
        t(spark, sf_dir, "documents"), "text", max_r=10, shingle_k=3
    )
