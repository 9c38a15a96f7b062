"""Round-9 fifty-second-wave queries: paired classifier comparison and
annotation agreement.

Per-query rationale lives in each function docstring; registry/oracle
conventions in queries.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from weather_api_automate_etl_spark.queries import query, t

_MCNEMAR_ORACLE = """
    WITH p AS (
      SELECT CASE WHEN (value >= 100) = (event_type = 'purchase')
                  THEN 1 ELSE 0 END AS a,
             CASE WHEN (value >= 250) = (event_type = 'purchase')
                  THEN 1 ELSE 0 END AS b
      FROM events
    ),
    m AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(a * b) AS BIGINT) AS both_correct,
             CAST(SUM((1 - a) * (1 - b)) AS BIGINT) AS both_wrong,
             CAST(SUM(a * (1 - b)) AS BIGINT) AS a_only_correct,
             CAST(SUM((1 - a) * b) AS BIGINT) AS b_only_correct
      FROM p
    )
    SELECT n, both_correct, both_wrong, a_only_correct, b_only_correct,
           ROUND((a_only_correct - b_only_correct)
                 * (a_only_correct - b_only_correct)
                 / NULLIF(CAST(a_only_correct + b_only_correct AS DOUBLE),
                          0), 6) AS chi2
    FROM m
"""


@query("q_mcnemar", oracle=_MCNEMAR_ORACLE, tags=("stats", "mlprep"))
def q_mcnemar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """McNemar paired-classifier test (operators/stats.py::
    mcnemar_test): one conditional aggregate builds all four exact
    contingency cells; χ² = (b−c)²/(b+c) over the discordant pair
    only — map-side combined, 1-row output."""
    from weather_api_automate_etl_spark.operators import stats

    ev = t(spark, sf_dir, "events")
    y = F.col("event_type") == "purchase"
    return stats.mcnemar_test(
        ev, y, F.col("value") >= 100, F.col("value") >= 250
    )


_KAPPA_ORACLE = """
    WITH p AS (
      SELECT CASE WHEN value >= 100 THEN 1 ELSE 0 END AS a,
             CASE WHEN value >= 250 THEN 1 ELSE 0 END AS b
      FROM events
    ),
    m AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(a * b) AS BIGINT) AS n11,
             CAST(SUM((1 - a) * (1 - b)) AS BIGINT) AS n00,
             CAST(SUM(a * (1 - b)) AS BIGINT) AS n10,
             CAST(SUM((1 - a) * b) AS BIGINT) AS n01
      FROM p
    )
    SELECT n, n11, n00, n10, n01,
           ROUND((n11 + n00) / CAST(n AS DOUBLE), 6) AS p_o,
           ROUND(((n11 + n10) / CAST(n AS DOUBLE))
                 * ((n11 + n01) / CAST(n AS DOUBLE))
                 + (1.0 - (n11 + n10) / CAST(n AS DOUBLE))
                 * (1.0 - (n11 + n01) / CAST(n AS DOUBLE)), 6) AS p_e,
           ROUND(((n11 + n00) / CAST(n AS DOUBLE)
                  - (((n11 + n10) / CAST(n AS DOUBLE))
                     * ((n11 + n01) / CAST(n AS DOUBLE))
                     + (1.0 - (n11 + n10) / CAST(n AS DOUBLE))
                     * (1.0 - (n11 + n01) / CAST(n AS DOUBLE))))
                 / NULLIF(1.0 - (((n11 + n10) / CAST(n AS DOUBLE))
                     * ((n11 + n01) / CAST(n AS DOUBLE))
                     + (1.0 - (n11 + n10) / CAST(n AS DOUBLE))
                     * (1.0 - (n11 + n01) / CAST(n AS DOUBLE))), 0),
                 6) AS kappa
    FROM m
"""


@query("q_cohens_kappa", oracle=_KAPPA_ORACLE, tags=("stats", "quality"))
def q_cohens_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohen's κ between two derived verdicts (operators/stats.py::
    cohens_kappa): exact contingency cells from one scan; κ discounts
    the chance agreement that raw percent-agreement overstates."""
    from weather_api_automate_etl_spark.operators import stats

    ev = t(spark, sf_dir, "events")
    return stats.cohens_kappa(
        ev, F.col("value") >= 100, F.col("value") >= 250
    )
