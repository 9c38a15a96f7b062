"""Round-5 sixth-wave queries: Zipf-law fit of each source's token
spectrum, Goh–Barabási burstiness of event inter-arrivals, and
per-source Gini inequality of document lengths — the corpus-health and
traffic-shape diagnostics run before mixing or capacity decisions.

Per-query rationale lives in each function docstring; registry/oracle
conventions in queries.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from weather_api_automate_etl_spark.operators import stats, textops, timeseries
from weather_api_automate_etl_spark.queries import query, t
from weather_api_automate_etl_spark.queries_ext import _TOKENS_SQL

# ---------------------------------------------------------------------------
# Zipf-law fit (corpus-health screen per source)
# ---------------------------------------------------------------------------


@query(
    "q_zipf_fit",
    oracle=f"""
    WITH tok AS (
      SELECT source, unnest(list_filter({_TOKENS_SQL}, t -> t != '')) AS term
      FROM documents
    ),
    counts AS (
      SELECT source, term, count(*) AS freq FROM tok GROUP BY source, term
    ),
    pts AS (
      SELECT source,
             ln(CAST(row_number() OVER (PARTITION BY source
                                        ORDER BY freq DESC, term ASC)
                     AS DOUBLE)) AS x,
             ln(CAST(freq AS DOUBLE)) AS y
      FROM counts
    ),
    m AS (
      SELECT source, CAST(count(*) AS DOUBLE) AS n,
             SUM(x) AS sx, SUM(y) AS sy, SUM(x * y) AS sxy,
             SUM(x * x) AS sxx, SUM(y * y) AS syy
      FROM pts GROUP BY source
    )
    SELECT source, CAST(n AS BIGINT) AS n_vocab,
           ROUND((n * sxy - sx * sy) / vx, 6) + 0.0 AS slope,
           ROUND((sy - (n * sxy - sx * sy) / vx * sx) / n, 6) + 0.0
             AS intercept,
           ROUND(POWER(n * sxy - sx * sy, 2) / (vx * vy), 6) AS r2
    FROM (
      SELECT *,
             CASE WHEN n * sxx - sx * sx > 1e-14 * n * sxx
                  THEN n * sxx - sx * sx END AS vx,
             CASE WHEN n * syy - sy * sy > 1e-14 * n * syy
                  THEN n * syy - sy * sy END AS vy
      FROM m
    )
    """,
    tags=("text", "corpus", "agg"),
)
def q_zipf_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf-law fit per source (operators/textops.py::zipf_fit): OLS of
    ln(freq) on ln(rank) over each source's vocabulary — natural
    language sits near slope −1, templated strata flatten, random-token
    spam departs — the corpus-health screen run per source before
    mixing. The rank window runs over the vocabulary COUNT table (never
    the token stream) partitioned by source; the fit is the closed-form
    moment recipe with the relative variance floor."""
    return textops.zipf_fit(t(spark, sf_dir, "documents"), "source")


# ---------------------------------------------------------------------------
# burstiness of event inter-arrivals (traffic-shape diagnostic)
# ---------------------------------------------------------------------------


@query(
    "q_burstiness",
    oracle="""
    WITH p AS (
      SELECT user_id, CAST(ts AS TIMESTAMP) AS t,
             lag(CAST(ts AS TIMESTAMP))
               OVER (PARTITION BY user_id
                     ORDER BY CAST(ts AS TIMESTAMP), event_id) AS tp
      FROM events
    ),
    g AS (
      SELECT user_id, CAST(date_diff('second', tp, t) AS DOUBLE) AS gap
      FROM p WHERE tp IS NOT NULL
    ),
    m AS (
      SELECT user_id, CAST(count(*) AS BIGINT) AS n_gaps,
             ROUND(avg(gap), 6) AS mu, ROUND(stddev_samp(gap), 6) AS sigma
      FROM g GROUP BY user_id
    )
    SELECT user_id, n_gaps, mu, sigma,
           ROUND((sigma - mu) / NULLIF(sigma + mu, 0), 6) + 0.0 AS burstiness
    FROM m
    """,
    tags=("timeseries", "agg"),
)
def q_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Goh–Barabási burstiness of each user's inter-arrival times
    (operators/timeseries.py::burstiness): B = (σ−μ)/(σ+μ) over the
    gaps — −1 periodic, ≈0 Poisson, →1 bursty; the traffic-shape
    diagnostic behind rate-limit and capacity decisions. Gaps are
    wall-clock second-boundary counts (DST-proof on TIMESTAMP_NTZ — the
    freshness recipe); one per-user lag window + one moment
    aggregate."""
    return timeseries.burstiness(
        t(spark, sf_dir, "events"), "user_id", "ts", ("ts", "event_id")
    )


# ---------------------------------------------------------------------------
# per-source Gini of document lengths (stratum-inequality screen)
# ---------------------------------------------------------------------------


@query(
    "q_gini_sources",
    oracle="""
    WITH r AS (
      SELECT source, CAST(n_chars AS DOUBLE) AS x,
             CAST(row_number() OVER (PARTITION BY source
                                     ORDER BY n_chars, doc_id) AS DOUBLE) AS i
      FROM documents
    ),
    m AS (
      SELECT source, CAST(count(*) AS DOUBLE) AS n,
             SUM(x) AS sx, SUM(i * x) AS six
      FROM r GROUP BY source
    )
    SELECT source, CAST(n AS BIGINT) AS n_rows,
           ROUND((2 * six - (n + 1) * sx) / NULLIF(n * sx, 0), 6) + 0.0 AS gini
    FROM m
    """,
    tags=("corpus", "agg", "quality"),
)
def q_gini_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of document lengths within each source
    (operators/stats.py::gini_by_group) — the stratum-inequality screen
    that flags boilerplate-dominated or collapsed sources (a few huge
    docs carrying the stratum) before they skew a mixture. Sorted-rank
    identity, deterministic (value, id) tie-break; the rank window and
    both aggregates stay keyed on the source."""
    return stats.gini_by_group(
        t(spark, sf_dir, "documents"), "source", "n_chars", "doc_id"
    )
