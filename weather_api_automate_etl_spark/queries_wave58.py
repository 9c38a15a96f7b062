"""Round-9 fifty-eighth-wave queries: corpus-health diagnostics.

Per-query rationale lives in each function docstring; registry/oracle
conventions in queries.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from weather_api_automate_etl_spark.queries import query, t

_DUP_ORACLE = """
    WITH base AS (
      SELECT doc_id, source, md5(text) AS h FROM documents
    ),
    g AS (
      SELECT h, COUNT(*) AS n, MIN(doc_id) AS keep
      FROM base GROUP BY h
    ),
    tagged AS (
      SELECT source,
             CASE WHEN n > 1 THEN 1 ELSE 0 END AS dup,
             CASE WHEN n > 1 AND doc_id != keep THEN 1 ELSE 0 END AS drp
      FROM base JOIN g USING (h)
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(dup) AS BIGINT) AS n_in_dup_groups,
           CAST(SUM(drp) AS BIGINT) AS n_would_drop,
           ROUND(SUM(dup) / CAST(COUNT(*) AS DOUBLE), 6) AS dup_rate,
           ROUND(SUM(drp) / CAST(COUNT(*) AS DOUBLE), 6) AS drop_rate
    FROM tagged GROUP BY source
"""


@query("q_dup_rate_by_source", oracle=_DUP_ORACLE, tags=("dedup", "corpus"))
def q_dup_rate_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source exact-dup rates (operators/corpus.py::
    dup_rate_by_source): one md5-keyed group aggregate, one
    co-partitioned join-back, one source rollup — same shuffle class
    as dedup_exact; cross-source copies count against every holder."""
    from weather_api_automate_etl_spark.operators import corpus

    return corpus.dup_rate_by_source(
        t(spark, sf_dir, "documents"), "doc_id", "text", "source"
    )


_HEAPS_ORACLE = """
    WITH bounds AS (
      SELECT MIN(doc_id) AS lo, MAX(doc_id) AS hi FROM documents
    ),
    docs AS (
      SELECT doc_id,
             CAST(LEAST((doc_id - lo) * 10 // (hi - lo + 1), 9)
                  AS INTEGER) + 1 AS b,
             regexp_split_to_array(lower(trim(text)), '\\s+') AS tk
      FROM documents, bounds
    ),
    toks AS (
      SELECT b, t FROM docs, UNNEST(tk) AS u(t) WHERE t != ''
    ),
    per_bucket AS (SELECT b, COUNT(*) AS ntok FROM toks GROUP BY b),
    fs AS (SELECT t, MIN(b) AS fb FROM toks GROUP BY t),
    nn AS (SELECT fb AS b, COUNT(*) AS nnew FROM fs GROUP BY fb),
    curve AS (
      SELECT p.b AS b,
             SUM(p.ntok) OVER (ORDER BY p.b
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS cum_tokens,
             SUM(COALESCE(nn.nnew, 0)) OVER (ORDER BY p.b
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS vocab
      FROM per_bucket p LEFT JOIN nn ON nn.b = p.b
    ),
    m AS (
      SELECT b, cum_tokens, vocab,
             ln(CAST(cum_tokens AS DOUBLE)) AS lx,
             ln(CAST(vocab AS DOUBLE)) AS ly
      FROM curve
      WHERE cum_tokens > 0 AND vocab > 0
    ),
    f AS (
      SELECT b, cum_tokens, vocab,
             COUNT(*) OVER () AS n,
             SUM(lx) OVER () AS sx, SUM(ly) OVER () AS sy,
             SUM(lx * ly) OVER () AS sxy, SUM(lx * lx) OVER () AS sxx
      FROM m
    )
    SELECT CAST(b AS INTEGER) AS bucket,
           CAST(cum_tokens AS BIGINT) AS cum_tokens,
           CAST(vocab AS BIGINT) AS vocab,
           -- the shared guarded-OLS discipline (stats.ols_from_moments):
           -- variance floor is RELATIVE (1e-14 * n * sxx), and + 0.0
           -- normalizes an aggregated -0.0 (round0)
           ROUND((n * sxy - sx * sy)
                 / (CASE WHEN n * sxx - sx * sx > 1e-14 * n * sxx
                         THEN n * sxx - sx * sx END), 6) + 0.0
             AS beta,
           ROUND(exp((sy - (n * sxy - sx * sy)
                      / (CASE WHEN n * sxx - sx * sx > 1e-14 * n * sxx
                              THEN n * sxx - sx * sx END) * sx) / n), 6)
             + 0.0 AS k_factor
    FROM f
"""


@query("q_heaps_law", oracle=_HEAPS_ORACLE, tags=("text", "corpus"))
def q_heaps_law(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heaps'-law vocabulary growth (operators/textops.py::heaps_law,
    10 ordered prefixes): per-token first-bucket min aggregate →
    10-row cumulative curve → moment-OLS β/K fit riding every row.
    Prefix buckets come from exact BIGINT range arithmetic over the
    broadcast (min, max) id span — no ntile / global sort over the doc
    relation (round-9 verdict item 3)."""
    from weather_api_automate_etl_spark.operators import textops

    return textops.heaps_law(
        t(spark, sf_dir, "documents"), "doc_id", "text", n_buckets=10
    )
