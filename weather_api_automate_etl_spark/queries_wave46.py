"""Round-9 forty-sixth-wave query: LSH banding recall audit.

Per-query rationale lives in each function docstring; registry/oracle
conventions in queries.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from weather_api_automate_etl_spark.queries import query, t

_TOKENS_SQL = "regexp_split_to_array(lower(trim(text)), '\\s+')"

_RECALL_ORACLE = f"""
    WITH base AS (
      SELECT doc_id, lower(trim(text)) AS txt, {_TOKENS_SQL} AS tk
      FROM documents
    ),
    sh AS (
      SELECT doc_id,
             CASE WHEN len(tk) >= 3
                  THEN [array_to_string(tk[i:i+2], ' ')
                        FOR i IN range(1, len(tk) - 1)]
                  ELSE [txt] END AS shingles
      FROM base
    ),
    tr AS (
      SELECT doc_id, unnest(list_distinct(shingles)) AS s FROM sh
    ),
    sizes AS (SELECT doc_id, count(*) AS n FROM tr GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS i
      FROM tr a JOIN tr b ON a.s = b.s AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    ),
    truth AS (
      SELECT id_a, id_b FROM inter
      JOIN sizes na ON na.doc_id = id_a
      JOIN sizes nb ON nb.doc_id = id_b
      WHERE ROUND(i / (na.n + nb.n - i), 6) >= 0.5
    ),
    ex AS (SELECT doc_id, unnest(shingles) AS s FROM sh),
    mh AS (
      SELECT doc_id, j, min(md5(CAST(j AS VARCHAR) || ':' || s)) AS mh
      FROM ex CROSS JOIN (SELECT unnest(range(8)) AS j) js
      GROUP BY doc_id, j
    ),
    sig AS (
      SELECT doc_id, CAST(j // 2 AS INTEGER) AS band_id,
             md5(string_agg(mh, ',' ORDER BY j)) AS bucket
      FROM mh GROUP BY doc_id, j // 2
    ),
    cand AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      FROM sig a JOIN sig b
        ON a.band_id = b.band_id AND a.bucket = b.bucket
           AND a.doc_id < b.doc_id
    ),
    tagged AS (
      SELECT COALESCE(t.id_a, c.id_a) AS id_a,
             COALESCE(t.id_b, c.id_b) AS id_b,
             t.id_a IS NOT NULL AS is_true,
             c.id_a IS NOT NULL AS is_cand
      FROM truth t
      FULL OUTER JOIN cand c ON t.id_a = c.id_a AND t.id_b = c.id_b
    )
    SELECT CAST(0.5 AS DOUBLE) AS threshold,
           CAST(SUM(CASE WHEN is_true THEN 1 ELSE 0 END) AS BIGINT)
             AS n_true,
           CAST(SUM(CASE WHEN is_cand THEN 1 ELSE 0 END) AS BIGINT)
             AS n_candidates,
           CAST(SUM(CASE WHEN is_true AND is_cand THEN 1 ELSE 0 END)
                AS BIGINT) AS n_hit,
           ROUND(SUM(CASE WHEN is_true AND is_cand THEN 1 ELSE 0 END)
                 / NULLIF(CAST(SUM(CASE WHEN is_true THEN 1 ELSE 0 END)
                               AS DOUBLE), 0), 6) AS recall,
           ROUND(SUM(CASE WHEN is_true AND is_cand THEN 1 ELSE 0 END)
                 / NULLIF(CAST(SUM(CASE WHEN is_cand THEN 1 ELSE 0 END)
                               AS DOUBLE), 0), 6) AS precision
    FROM tagged
"""


@query("q_lsh_recall", oracle=_RECALL_ORACLE, tags=("dedup",))
def q_lsh_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH banding recall audit (operators/dedup.py::lsh_recall_audit,
    8 hashes × 4 bands vs exact trigram Jaccard ≥ 0.5): the truth side
    is an inverted-index join on the shingle (never all-pairs), the
    candidate side is the production banded bucket join, and one
    full-outer join on the pair key classifies hits, misses, and
    false candidates with exact counts."""
    from weather_api_automate_etl_spark.operators import dedup

    return dedup.lsh_recall_audit(
        t(spark, sf_dir, "documents"),
        "doc_id",
        "text",
        num_hashes=8,
        band_size=2,
        shingle_k=3,
        threshold=0.5,
    )
