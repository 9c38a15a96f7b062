"""Round-9 forty-seventh-wave queries: placement stability and
embedding-cloud drift.

Per-query rationale lives in each function docstring; registry/oracle
conventions in queries.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from weather_api_automate_etl_spark.queries import query, t


def _rdv_sql(n: int, key: str) -> str:
    """Rendezvous shard id in DuckDB: arg of the max md5 over shards."""
    structs = ", ".join(
        f"{{'h': md5('{s}:' || {key}), 's': {s}}}" for s in range(n)
    )
    return f"list_max([{structs}]).s"


_RESHARD_ORACLE = f"""
    WITH a AS (
      SELECT CAST(doc_id AS VARCHAR) AS k FROM documents
    ),
    s AS (
      SELECT {_rdv_sql(8, "k")} AS r1,
             {_rdv_sql(9, "k")} AS r2,
             CAST(CAST(concat('0x', substr(md5(k), 1, 8)) AS UBIGINT) % 8
                  AS INTEGER) AS m1,
             CAST(CAST(concat('0x', substr(md5(k), 1, 8)) AS UBIGINT) % 9
                  AS INTEGER) AS m2
      FROM a
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_keys,
           CAST(SUM(CASE WHEN r1 != r2 THEN 1 ELSE 0 END) AS BIGINT)
             AS rdv_moved,
           ROUND(SUM(CASE WHEN r1 != r2 THEN 1 ELSE 0 END)
                 / NULLIF(CAST(COUNT(*) AS DOUBLE), 0), 6)
             AS rdv_moved_frac,
           CAST(SUM(CASE WHEN m1 != m2 THEN 1 ELSE 0 END) AS BIGINT)
             AS mod_moved,
           ROUND(SUM(CASE WHEN m1 != m2 THEN 1 ELSE 0 END)
                 / NULLIF(CAST(COUNT(*) AS DOUBLE), 0), 6)
             AS mod_moved_frac
    FROM s
"""


@query(
    "q_reshard_stability",
    oracle=_RESHARD_ORACLE,
    tags=("sampling", "scale"),
)
def q_reshard_stability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resharding movement audit 8 → 9 shards (operators/sampling.py::
    reshard_stability): rendezvous hashing moves ≈ 1/9 of documents,
    mod-hash ≈ 8/9 — all four shard assignments are map-side md5
    expressions (zero shuffle), one single-row aggregate. The measured
    fractions are the evidence behind choosing HRW placement for any
    growable 100 TB shard map."""
    from weather_api_automate_etl_spark.operators import sampling

    return sampling.reshard_stability(
        t(spark, sf_dir, "documents"), "doc_id", 8, 9
    )


_DRIFT_ORACLE = """
    WITH x AS (
      SELECT CAST(vec_id % 2 AS INTEGER) AS cur, CAST(i AS INTEGER) AS dim,
             CAST(embedding[i + 1] AS DOUBLE) AS v
      FROM embeddings, UNNEST(range(0, len(embedding))) AS u(i)
    ),
    per AS (
      SELECT dim,
             CAST(COUNT(CASE WHEN cur = 0 THEN 1 END) AS BIGINT) AS n_ref,
             CAST(COUNT(CASE WHEN cur = 1 THEN 1 END) AS BIGINT) AS n_cur,
             AVG(CASE WHEN cur = 0 THEN v END) AS mr,
             AVG(CASE WHEN cur = 1 THEN v END) AS mc
      FROM x GROUP BY dim
    ),
    w AS (
      SELECT dim, n_ref, n_cur, mr, mc,
             SUM((mc - mr) * (mc - mr)) OVER () AS ss,
             SUM(mr * mc) OVER () AS dot,
             SUM(mr * mr) OVER () AS nr2,
             SUM(mc * mc) OVER () AS nc2
      FROM per
    )
    SELECT dim, n_ref, n_cur,
           ROUND(mr, 6) AS mean_ref,
           ROUND(mc, 6) AS mean_cur,
           ROUND(mc - mr, 6) AS delta,
           ROUND(sqrt(ss), 6) AS l2_shift,
           ROUND(dot / NULLIF(sqrt(nr2) * sqrt(nc2), 0), 6)
             AS cosine_means
    FROM w
"""


@query(
    "q_embedding_drift",
    oracle=_DRIFT_ORACLE,
    tags=("embeddings", "mlprep"),
)
def q_embedding_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cloud drift between the even- and odd-id cohorts
    (operators/embeddings.py::embedding_drift): one posexplode to
    (dim, cohort) grain — map-side partials collapse each partition to
    ≤ 2·64 rows before the single shuffle — then window summaries over
    the 64-row result: per-dim mean deltas, the L2 mean-shift norm,
    and the cosine between mean vectors."""
    from weather_api_automate_etl_spark.operators import embeddings

    emb = t(spark, sf_dir, "embeddings")
    return embeddings.embedding_drift(
        emb, "embedding", F.col("vec_id") % 2 == 1
    )
