"""Round-6 ninth-wave queries: table profiling, Z-order layout keys, BPE
tokenizer-training statistics, hard-negative mining, and the full
k-means-codebook ANN recall loop — the data-engineering and
training-data surfaces a 100 TB pipeline reaches for next.

Per-query rationale lives in each function docstring; registry/oracle
conventions in queries.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from weather_api_automate_etl_spark.queries import query, t
from weather_api_automate_etl_spark.queries_ext import (
    _TOKENS_SQL,
    _kmf_assign,
    _kmf_update,
    _lsh_oracle,
)
from weather_api_automate_etl_spark.queries_wave8 import _cos_sql

# ---------------------------------------------------------------------------
# one-pass table profiling
# ---------------------------------------------------------------------------

_PROFILE_COLS = (
    ("o_orderkey", False),
    ("o_custkey", False),
    ("o_totalprice", True),
    ("o_orderdate", False),
    ("o_orderstatus", False),
)


def _profile_oracle() -> str:
    parts = []
    for c, is_double in _PROFILE_COLS:
        mn = f"ROUND(MIN({c}), 6)" if is_double else f"MIN({c})"
        mx = f"ROUND(MAX({c}), 6)" if is_double else f"MAX({c})"
        parts.append(f"""
      SELECT '{c}' AS column_name,
             CAST(COUNT(*) AS BIGINT) AS n_rows,
             CAST(COUNT(CASE WHEN {c} IS NULL THEN 1 END) AS BIGINT) AS n_nulls,
             CAST(COUNT(DISTINCT {c}) AS BIGINT) AS n_distinct,
             CAST({mn} AS VARCHAR) AS min_value,
             CAST({mx} AS VARCHAR) AS max_value
      FROM orders""")
    return " UNION ALL ".join(parts)


@query("q_profile_table", oracle=_profile_oracle(), tags=("quality", "agg"))
def q_profile_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-pass table profile (operators/quality.py::profile_table): per
    column — rows, nulls, exact distincts, native-typed min/max
    (stringified after aggregation, doubles rounded to 6) — the first
    query anyone runs against an unfamiliar table, and the machine-readable
    input to schema drift detection. ONE aggregate for all columns (N
    columns never means N scans); the oracle recomputes each column's
    stats independently."""
    from weather_api_automate_etl_spark.operators import quality

    return quality.profile_table(
        t(spark, sf_dir, "orders"), [c for c, _ in _PROFILE_COLS]
    )


# ---------------------------------------------------------------------------
# Z-order (Morton) clustering key
# ---------------------------------------------------------------------------


def _zkey_sql(x: str, y: str, bits: int = 8) -> str:
    terms = [
        f"((({x} >> {i}) & 1) << {2 * i}) + ((({y} >> {i}) & 1) << {2 * i + 1})"
        for i in range(bits)
    ]
    return "CAST(" + " + ".join(terms) + " AS BIGINT)"


@query(
    "q_zorder_layout",
    oracle=f"""
    WITH q AS (
      SELECT CAST(floor((value + 50) * 255.0 / 110.0) AS BIGINT) AS x,
             CAST(user_id % 256 AS BIGINT) AS y
      FROM events
      WHERE value IS NOT NULL AND value BETWEEN -50 AND 60
    ),
    keyed AS (SELECT {_zkey_sql("x", "y")} AS zkey, x, y FROM q)
    SELECT CAST(zkey >> 10 AS BIGINT) AS z_bucket,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           MIN(x) AS min_x, MAX(x) AS max_x,
           MIN(y) AS min_y, MAX(y) AS max_y
    FROM keyed GROUP BY 1
    """,
    tags=("layout", "agg"),
)
def q_zorder_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order/Morton clustering key (functions/core.py::zorder_key — the
    layout primitive behind Delta/Iceberg OPTIMIZE ZORDER): events
    quantized to an 8-bit (value, user) grid, bits interleaved into a
    64-level bucket key, then per-bucket min/max of BOTH dimensions. Files
    written in z_bucket ranges carry tight min/max statistics on x AND y
    simultaneously — the two-dimensional pruning a single-column sort
    cannot give — and the per-bucket ranges this query emits are exactly
    those file statistics. Pure shift/mask arithmetic, identical in any
    engine; tests/test_wave9.py pins the locality guarantee: 1024
    consecutive z-keys form an aligned 32×32 tile, so every bucket spans
    ≤ 32 of each dimension's 256-level range."""
    from weather_api_automate_etl_spark.functions.core import zorder_key

    v = F.col("value")
    q = (
        t(spark, sf_dir, "events")
        .filter(v.isNotNull() & v.between(-50, 60))
        .select(
            F.floor((v + 50) * 255.0 / 110.0).cast("long").alias("x"),
            (F.col("user_id") % 256).cast("long").alias("y"),
        )
    )
    return (
        q.select(zorder_key("x", "y", bits=8).alias("zkey"), "x", "y")
        .groupBy(F.shiftright(F.col("zkey"), 10).cast("long").alias("z_bucket"))
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min("x").alias("min_x"),
            F.max("x").alias("max_x"),
            F.min("y").alias("min_y"),
            F.max("y").alias("max_y"),
        )
    )


# ---------------------------------------------------------------------------
# BPE tokenizer-training statistics
# ---------------------------------------------------------------------------

_BPE_PAIRS_SQL = f"""
    WITH tok AS (SELECT unnest({_TOKENS_SQL}) AS tok FROM documents),
    pairs AS (
      SELECT unnest([substr(tok, i, 2) FOR i IN range(1, len(tok))]) AS pair
      FROM tok WHERE len(tok) >= 2
    )
"""


@query(
    "q_bpe_pair_counts",
    oracle=_BPE_PAIRS_SQL
    + """
    SELECT pair, CAST(COUNT(*) AS BIGINT) AS n FROM pairs GROUP BY pair
    """,
    tags=("text",),
)
def q_bpe_pair_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adjacent-character pair frequencies (operators/textops.py::
    bpe_pair_counts) — the statistic every BPE tokenizer-training round
    maximizes over. Token split + per-token substring windows + one
    explode + one count aggregate: corpus-linear, join-free."""
    from weather_api_automate_etl_spark.operators import textops

    return textops.bpe_pair_counts(t(spark, sf_dir, "documents"))


#: fresh merge symbol: a private-use codepoint no fixture text contains
#: (tests assert this); chr()/ord() bind the Spark and DuckDB sides to the
#: same literal
_BPE_PLACEHOLDER = "\ue801"


@query(
    "q_bpe_merge",
    oracle=_BPE_PAIRS_SQL
    + f"""
    , pc AS (SELECT pair, COUNT(*) AS n FROM pairs GROUP BY pair),
    win AS (SELECT pair FROM pc ORDER BY n DESC, pair LIMIT 1),
    merged AS (
      SELECT replace(tok, (SELECT pair FROM win), chr({ord(_BPE_PLACEHOLDER)}))
               AS tok,
             (SELECT pair FROM win) AS merge_pair
      FROM tok
    ),
    pairs2 AS (
      SELECT unnest([substr(tok, i, 2) FOR i IN range(1, len(tok))]) AS pair,
             merge_pair
      FROM merged WHERE len(tok) >= 2
    ),
    counted AS (
      SELECT merge_pair, pair, CAST(COUNT(*) AS BIGINT) AS n
      FROM pairs2 GROUP BY merge_pair, pair
    )
    SELECT merge_pair, pair, n,
           CAST(row_number() OVER (ORDER BY n DESC, pair) AS INTEGER) AS rk
    FROM counted QUALIFY rk <= 10
    """,
    tags=("text",),
)
def q_bpe_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ONE BPE training round end to end (operators/textops.py::
    bpe_merge_once): count pairs, pick the most frequent (ties to the
    lexicographically smallest), substitute a fresh symbol corpus-wide,
    re-count — emitting the merged corpus's top-10 pairs with the round-1
    winner attached. The winner rides a 1-row broadcast (never a driver
    constant baked into the plan), so unrolling more rounds stays fully
    declarative. The final top-10 window runs over the vocabulary-scale
    aggregate (the documented metadata-scale WindowExec invariant)."""
    from weather_api_automate_etl_spark.operators import textops

    return textops.bpe_merge_once(
        t(spark, sf_dir, "documents"), placeholder=_BPE_PLACEHOLDER, top_n=10
    )


# ---------------------------------------------------------------------------
# hard-negative mining
# ---------------------------------------------------------------------------


@query(
    "q_hard_negatives",
    oracle=f"""
    WITH b AS ({_lsh_oracle(n_planes=6)}),
    v AS (
      SELECT e.vec_id, e.label, e.embedding, b.bucket
      FROM embeddings e JOIN b USING (vec_id)
    ),
    scored AS (
      SELECT a.vec_id AS anchor_id, c.vec_id AS negative_id,
             ROUND({_cos_sql("a.embedding", "c.embedding")}, 6) AS score
      FROM v a JOIN v c ON a.bucket = c.bucket AND a.label <> c.label
    )
    SELECT anchor_id, negative_id, score,
           CAST(row_number() OVER (
             PARTITION BY anchor_id ORDER BY score DESC, negative_id
           ) AS INTEGER) AS rk
    FROM scored QUALIFY rk <= 5
    """,
    tags=("similarity",),
)
def q_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hard-negative mining (operators/similarity.py::hard_negative_pairs):
    per anchor, the 5 most cosine-similar vectors with a DIFFERENT label —
    the near-miss pairs a contrastive trainer needs. LSH buckets block the
    candidate space (never all-pairs), the label-inequality filter rides
    the join condition, exact cosine + per-anchor window top-k finish."""
    from weather_api_automate_etl_spark.operators import similarity

    return similarity.hard_negative_pairs(
        t(spark, sf_dir, "embeddings"), "embedding", "label", dim=64, k=5, n_planes=6
    )


# ---------------------------------------------------------------------------
# the FULL ANN quality loop: k-means codebook → bucketed lists → recall
# ---------------------------------------------------------------------------


def _ann_recall_kmeans_oracle() -> str:
    return f"""
    WITH q AS (
      SELECT vec_id AS qid, embedding AS qe FROM embeddings WHERE vec_id < 10
    ),
    corp AS (
      SELECT vec_id, label, embedding FROM embeddings WHERE vec_id >= 10
    ),
    c0 AS (
      SELECT CAST(row_number() OVER (ORDER BY __id) - 1 AS INTEGER) AS list_id,
             list_transform(centroid, x -> ROUND(x, 6)) AS centroid
      FROM (
        SELECT CAST(embedding AS DOUBLE[]) AS centroid, MIN(vec_id) AS __id
        FROM corp GROUP BY 1 ORDER BY __id LIMIT 8
      )
    ),
    a1 AS ({_kmf_assign("c0", src="corp")}),
    c1 AS ({_kmf_update("a1", "c0", src="corp")}),
    a2 AS ({_kmf_assign("c1", src="corp")}),
    c2 AS ({_kmf_update("a2", "c1", src="corp")}),
    a3 AS ({_kmf_assign("c2", src="corp")}),
    pos AS (
      SELECT a.list_id, i, AVG(CAST(e.embedding[i] AS DOUBLE)) AS m
      FROM corp e JOIN a3 a USING (vec_id),
           UNNEST(range(1, len(e.embedding) + 1)) AS t(i)
      GROUP BY a.list_id, i
    ),
    cents AS (SELECT list_id, list(m ORDER BY i) AS cen FROM pos GROUP BY list_id),
    probed AS (
      SELECT q.qid, c.list_id, q.qe
      FROM cents c CROSS JOIN q
      QUALIFY row_number() OVER (
        PARTITION BY q.qid
        ORDER BY ROUND({_cos_sql("c.cen", "q.qe")}, 6) DESC, c.list_id
      ) <= 1
    ),
    approx AS (
      SELECT p.qid, s.vec_id
      FROM corp s JOIN a3 a USING (vec_id) JOIN probed p ON a.list_id = p.list_id
      QUALIFY row_number() OVER (
        PARTITION BY p.qid
        ORDER BY ROUND({_cos_sql("s.embedding", "p.qe")}, 6) DESC, s.vec_id
      ) <= 10
    ),
    exact AS (
      SELECT q.qid, c.vec_id
      FROM corp c CROSS JOIN q
      QUALIFY row_number() OVER (
        PARTITION BY q.qid
        ORDER BY ROUND({_cos_sql("c.embedding", "q.qe")}, 6) DESC, c.vec_id
      ) <= 10
    ),
    hits AS (
      SELECT e.qid, CAST(COUNT(*) AS BIGINT) AS n_hits
      FROM exact e JOIN approx a ON a.qid = e.qid AND a.vec_id = e.vec_id
      GROUP BY e.qid
    )
    SELECT q.qid AS query_id,
           COALESCE(h.n_hits, 0) AS n_hits,
           ROUND(COALESCE(h.n_hits, 0) / 10.0, 6) AS recall_at_k
    FROM q LEFT JOIN hits h ON h.qid = q.qid
    """


@query(
    "q_ann_recall_kmeans",
    oracle=_ann_recall_kmeans_oracle(),
    tags=("similarity",),
)
def q_ann_recall_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The FULL ANN quality loop with the engine's OWN codebook: 2 Lloyd
    rounds build 8 inverted lists over the corpus (kmeans_fixed_rounds,
    round-6-clamped — the hash-proven deterministic twin), every corpus
    vector is assigned (nearest_centroid), and recall@10 at nprobe=1 is
    measured against the exact baseline (ann_recall). SCALING.md's
    measured curve shows this configuration reaching ~0.94 recall at
    one-tenth the probe IO of label-blocking — this query pins that
    pipeline end-to-end with a DuckDB twin that re-derives codebook,
    assignment, probe, and recall declaratively."""
    from weather_api_automate_etl_spark.operators import similarity

    emb = t(spark, sf_dir, "embeddings")
    queries_df = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    corpus = emb.filter(F.col("vec_id") >= 10)
    cents = similarity.kmeans_fixed_rounds(corpus, k=8, rounds=2)
    km = similarity.nearest_centroid(corpus, cents).select(
        "vec_id", F.col("list_id").alias("km_list")
    )
    corpus_km = corpus.join(km, "vec_id")
    return similarity.ann_recall(
        corpus_km, queries_df, "embedding", "km_list", k=10, nprobe=1
    )
