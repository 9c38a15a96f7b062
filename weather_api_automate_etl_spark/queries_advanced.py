"""Round-5 second-wave queries: time-series smoothing & anomaly
detection, equi-depth binning, grouped OLS regression, triangle counting
over the near-dup pair graph, and materialized training-sequence packing.

Per-query rationale lives in each function docstring; registry/oracle
conventions in queries.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from weather_api_automate_etl_spark.operators import corpus, dedup, graph
from weather_api_automate_etl_spark.queries import query, t
from weather_api_automate_etl_spark.queries_ext import _MINHASH_SIG_SQL

# ---------------------------------------------------------------------------
# trailing EWMA (exponential smoothing — the time-series twin of q_moving_avg)
# ---------------------------------------------------------------------------

_EWMA_ALPHA = 0.3
_EWMA_W = 8  # trailing frame length (rows)


@query(
    "q_ewma",
    oracle=f"""
    WITH e AS (
      SELECT event_id, user_id, value,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY CAST(ts AS TIMESTAMP), event_id) AS rn
      FROM events
    )
    SELECT a.event_id, a.user_id, a.value,
           ROUND(SUM(b.value * POWER({1 - _EWMA_ALPHA}, a.rn - b.rn))
                 / SUM(POWER({1 - _EWMA_ALPHA}, a.rn - b.rn)), 6) AS ewma
    FROM e a JOIN e b
      ON a.user_id = b.user_id AND b.rn BETWEEN a.rn - {_EWMA_W - 1} AND a.rn
    GROUP BY a.event_id, a.user_id, a.value
    """,
    tags=("timeseries", "windows"),
)
def q_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing exponentially-weighted moving average per user (α=0.3 over
    the last 8 observations) — the smoothing signal dashboards and anomaly
    baselines run on. Spark computes it join-free: collect the ordered
    trailing frame per row (one window shuffle on user_id) and fold it
    with a higher-order ``aggregate`` — weights are accumulated by
    repeated multiply inside the fold, so the whole expression stays in
    codegen with no second pass over events. The oracle states the same
    weighted mean relationally (bounded self-join on row-number offsets);
    HOF-fold vs join equivalence is the point of the pairing. Per-user
    frames keep the window partitioned — never a global sort.
    """
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts"), F.col("event_id"))
        .rowsBetween(-( _EWMA_W - 1), 0)
    )
    frame = F.reverse(F.collect_list("value").over(w))  # newest first
    folded = F.aggregate(
        frame,
        F.struct(F.lit(0.0).alias("s"), F.lit(1.0).alias("w")),
        lambda acc, x: F.struct(
            (acc["s"] + x * acc["w"]).alias("s"),
            (acc["w"] * F.lit(1 - _EWMA_ALPHA)).alias("w"),
        ),
        lambda acc: acc["s"],
    )
    norm = (
        F.lit(1.0) - F.pow(F.lit(1 - _EWMA_ALPHA), F.size(frame))
    ) / F.lit(_EWMA_ALPHA)
    return t(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        "value",
        F.round(folded / norm, 6).alias("ewma"),
    )


# ---------------------------------------------------------------------------
# IQR fence anomaly flags (robust outlier detection, the winsorize sibling)
# ---------------------------------------------------------------------------


@query(
    "q_anomaly_iqr",
    oracle="""
    WITH s AS (
      SELECT event_type,
             ROUND(quantile_cont(value, 0.25)
                   - 1.5 * (quantile_cont(value, 0.75)
                            - quantile_cont(value, 0.25)), 6) AS lo,
             ROUND(quantile_cont(value, 0.75)
                   + 1.5 * (quantile_cont(value, 0.75)
                            - quantile_cont(value, 0.25)), 6) AS hi
      FROM events GROUP BY event_type
    )
    SELECT e.event_id, e.event_type, e.value, s.lo, s.hi,
           (e.value < s.lo OR e.value > s.hi) AS is_outlier
    FROM events e JOIN s USING (event_type)
    """,
    tags=("agg", "quality"),
)
def q_anomaly_iqr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tukey-fence outlier flags per event_type: values outside
    [Q1 − 1.5·IQR, Q3 + 1.5·IQR] — the robust anomaly gate (winsorize's
    flag-don't-clamp sibling). Quartiles are EXACT interpolated
    percentiles (one group aggregate, group-cardinality output) broadcast
    back onto the stream — a map-side join, no second shuffle of the fact
    table. Fences are rounded BEFORE the comparison on both engines so
    the boolean can't flip on a last-ulp quantile difference.
    """
    ev = t(spark, sf_dir, "events")
    q1 = F.expr("percentile(value, 0.25)")
    q3 = F.expr("percentile(value, 0.75)")
    stats = ev.groupBy("event_type").agg(
        F.round(q1 - 1.5 * (q3 - q1), 6).alias("lo"),
        F.round(q3 + 1.5 * (q3 - q1), 6).alias("hi"),
    )
    return ev.join(F.broadcast(stats), "event_type").select(
        "event_id",
        "event_type",
        "value",
        "lo",
        "hi",
        ((F.col("value") < F.col("lo")) | (F.col("value") > F.col("hi"))).alias(
            "is_outlier"
        ),
    )


# ---------------------------------------------------------------------------
# equi-depth binning (ntile deciles — the quantile sibling of q_histogram)
# ---------------------------------------------------------------------------


@query(
    "q_ntile_bucket",
    oracle="""
    WITH b AS (
      SELECT o_orderpriority, o_totalprice,
             CAST(ntile(10) OVER (PARTITION BY o_orderpriority
                                  ORDER BY o_totalprice, o_orderkey)
                  AS INTEGER) AS bucket
      FROM orders
    )
    SELECT o_orderpriority, bucket, CAST(count(*) AS BIGINT) AS n,
           ROUND(min(o_totalprice), 2) AS lo, ROUND(max(o_totalprice), 2) AS hi
    FROM b GROUP BY o_orderpriority, bucket
    """,
    tags=("windows", "agg"),
)
def q_ntile_bucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-DEPTH decile binning per order priority (q_histogram is the
    equi-WIDTH sibling): ntile(10) over a deterministic (price, key)
    order, then per-bucket count and price range — the bucket-boundary
    table quantile-based stratification samples against. One window
    shuffle on the partition key (per-priority sorts run independently)
    folded into the same-keyed aggregate. ntile's remainder rule
    (first ``n % 10`` buckets take the extra row) is identical on both
    engines.
    """
    w = Window.partitionBy("o_orderpriority").orderBy(
        "o_totalprice", "o_orderkey"
    )
    return (
        t(spark, sf_dir, "orders")
        .select(
            "o_orderpriority",
            "o_totalprice",
            F.ntile(10).over(w).cast("int").alias("bucket"),
        )
        .groupBy("o_orderpriority", "bucket")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.min("o_totalprice"), 2).alias("lo"),
            F.round(F.max("o_totalprice"), 2).alias("hi"),
        )
    )


# ---------------------------------------------------------------------------
# grouped OLS regression from moment sums (closed-form, single aggregate)
# ---------------------------------------------------------------------------


@query(
    "q_linreg_by_group",
    oracle="""
    WITH m AS (
      SELECT l_returnflag, CAST(count(*) AS DOUBLE) AS n,
             SUM(l_quantity) AS sx, SUM(l_extendedprice) AS sy,
             SUM(l_quantity * l_extendedprice) AS sxy,
             SUM(l_quantity * l_quantity) AS sxx,
             SUM(l_extendedprice * l_extendedprice) AS syy
      FROM lineitem GROUP BY l_returnflag
    )
    SELECT l_returnflag, CAST(n AS BIGINT) AS n_rows,
           ROUND((n * sxy - sx * sy) / vx, 6) + 0.0 AS slope,
           ROUND((sy - (n * sxy - sx * sy) / vx * sx) / n, 6) + 0.0
             AS intercept,
           ROUND((n * sxy - sx * sy) / SQRT(vx * vy), 6) + 0.0 AS corr_xy,
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
    tags=("agg", "mlprep"),
)
def q_linreg_by_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group closed-form OLS (extendedprice ~ quantity by returnflag):
    slope, intercept, Pearson r, R² — the drift/trend fit feature
    pipelines compute per segment. Everything derives from FIVE moment
    sums in ONE map-side-combined aggregate (the mergeable-statistics
    pattern: partial moments combine associatively, so this is the same
    shape at 100 TB), with the closed forms spelled identically on both
    engines rather than leaning on regr_* built-ins whose internal
    formulations (single- vs two-pass centering) differ across engines.
    """
    x, y = F.col("l_quantity"), F.col("l_extendedprice")
    m = (
        t(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).cast("double").alias("n"),
            F.sum(x).alias("sx"),
            F.sum(y).alias("sy"),
            F.sum(x * y).alias("sxy"),
            F.sum(x * x).alias("sxx"),
            F.sum(y * y).alias("syy"),
        )
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxy, sxx, syy = F.col("sxy"), F.col("sxx"), F.col("syy")
    from weather_api_automate_etl_spark.operators.stats import (
        ols_from_moments,
        round0,
    )

    # stats.ols_from_moments: relative-floor variance guards (degenerate
    # groups NULL on both engines, never NaN/garbage ±1) — and round0 on
    # the aggregated near-zero-able outputs (−0.0 hash hazard)
    slope, intercept, corr, r2 = ols_from_moments(n, sx, sy, sxy, sxx, syy)
    return m.select(
        "l_returnflag",
        n.cast("long").alias("n_rows"),
        round0(slope, 6).alias("slope"),
        round0(intercept, 6).alias("intercept"),
        round0(corr, 6).alias("corr_xy"),
        F.round(r2, 6).alias("r2"),
    )


# ---------------------------------------------------------------------------
# triangle counting over the near-dup pair graph (clique-density signal)
# ---------------------------------------------------------------------------


@query(
    "q_triangle_count",
    oracle=_MINHASH_SIG_SQL
    + """
    , pairs AS (
      SELECT DISTINCT a.doc_id AS u, b.doc_id AS v
      FROM sig a JOIN sig b
        ON a.band_id = b.band_id AND a.bucket = b.bucket AND a.doc_id < b.doc_id
    ),
    sym AS (SELECT u, v FROM pairs UNION ALL SELECT v AS u, u AS v FROM pairs),
    deg AS (SELECT u, count(*) AS d FROM sym GROUP BY u),
    o AS (
      SELECT s.u, s.v, dv.d AS dv
      FROM sym s JOIN deg du ON du.u = s.u JOIN deg dv ON dv.u = s.v
      WHERE (du.d < dv.d) OR (du.d = dv.d AND s.u < s.v)
    ),
    w AS (
      SELECT a.u, a.v AS x, b.v AS y
      FROM o a JOIN o b ON a.u = b.u
      WHERE (a.dv < b.dv) OR (a.dv = b.dv AND a.v < b.v)
    ),
    tri AS (
      SELECT w.u, w.x, w.y FROM w
      WHERE EXISTS (SELECT 1 FROM o WHERE o.u = w.x AND o.v = w.y)
    ),
    mem AS (
      SELECT u AS node FROM tri
      UNION ALL SELECT x FROM tri
      UNION ALL SELECT y FROM tri
    )
    SELECT node AS doc_id, CAST(count(*) AS BIGINT) AS n_triangles
    FROM mem GROUP BY node
    """,
    tags=("dedup", "graph"),
)
def q_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-node triangle counts on the MinHash+LSH near-dup pair graph
    (operators/graph.py::triangle_counts) — the local-clustering signal
    that separates tight template/boilerplate cliques (every pair
    matches every pair) from fragile chains of borderline matches before
    a dedup pass deletes a whole connected component. Degree-ordered
    edge orientation (Suri-Vassilvitskii) bounds the wedge join's
    per-apex fan-out at O(√m) — the formulation that survives power-law
    degree distributions at corpus scale. The oracle replays the exact
    orientation and wedge-closure relationally.
    """
    docs = t(spark, sf_dir, "documents")
    sig = dedup.minhash_signatures(
        docs, "doc_id", "text", num_hashes=8, band_size=2
    )
    pairs = dedup.minhash_candidate_pairs(sig, "doc_id")
    return graph.triangle_counts(pairs, node_id="doc_id")


# ---------------------------------------------------------------------------
# materialized training sequences (pack_assign's emit step)
# ---------------------------------------------------------------------------

_PACK_CTX = 32
_PACK_VOCAB = 32768


@query(
    "q_pack_sequences",
    oracle=rf"""
    WITH d AS (
      SELECT doc_id, source,
             list_filter(regexp_split_to_array(lower(trim(text)), '\s+'),
                         x -> x != '') AS tk
      FROM documents
    ),
    c AS (
      SELECT doc_id, source, tk, len(tk) AS n,
             SUM(len(tk)) OVER (PARTITION BY source ORDER BY doc_id
                                ROWS UNBOUNDED PRECEDING) - len(tk) AS st
      FROM d
    ),
    tokrows AS (
      SELECT doc_id, source, st + g.i - 1 AS gpos,
             CAST(CAST(concat('0x', substr(md5(tk[g.i]), 1, 8)) AS UBIGINT)
                  % {_PACK_VOCAB} AS INTEGER) AS tid
      FROM c, UNNEST(range(1, n + 1)) AS g(i)
    ),
    placed AS (
      SELECT doc_id, source, CAST(gpos // {_PACK_CTX} AS BIGINT) AS seq_id,
             CAST(gpos % {_PACK_CTX} AS INTEGER) AS pos, tid
      FROM tokrows
    )
    SELECT source, seq_id,
           array_to_string(array_agg(tid ORDER BY pos), ' ') AS input_ids,
           CAST(count(*) AS INTEGER) AS n_tokens,
           CAST(count(DISTINCT doc_id) AS INTEGER) AS n_docs
    FROM placed GROUP BY source, seq_id
    """,
    tags=("text", "mlprep"),
)
def q_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Materialized concat-and-chunk packing at ctx=32
    (operators/corpus.py::pack_sequences): the actual fixed-length
    ``input_ids`` arrays a training loader reads, not just the
    (seq_id, offset) assignment q_pack_assign plans. Token ids come from
    the vocabulary-free md5 hash (hashing-vectorizer discipline, 32k
    buckets); long documents straddle many sequences, so the final
    groupBy's groups are ctx-bounded — no skew from document length.
    The id array is space-joined to a string for the driver's scalar
    canonicalizer (q_array_agg discipline); the operator itself returns
    the real ``array<int>``.
    """
    seqs = corpus.pack_sequences(
        t(spark, sf_dir, "documents"),
        strata=("source",),
        ctx_len=_PACK_CTX,
        vocab_size=_PACK_VOCAB,
    )
    return seqs.select(
        "source",
        "seq_id",
        F.array_join(
            F.transform(F.col("input_ids"), lambda x: x.cast("string")), " "
        ).alias("input_ids"),
        "n_tokens",
        "n_docs",
    )
