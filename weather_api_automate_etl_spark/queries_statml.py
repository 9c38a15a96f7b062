"""Round-5 third-wave queries: sketch-probed frequency estimation,
bigram language-model scoring, robust (MAD) outlier flags, lag-1
autocorrelation, binned quantile normalization, blocklist screening,
market-basket pair lift, RFM segmentation, and the embedding covariance /
PCA pair.

Per-query rationale lives in each function docstring; registry/oracle
conventions in queries.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from weather_api_automate_etl_spark.operators import (
    corpus,
    embeddings as emb_ops,
    stats,
    textops,
)
from weather_api_automate_etl_spark.queries import query, t
from weather_api_automate_etl_spark.queries_ext import _TOKENS_SQL

# ---------------------------------------------------------------------------
# count-min sketch frequency estimation (the mergeable-sketch family)
# ---------------------------------------------------------------------------

_CMS_DEPTH = 4
_CMS_WIDTH = 256
_CMS_MIN_COUNT = 50


@query(
    "q_cms_frequency",
    oracle=f"""
    WITH tok AS (
      SELECT unnest(list_filter({_TOKENS_SQL}, t -> t != '')) AS term
      FROM documents
    ),
    hb AS (
      SELECT term, CAST(i AS INTEGER) AS h,
             CAST(CAST(concat('0x', substr(md5(concat(CAST(i AS VARCHAR),
                                                      ':', term)), 1, 8))
                       AS UBIGINT) % {_CMS_WIDTH} AS INTEGER) AS b
      FROM tok, UNNEST(range(0, {_CMS_DEPTH})) AS u(i)
    ),
    cms AS (SELECT h, b, count(*) AS c FROM hb GROUP BY h, b),
    probes AS (
      SELECT term, count(*) AS cnt FROM tok
      GROUP BY term HAVING count(*) >= {_CMS_MIN_COUNT}
    ),
    pb AS (
      SELECT p.term, p.cnt, CAST(i AS INTEGER) AS h,
             CAST(CAST(concat('0x', substr(md5(concat(CAST(i AS VARCHAR),
                                                      ':', p.term)), 1, 8))
                       AS UBIGINT) % {_CMS_WIDTH} AS INTEGER) AS b
      FROM probes p, UNNEST(range(0, {_CMS_DEPTH})) AS u(i)
    )
    SELECT pb.term, CAST(pb.cnt AS BIGINT) AS cnt,
           CAST(min(cms.c) AS BIGINT) AS est_cnt
    FROM pb JOIN cms USING (h, b)
    GROUP BY pb.term, pb.cnt
    """,
    tags=("text", "approx"),
)
def q_cms_frequency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch (depth 4 × width 256, salted-md5 hash family)
    probed for every token with true frequency ≥ 50
    (operators/textops.py::count_min_frequencies). The sketch is
    FIXED-SIZE mergeable state (1024 counters no matter the corpus —
    map-side partials do the collapse, then the table broadcasts onto
    the probe set), and the one-sided guarantee est ≥ true is pinned by
    invariant test alongside this exact-replay oracle — the
    heavy-hitters sibling for when even candidate tracking is too much
    state."""
    return textops.count_min_frequencies(
        t(spark, sf_dir, "documents"),
        depth=_CMS_DEPTH,
        width=_CMS_WIDTH,
        min_count=_CMS_MIN_COUNT,
    )


# ---------------------------------------------------------------------------
# bigram LM scoring (unigram_logprob's conditional sibling)
# ---------------------------------------------------------------------------


@query(
    "q_bigram_logprob",
    oracle=f"""
    WITH base AS (
      SELECT doc_id, list_filter({_TOKENS_SQL}, t -> t != '') AS ts
      FROM documents
    ),
    bg AS (
      SELECT doc_id, ts[i] AS a, ts[i + 1] AS b
      FROM base, UNNEST(range(1, len(ts))) AS u(i)
    ),
    cab AS (SELECT a, b, count(*) AS c_ab FROM bg GROUP BY a, b),
    ca AS (
      SELECT a, count(*) AS c_a
      FROM (SELECT unnest(ts) AS a FROM base) GROUP BY a
    ),
    v AS (SELECT count(*) AS v FROM ca),
    per AS (
      SELECT bg.doc_id, count(*) AS nb,
             round(avg(ln((cab.c_ab + 1.0) / (ca.c_a + v.v))), 6) AS avg_logprob
      FROM bg JOIN cab USING (a, b) JOIN ca USING (a), v
      GROUP BY bg.doc_id
    )
    SELECT d.doc_id, CAST(COALESCE(p.nb, 0) AS BIGINT) AS n_bigrams,
           p.avg_logprob
    FROM documents d LEFT JOIN per p USING (doc_id)
    """,
    tags=("text", "mlprep"),
)
def q_bigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document average bigram log-probability under an add-one-
    smoothed corpus-self-trained bigram LM
    (operators/textops.py::bigram_logprob) — the second-order fluency
    signal: shuffled-token spam scores low even when its unigram mix is
    corpus-typical. Bigram formation is a map-only zip_with of shifted
    token-array slices; count tables join KEYED (vocabulary-sized, never
    broadcast — the unigram_logprob discipline); V is a 1-row
    broadcast."""
    return textops.bigram_logprob(t(spark, sf_dir, "documents"))


# ---------------------------------------------------------------------------
# MAD robust z-score outliers (the anomaly_iqr sibling on medians)
# ---------------------------------------------------------------------------


@query(
    "q_mad_outliers",
    oracle="""
    WITH med AS (
      SELECT event_type, quantile_cont(value, 0.5) AS med
      FROM events GROUP BY event_type
    ),
    mad AS (
      SELECT e.event_type, m.med,
             quantile_cont(abs(e.value - m.med), 0.5) AS mad
      FROM events e JOIN med m USING (event_type)
      GROUP BY e.event_type, m.med
    )
    SELECT e.event_id, e.event_type, e.value,
           ROUND(m.med, 6) AS med, ROUND(m.mad, 6) AS mad,
           ROUND(0.6745 * (e.value - m.med) / NULLIF(m.mad, 0), 6)
             AS robust_z,
           abs(ROUND(0.6745 * (e.value - m.med) / NULLIF(m.mad, 0), 6)) > 3.5
             AS is_outlier
    FROM events e JOIN mad m USING (event_type)
    """,
    tags=("agg", "quality"),
)
def q_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Median-absolute-deviation robust z-scores per event_type
    (0.6745·(x − med)/MAD, flag |z| > 3.5) — the outlier gate that
    survives heavy-tailed value distributions where mean/stddev z-scores
    (q_zscore) and even IQR fences drift. Two group aggregates (median,
    then median of absolute residuals — the second pass is inherent to
    MAD) with the group-cardinality stats broadcast back onto the
    stream; the flag compares the ROUNDED z on both engines so it can't
    flip on a last-ulp quantile difference (the anomaly_iqr
    discipline)."""
    return stats.mad_robust_z(
        t(spark, sf_dir, "events"),
        "event_type",
        "value",
        keep_cols=("event_id",),
    )


# ---------------------------------------------------------------------------
# lag-1 autocorrelation per series (the q_linreg_by_group moment recipe)
# ---------------------------------------------------------------------------


@query(
    "q_autocorr",
    oracle="""
    WITH p AS (
      SELECT user_id, value AS x,
             lag(value) OVER (PARTITION BY user_id
                              ORDER BY CAST(ts AS TIMESTAMP), event_id) AS xp
      FROM events
    ),
    m AS (
      SELECT user_id, CAST(count(*) AS DOUBLE) AS n,
             SUM(x) AS sx, SUM(xp) AS sy, SUM(x * xp) AS sxy,
             SUM(x * x) AS sxx, SUM(xp * xp) AS syy
      FROM p WHERE xp IS NOT NULL GROUP BY user_id
    )
    SELECT user_id, CAST(n AS BIGINT) AS n_pairs,
           ROUND((n * sxy - sx * sy)
                 / SQRT((CASE WHEN n * sxx - sx * sx > 1e-14 * n * sxx
                              THEN n * sxx - sx * sx END)
                        * (CASE WHEN n * syy - sy * sy > 1e-14 * n * syy
                                THEN n * syy - sy * sy END)),
                 6) + 0.0 AS autocorr_lag1
    FROM m
    """,
    tags=("timeseries", "windows", "agg"),
)
def q_autocorr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lag-1 autocorrelation of each user's value series (Pearson r of
    (xₜ, xₜ₋₁) pairs) — the is-this-series-noise-or-trend screen run
    before forecasting or anomaly baselines. One per-user window shuffle
    forms the lag pairs, then the q_linreg_by_group closed-form moment
    recipe (five mergeable sums, NULLIF-guarded) — never a second pass
    or a self-join on positions. Constant series yield NULL (zero
    variance) on both engines."""
    return stats.autocorr_lag1(
        t(spark, sf_dir, "events"), "user_id", "value", ("ts", "event_id")
    )


# ---------------------------------------------------------------------------
# binned quantile normalization (cross-source distribution alignment)
# ---------------------------------------------------------------------------

_QN_PCTS = ", ".join(f"{i / 100.0!r}" for i in range(101))


@query(
    "q_quantile_normalize",
    oracle=f"""
    WITH ranked AS (
      SELECT doc_id, source, n_chars,
             percent_rank() OVER (PARTITION BY source
                                  ORDER BY n_chars, doc_id) AS pr
      FROM documents
    ),
    binned AS (
      SELECT doc_id, source, n_chars,
             CAST(floor(pr * 100 + 0.5) AS INTEGER) AS bin
      FROM ranked
    ),
    q AS (SELECT quantile_cont(n_chars, [{_QN_PCTS}]) AS qs FROM documents),
    qt AS (
      SELECT CAST(i AS INTEGER) AS bin, qs[CAST(i AS INTEGER) + 1] AS qv
      FROM q, UNNEST(range(0, 101)) AS u(i)
    )
    SELECT b.doc_id, b.source, b.n_chars, b.bin,
           ROUND(qt.qv, 6) AS normalized
    FROM binned b JOIN qt USING (bin)
    """,
    tags=("mlprep", "windows", "agg"),
)
def q_quantile_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binned quantile normalization of document length across sources:
    each doc's within-source percent_rank (deterministic (n_chars,
    doc_id) tie-break) maps through the GLOBAL length distribution's
    percentile table — the cross-source alignment step that makes
    length-based curriculum/filter thresholds mean the same thing for
    every source. Per-source windows stay partitioned (never a global
    sort); the global percentile table is ONE aggregate broadcast back
    as 101 rows (swap percentile→percentile_approx past executor-sort
    scale — the q_winsorize note). Half-up bin rounding is spelled
    floor(x + 0.5) on both engines."""
    return stats.quantile_normalize_binned(
        t(spark, sf_dir, "documents"), "doc_id", "source", "n_chars"
    )


# ---------------------------------------------------------------------------
# blocklist screen with attribution (the quality_gate term sibling)
# ---------------------------------------------------------------------------

_BLOCKLIST = ("slow", "big", "hash")


@query(
    "q_blocklist_filter",
    oracle=f"""
    SELECT doc_id,
           CAST(len(hits) AS INTEGER) AS n_hits,
           hits[1] AS first_hit,
           len(hits) > 0 AS is_blocked
    FROM (
      SELECT doc_id,
             list_filter(list_filter({_TOKENS_SQL}, t -> t != ''),
                         t -> list_contains({list(_BLOCKLIST)}, t)) AS hits
      FROM documents
    )
    """,
    tags=("text", "quality", "corpus"),
)
def q_blocklist_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Term-blocklist screen with attribution
    (operators/corpus.py::blocklist_filter): per-document hit count, the
    FIRST offending token in reading order (the quality_gate
    first-failing-rule discipline), and the block verdict — every row
    returned so the caller chooses filter vs quarantine-with-reason.
    The curated blocklist inlines as a literal array, so the whole
    screen is one codegen'd HOF filter: map-only, scan-speed, no join."""
    return corpus.blocklist_filter(
        t(spark, sf_dir, "documents"), terms=_BLOCKLIST
    )


# ---------------------------------------------------------------------------
# market-basket pair lift (co-occurrence association mining)
# ---------------------------------------------------------------------------


@query(
    "q_basket_pairs",
    oracle="""
    WITH b AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    n AS (SELECT CAST(count(DISTINCT l_orderkey) AS DOUBLE) AS n_orders FROM b),
    m AS (SELECT l_partkey, count(*) AS c FROM b GROUP BY l_partkey),
    p AS (
      SELECT a.l_partkey AS p1, b2.l_partkey AS p2, count(*) AS c_ab
      FROM b a JOIN b b2
        ON a.l_orderkey = b2.l_orderkey AND a.l_partkey < b2.l_partkey
      GROUP BY a.l_partkey, b2.l_partkey
      HAVING count(*) >= 2
    )
    SELECT p.p1, p.p2, CAST(p.c_ab AS BIGINT) AS c_ab,
           ROUND(p.c_ab / CAST(m1.c AS DOUBLE), 6) AS confidence,
           ROUND(n.n_orders * p.c_ab / (CAST(m1.c AS DOUBLE) * m2.c), 6)
             AS lift
    FROM p JOIN m m1 ON m1.l_partkey = p.p1
           JOIN m m2 ON m2.l_partkey = p.p2, n
    """,
    tags=("agg", "joins"),
)
def q_basket_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket association pairs over order line items: support
    count, confidence P(p2|p1) and lift for every part pair co-occurring
    in ≥ 2 orders — the co-occurrence mining shape (recommendations,
    co-purchase graphs; on documents it's the PMI recipe with orders as
    context windows). The self-join is keyed on the ORDER (fan-out
    quadratic only in basket size, which is bounded — never all-pairs
    across parts); marginals join part-keyed (part-cardinality tables,
    deliberately NOT broadcast at catalog scale); the order total is a
    1-row broadcast."""
    return stats.basket_pairs(
        t(spark, sf_dir, "lineitem"), "l_orderkey", "l_partkey"
    )


# ---------------------------------------------------------------------------
# RFM segmentation (quartile-boundary scoring, never a global ntile)
# ---------------------------------------------------------------------------


@query(
    "q_rfm_segments",
    oracle="""
    WITH cust AS (
      SELECT o_custkey, max(o_orderdate) AS last_order,
             count(*) AS freq, ROUND(sum(o_totalprice), 2) AS monetary
      FROM orders GROUP BY o_custkey
    ),
    mx AS (SELECT max(o_orderdate) AS maxd FROM orders),
    base AS (
      SELECT o_custkey,
             CAST(date_diff('day', last_order, mx.maxd) AS INTEGER) AS recency,
             CAST(freq AS BIGINT) AS freq, monetary
      FROM cust, mx
    ),
    q AS (
      SELECT ROUND(quantile_cont(recency, 0.25), 6) AS r1,
             ROUND(quantile_cont(recency, 0.50), 6) AS r2,
             ROUND(quantile_cont(recency, 0.75), 6) AS r3,
             ROUND(quantile_cont(freq, 0.25), 6) AS f1,
             ROUND(quantile_cont(freq, 0.50), 6) AS f2,
             ROUND(quantile_cont(freq, 0.75), 6) AS f3,
             ROUND(quantile_cont(monetary, 0.25), 6) AS m1,
             ROUND(quantile_cont(monetary, 0.50), 6) AS m2,
             ROUND(quantile_cont(monetary, 0.75), 6) AS m3
      FROM base
    )
    SELECT b.o_custkey, b.recency, b.freq, b.monetary,
           CAST(4 - ((b.recency > q.r1)::INT + (b.recency > q.r2)::INT
                     + (b.recency > q.r3)::INT) AS INTEGER) AS r_score,
           CAST(1 + ((b.freq > q.f1)::INT + (b.freq > q.f2)::INT
                     + (b.freq > q.f3)::INT) AS INTEGER) AS f_score,
           CAST(1 + ((b.monetary > q.m1)::INT + (b.monetary > q.m2)::INT
                     + (b.monetary > q.m3)::INT) AS INTEGER) AS m_score
    FROM base b, q
    """,
    tags=("agg", "analytics"),
)
def q_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM customer segmentation: recency (days since last order),
    frequency, monetary per customer, each scored 1–4 by GLOBAL quartile
    boundaries (recency inverted — recent = 4). The boundaries come from
    ONE aggregate broadcast back as a single row — never a global
    ntile, whose unpartitioned window is exactly the single-partition
    sort this repo bans at scale (q_ntile_bucket's windows are
    per-group; a customer-cardinality frame has no such key).
    Boundaries and monetary are rounded before comparison on both
    engines (the anomaly_iqr fence discipline)."""
    return stats.rfm_scores(
        t(spark, sf_dir, "orders"), "o_custkey", "o_orderdate", "o_totalprice"
    )


# ---------------------------------------------------------------------------
# embedding covariance (mergeable Gram partials) + PCA projection
# ---------------------------------------------------------------------------


@query(
    "q_embedding_covariance",
    oracle="""
    WITH x AS (
      SELECT vec_id, CAST(i AS INTEGER) AS i,
             CAST(embedding[CAST(i AS INTEGER) + 1] AS DOUBLE) AS xv
      FROM embeddings, UNNEST(range(0, len(embedding))) AS u(i)
    )
    SELECT a.i, b.i AS j,
           ROUND((SUM(a.xv * b.xv) - SUM(a.xv) * SUM(b.xv) / COUNT(*))
                 / NULLIF(COUNT(*) - 1, 0), 6) + 0.0 AS cov
    FROM x a JOIN x b ON a.vec_id = b.vec_id AND a.i <= b.i
    GROUP BY a.i, b.i
    """,
    tags=("similarity", "mlprep", "agg"),
)
def q_embedding_covariance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample covariance matrix of the embedding column (upper triangle)
    — the PCA/whitening input and the redundant-dimension screen
    (operators/embeddings.py::covariance_matrix). The Spark side is the
    mergeable-moments pattern at its purest: ONE corpus scan producing a
    single augmented-Gram accumulator per partition (an Arrow-batched
    NumPy gemm), merged by elementwise sum — the oracle replays the
    same moments relationally via a dimension-pair self-join (fine at
    oracle scale, quadratic-in-d at corpus scale, which is exactly why
    the engine side uses gemm partials instead)."""
    return emb_ops.covariance_matrix(
        t(spark, sf_dir, "embeddings"), "embedding"
    )


_PCA_K = 4
_PCA_K_ROUNDS = 100


def _pca_deflated_oracle(k: int = _PCA_K, rounds: int = _PCA_K_ROUNDS) -> str:
    """Recursive-CTE twin of ``pca_power_project_k``: k chained fixed-round
    power iterations with Hotelling deflation over the round-6-clamped
    covariance. Every non-recursive CTE is MATERIALIZED — without the
    hint DuckDB 1.0 inlines the cov{c} chain into each recursion step,
    re-evaluating the WHOLE upstream pyramid (including the previous
    components' 100-round recursions) per step: exponential work and a
    fast "too many open files" on the parquet view. The λ/deflation
    arithmetic mirrors the engine side association-for-association:
    λ = ROUND(Σ (vᵢ·covᵢⱼ)·vⱼ, 4) and cov' = ROUND(cov − (λ·vᵢ)·vⱼ, 6)."""
    parts = ["""
    WITH RECURSIVE x AS MATERIALIZED (
      SELECT vec_id, CAST(i AS INTEGER) AS i,
             CAST(embedding[CAST(i AS INTEGER) + 1] AS DOUBLE) AS xv
      FROM embeddings, UNNEST(range(0, len(embedding))) AS u(i)
    ),
    cov_ut AS MATERIALIZED (
      SELECT a.i, b.i AS j,
             ROUND((SUM(a.xv * b.xv) - SUM(a.xv) * SUM(b.xv) / COUNT(*))
                   / NULLIF(COUNT(*) - 1, 0), 6) + 0.0 AS cov
      FROM x a JOIN x b ON a.vec_id = b.vec_id AND a.i <= b.i
      GROUP BY a.i, b.i
    ),
    cov0 AS MATERIALIZED (
      SELECT i, j, cov FROM cov_ut
      UNION ALL SELECT j, i, cov FROM cov_ut WHERE i <> j
    ),
    dims AS MATERIALIZED (SELECT DISTINCT i FROM cov_ut),
    nd AS MATERIALIZED (SELECT CAST(COUNT(*) AS DOUBLE) AS d FROM dims),
    mu AS MATERIALIZED (SELECT i, ROUND(AVG(xv), 6) AS m FROM x GROUP BY i)"""]
    for c in range(k):
        parts.append(f""",
    r{c}(i, v, t) AS (
      SELECT i, 1.0e0 / sqrt((SELECT d FROM nd)), 0 FROM dims
      UNION ALL
      SELECT m.i,
             m.mv / (SELECT sqrt(SUM(m2.mv * m2.mv)) FROM (
               SELECT c2.i, SUM(c2.cov * t2.v) AS mv
               FROM cov{c} c2 JOIN r{c} t2 ON t2.i = c2.j GROUP BY c2.i
             ) m2),
             (SELECT MAX(t3.t) FROM r{c} t3) + 1
      FROM (
        SELECT c.i, SUM(c.cov * t1.v) AS mv
        FROM cov{c} c JOIN r{c} t1 ON t1.i = c.j GROUP BY c.i
      ) m
      WHERE (SELECT MAX(t4.t) FROM r{c} t4) < {rounds}
    ),
    axis{c} AS MATERIALIZED (SELECT i, ROUND(v, 6) AS v FROM r{c} WHERE t = {rounds})""")
        if c < k - 1:
            parts.append(f""",
    lam{c} AS MATERIALIZED (
      SELECT ROUND(SUM((a1.v * c.cov) * a2.v), 4) AS lam
      FROM cov{c} c
      JOIN axis{c} a1 ON a1.i = c.i JOIN axis{c} a2 ON a2.i = c.j
    ),
    cov{c + 1} AS MATERIALIZED (
      SELECT c.i, c.j,
             ROUND(c.cov - ((SELECT lam FROM lam{c}) * a1.v) * a2.v, 6) AS cov
      FROM cov{c} c
      JOIN axis{c} a1 ON a1.i = c.i JOIN axis{c} a2 ON a2.i = c.j
    )""")
    sels = ",\n           ".join(
        f"""ROUND(SUM(x.xv * a{c}.v) - (SELECT SUM(m2.m * b.v)
                                       FROM mu m2 JOIN axis{c} b USING (i)), 6)
             + 0.0 AS pc{c + 1}""" for c in range(k))
    joins = " ".join(f"JOIN axis{c} a{c} ON a{c}.i = x.i" for c in range(k))
    parts.append(f"""
    SELECT x.vec_id,
           {sels}
    FROM x {joins}
    GROUP BY x.vec_id""")
    return "".join(parts)


@query(
    "q_pca_project",
    oracle=_pca_deflated_oracle(),
    tags=("similarity", "mlprep"),
)
def q_pca_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-4 PCA projection of the embedding table — UPGRADED round 8 from
    rows-only eigh to a hash oracle via fixed-round power iteration with
    Hotelling deflation (operators/embeddings.py::pca_power_project_k),
    the same determinism-by-construction trick that closed q_kmeans in
    round 7: both engines run exactly 100 v ← Cv/‖Cv‖ steps per
    component from the same 1/√d start over the same round-6-clamped
    covariance, clamp each axis to 6 digits, deflate with a 4dp Rayleigh
    quotient, and re-clamp the matrix to 6 digits — so the k·d axis
    matrix agrees exactly and the map-only broadcast-literal projection
    hashes identically. The full-eigh path (pca_fit/pca_project) remains
    the reference operator, invariant-pinned in tests/test_statml.py
    (orthonormality, descending explained variance, eigh-vs-power-axis
    agreement). Scale shape: ONE Arrow-gemm corpus scan for the Gram,
    driver-side d×d iteration (feature-width metadata), zero-shuffle
    projection."""
    return emb_ops.pca_power_project_k(
        t(spark, sf_dir, "embeddings"),
        "vec_id",
        "embedding",
        k=_PCA_K,
        rounds=_PCA_K_ROUNDS,
    )
