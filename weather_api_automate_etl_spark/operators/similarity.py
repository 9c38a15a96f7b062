"""Similarity search over embedding columns (``array<float>``).

Three tiers (extension surface per BASELINE.json; SURVEY.md §2.7 E2):

- **brute-force top-k** — map-only cosine against a literal query vector,
  then ``orderBy().limit(k)`` which Spark executes as TakeOrdered (per-
  partition top-k + driver merge of k·P rows — never a full sort).
- **IVF** — coarse quantizer (cluster centroids) + probe-the-nearest-lists:
  the scan is partition-pruned to ``nprobe`` inverted lists. Centroids come
  from an elementwise-mean aggregate (posexplode + groupBy(pos)).
- **random-hyperplane LSH** — sign-bit bucket per row (map-only), so
  near-dup candidate generation is a bucket equi-join, not all-pairs.

The LSH hyperplanes are derived deterministically from md5 of (plane, dim)
— no RNG state to ship, reproducible across engines and runs.

Background (PAPERS.md corpus): the prune-by-coarse-structure-then-verify
shape follows the distributed top-k similarity-search literature (e.g.
REPOSE, ICDE 2021 — partition-local reference structures + global top-k
merge; incremental top-k for interactive sessions, EDBT 2020). The IVF and
LSH tiers here are the DataFrame-native instances of that pattern.
"""

from __future__ import annotations

import math
from collections.abc import Sequence

from pyspark.sql import DataFrame, functions as F

from weather_api_automate_etl_spark.functions.vectors import (
    cosine_similarity,
    dot_product,
)


def _query_vec_lit(query_vec: Sequence[float]):
    return F.array(*[F.lit(float(x)) for x in query_vec])


def topk_cosine(
    df: DataFrame,
    vec_col: str,
    query_vec: Sequence[float],
    k: int = 10,
    id_col: str = "vec_id",
    round_digits: int = 6,
) -> DataFrame:
    """Brute-force cosine top-k: the exact baseline every ANN variant is
    measured against. One narrow pass + TakeOrdered(k)."""
    score = cosine_similarity(F.col(vec_col), _query_vec_lit(query_vec))
    return (
        df.select(F.col(id_col), F.round(score, round_digits).alias("score"))
        .orderBy(F.desc("score"), F.asc(id_col))
        .limit(k)
    )


def centroids_by(df: DataFrame, vec_col: str, list_col: str) -> DataFrame:
    """Elementwise-mean centroid per inverted list: (list, centroid).

    posexplode → groupBy(list, pos) avg → re-assemble ordered array. One
    shuffle of n·d scalar rows; run once at index-build time, not per query.
    """
    exploded = df.select(
        F.col(list_col).alias("list_id"),
        F.posexplode(F.col(vec_col)).alias("pos", "val"),
    )
    means = exploded.groupBy("list_id", "pos").agg(F.avg("val").alias("m"))
    return (
        means.groupBy("list_id")
        .agg(
            F.array_sort(F.collect_list(F.struct("pos", "m"))).alias("pm")
        )
        .select(
            "list_id",
            F.transform(F.col("pm"), lambda s: s.getField("m")).alias("centroid"),
        )
    )


def kmeans_fit(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 8,
    max_iter: int = 10,
    tol: float = 1e-4,
) -> tuple[DataFrame, int, bool]:
    """Lloyd's k-means as a distributed loop — the IVF index BUILD step
    (``centroids_by`` + ``nearest_centroid`` are its two halves; this
    iterates them to a fixed point). Returns (centroids, rounds, converged).

    Same iterative discipline as connected_components / pagerank:

    - deterministic init (the k DISTINCT vectors with the lowest
      ``id_col`` — distinct so duplicate rows, which dedup-shaped corpora
      are full of, cannot seed two identical centroids; no RNG state).
      An input with fewer than k distinct vectors yields that many
      centroids — the honest maximum; there is no k-th cluster to find,
    - per round: assign = broadcast k-sized centroid table + per-vector
      top-1 (corpus-linear, no corpus shuffle beyond the window partials),
      update = one (list, pos) mean aggregate; a cluster that receives no
      members keeps its previous centroid (carried forward, so the
      codebook never shrinks below its init size and an
      emptied-then-repopulated list stays addressable),
    - each new centroid table is localCheckpoint'ed (k·d rows — tiny) and
      the movement probe is a k·d-row join-on-(list,pos) aggregate over
      METADATA-sized frames, never the corpus,
    - stops when total centroid L1 movement < ``tol`` (converged=True) or
      after ``max_iter`` rounds (converged=False — returned, not raised:
      a partially-converged codebook is still a usable IVF quantizer,
      unlike a non-converged connected-components labeling).
    """
    from pyspark.sql.window import Window

    init = (
        # deterministic distinct: one representative (lowest id) per
        # distinct vector, then the k lowest representatives; cast to
        # double so round-N centroids (means — always double) coalesce
        # type-correctly with carried-forward init centroids
        df.groupBy(F.col(vec_col).cast("array<double>").alias("centroid"))
        .agg(F.min(id_col).alias("__id"))
        .orderBy("__id")
        .limit(k)
        .withColumn("list_id", F.row_number().over(Window.orderBy("__id")) - 1)
        .select("list_id", "centroid")
    )
    # k rows: checkpoint so each round starts from materialized centroids
    cents = init.localCheckpoint(eager=True)
    converged = False
    rounds = 0
    for rounds in range(1, max_iter + 1):
        assigned = nearest_centroid(df, cents, vec_col=vec_col, id_col=id_col)
        updated = centroids_by(
            df.join(assigned.select(id_col, "list_id"), id_col), vec_col, "list_id"
        )
        # carry an emptied cluster's previous centroid forward: the left
        # join keeps all k list ids, so the movement probe sees every
        # cluster (a vanished one contributes 0 — genuinely unmoved)
        new_cents = (
            cents.select("list_id", F.col("centroid").alias("__old"))
            .join(updated, "list_id", "left")
            .select(
                "list_id",
                F.coalesce(F.col("centroid"), F.col("__old")).alias("centroid"),
            )
            .localCheckpoint(eager=True)
        )
        # movement probe: explode both k·d-sized tables and L1-compare —
        # metadata-scale work (k·d rows), not corpus-scale
        old_e = cents.select(
            "list_id", F.posexplode("centroid").alias("pos", "old_v")
        )
        new_e = new_cents.select(
            "list_id", F.posexplode("centroid").alias("pos", "new_v")
        )
        moved = (
            old_e.join(new_e, ["list_id", "pos"])
            .agg(F.sum(F.abs(F.col("new_v") - F.col("old_v"))).alias("m"))
            .first()[0]
        )
        cents = new_cents
        if moved is not None and moved < tol:
            converged = True
            break
    return cents, rounds, converged


def ivf_topk(
    df: DataFrame,
    vec_col: str,
    list_col: str,
    query_vec: Sequence[float],
    k: int = 10,
    nprobe: int = 2,
    id_col: str = "vec_id",
) -> DataFrame:
    """IVF search: rank inverted lists by centroid cosine, scan the top
    ``nprobe`` lists only, then exact top-k within the probed subset.

    At scale the table is partitioned/bucketed by ``list_col``, so the
    probe is partition pruning — the scan touches nprobe/nlists of the data.
    """
    cents = centroids_by(df, vec_col, list_col)
    q = _query_vec_lit(query_vec)
    # probe ranking is ROUNDED + list-id-tie-broken: centroid means are
    # aggregation-order-sensitive in the last ulp (unlike the sequential
    # dot-product folds), so raw-double ordering is not reproducible across
    # engines/runs; rounding absorbs the ulp noise and the id breaks ties
    probed = [
        r["list_id"]
        for r in cents.select(
            "list_id",
            F.round(cosine_similarity(F.col("centroid"), q), 6).alias("s"),
        )
        .orderBy(F.desc("s"), F.asc("list_id"))
        .limit(nprobe)
        .collect()
    ]
    subset = df.filter(F.col(list_col).isin(probed))
    return topk_cosine(subset, vec_col, query_vec, k=k, id_col=id_col)


def _hyperplane(plane: int, dim: int) -> list[float]:
    """Deterministic pseudo-random unit hyperplane from md5(plane, dim).

    Engine-portable (no RNG): component i = centered md5-derived uniform."""
    import hashlib

    comps = []
    for i in range(dim):
        h = hashlib.md5(f"plane{plane}:dim{i}".encode()).hexdigest()
        comps.append(int(h[:8], 16) / float(0xFFFFFFFF) - 0.5)
    norm = math.sqrt(sum(c * c for c in comps)) or 1.0
    return [c / norm for c in comps]


def knn_join(
    corpus: DataFrame,
    probes: DataFrame,
    vec_col: str,
    dim: int,
    k: int = 5,
    n_planes: int = 6,
    id_col: str = "vec_id",
    probe_id_col: str = "probe_id",
    round_digits: int = 6,
) -> DataFrame:
    """Blocked k-NN join: for every probe vector, the top-``k`` most
    cosine-similar corpus vectors that share its LSH bucket.

    Shape (the 100 TB-safe many-query ANN): both sides get a map-only
    hyperplane-LSH bucket; the candidate space is a bucket **equi-join**
    (probe side broadcast — it is the small side by construction), then
    exact cosine verification and a per-probe window top-k. The corpus is
    never all-pairs'd and never fully sorted; the only shuffle is the
    per-probe window partitioned on (probe, bucket-match) rows, whose size
    is bucket-occupancy-bounded.

    Fewer planes ⇒ bigger buckets ⇒ higher recall and higher cost; 2^n_planes
    should be sized so the expected bucket occupancy × |probes| fits a
    shuffle partition. Deterministic (md5-derived planes) and fully
    SQL-expressible, unlike the iterative IVF probe.
    """
    from pyspark.sql.window import Window

    # bucket as an inline expression on each side — joining back to a
    # (id, bucket) projection would be a corpus-wide self-join on the id,
    # which stops being broadcastable the moment the corpus is big
    bucket = lsh_bucket_expr(vec_col, dim, n_planes)
    c = corpus.select(
        F.col(id_col), F.col(vec_col).alias("_cvec"), bucket.alias("bucket")
    )
    p = probes.select(
        F.col(probe_id_col), F.col(vec_col).alias("_pvec"), bucket.alias("bucket")
    )
    scored = c.join(F.broadcast(p), "bucket").select(
        F.col(probe_id_col),
        F.col(id_col),
        F.round(
            cosine_similarity(F.col("_pvec"), F.col("_cvec")), round_digits
        ).alias("score"),
    )
    w = Window.partitionBy(probe_id_col).orderBy(F.desc("score"), F.asc(id_col))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select(probe_id_col, id_col, "score", F.col("rk").cast("int").alias("rk"))
    )


def nearest_centroid(
    df: DataFrame,
    centroids: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    round_digits: int = 6,
) -> DataFrame:
    """Vector-quantization assignment: each vector mapped to its most
    cosine-similar centroid — the assign step of IVF index build / one
    Lloyd iteration of k-means.

    The centroid table is nlists-sized (index metadata), so the scan is a
    broadcast nested-loop over a handful of rows per vector followed by a
    per-vector WindowGroupLimit top-1: corpus-linear, no shuffle of the
    corpus beyond the per-vector window partials. Ties break on the lower
    centroid id. Returns (id, list_id, score)."""
    from pyspark.sql.window import Window

    scored = df.select(F.col(id_col), F.col(vec_col).alias("_v")).crossJoin(
        F.broadcast(centroids.select("list_id", "centroid"))
    ).select(
        F.col(id_col),
        F.col("list_id"),
        F.round(
            cosine_similarity(F.col("_v"), F.col("centroid")), round_digits
        ).alias("score"),
    )
    w = Window.partitionBy(id_col).orderBy(F.desc("score"), F.asc("list_id"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .drop("rk")
    )


def lsh_bucket_expr(vec_col: str, dim: int, n_planes: int = 8):
    """The hyperplane-LSH bucket as a plain Column expression (sign bits of
    ``n_planes`` deterministic projections, packed into an int) — composable
    into any projection without a join."""
    bucket = None
    for p in range(n_planes):
        proj = dot_product(F.col(vec_col), _query_vec_lit(_hyperplane(p, dim)))
        bit = F.when(proj >= 0, F.lit(1 << p)).otherwise(F.lit(0))
        bucket = bit if bucket is None else bucket + bit
    return bucket.cast("int")


def hyperplane_lsh_buckets(
    df: DataFrame, vec_col: str, dim: int, n_planes: int = 8, id_col: str = "vec_id"
) -> DataFrame:
    """Random-hyperplane LSH: (id, bucket) where bucket packs the sign bits
    of ``n_planes`` projections. Map-only; cosine-similar vectors collide
    with probability 1 − θ/π per plane."""
    return df.select(
        F.col(id_col), lsh_bucket_expr(vec_col, dim, n_planes).alias("bucket")
    )
