"""20x replication stress for the dedup / similarity / corpus family.

Replicates the sf0.1 documents (and embeddings) tables N times with shifted
ids and per-copy text salting, so duplicate GROUPS scale like a real corpus
(each logical duplicate cluster appears once per copy — cluster size stays
bounded while cluster COUNT scales with the data; unsalted replication
would instead grow every bucket N-fold, the pathological case blocked
operators are designed to avoid). Times the heavy operators on base vs
replicated input. Usage: python tools/stress_corpus.py [N].

Results are recorded in SCALING.md; re-run after touching
operators/dedup.py, operators/similarity.py, or operators/textops.py.
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import DataFrame, functions as F

from weather_api_automate_etl_spark.operators import dedup, similarity, textops
from weather_api_automate_etl_spark.session import get_spark
from weather_api_automate_etl_spark.sources.tables import load_table

SF_DIR = "/root/testdata/sf0.1"


def replicate_docs(docs: DataFrame, n: int) -> DataFrame:
    copies = [
        docs.withColumn("doc_id", F.col("doc_id") + F.lit(i * 10_000_000))
        # per-copy salt token: near-dup structure preserved WITHIN a copy,
        # no artificial N-way duplicate groups ACROSS copies
        .withColumn("text", F.concat(F.col("text"), F.lit(f" copy{i}")))
        for i in range(n)
    ]
    out = copies[0]
    for c in copies[1:]:
        out = out.unionByName(c)
    return out


def replicate_embeddings(emb: DataFrame, n: int) -> DataFrame:
    copies = [
        emb.withColumn("vec_id", F.col("vec_id") + F.lit(i * 10_000_000))
        for i in range(n)
    ]
    out = copies[0]
    for c in copies[1:]:
        out = out.unionByName(c)
    return out


def bench(name: str, fn, df: DataFrame) -> float:
    best = float("inf")
    for _ in range(2):
        t0 = time.monotonic()
        fn(df).write.format("noop").mode("overwrite").save()
        best = min(best, time.monotonic() - t0)
    print(f"{name:24s} {best:7.2f} s")
    return best


def doc_ops() -> dict:
    def pairs(docs):
        sig = dedup.minhash_signatures(docs, "doc_id", "text", num_hashes=8, band_size=2)
        return dedup.minhash_candidate_pairs(sig, "doc_id")

    def clusters(docs):
        sig = dedup.minhash_signatures(docs, "doc_id", "text", num_hashes=8, band_size=2)
        return dedup.dedup_clusters(docs, dedup.minhash_candidate_pairs(sig, "doc_id"))

    def pr(docs):
        from weather_api_automate_etl_spark.operators import graph

        sig = dedup.minhash_signatures(docs, "doc_id", "text", num_hashes=8, band_size=2)
        return graph.pagerank(
            docs, dedup.minhash_candidate_pairs(sig, "doc_id"),
            node_id="doc_id", iterations=2,
        )

    return {
        "minhash_pairs": pairs,
        "dedup_clusters": clusters,
        "dup_shingle_fraction": lambda d: dedup.duplicated_shingle_fraction(d, k=3),
        "repetition_profile": lambda d: textops.repetition_profile(d),
        "pagerank_2iter": pr,
        "bm25": lambda d: textops.bm25_scores(d, ["spark", "table", "join"]),
    }


def emb_ops() -> dict:
    def knn(emb):
        probes = (
            emb.filter(F.col("vec_id") % 10_000_000 < 5)
            .withColumnRenamed("vec_id", "probe_id")
        )
        corpus = emb.filter(F.col("vec_id") % 10_000_000 >= 5)
        return similarity.knn_join(corpus, probes, "embedding", dim=64, k=5, n_planes=6)

    def kmeans(emb):
        from weather_api_automate_etl_spark.operators.similarity import (
            kmeans_fit,
            nearest_centroid,
        )

        cents, _, _ = kmeans_fit(emb, k=8, max_iter=4, tol=0.0)
        return nearest_centroid(emb, cents)

    return {"knn_join (5/copy probes)": knn, "kmeans_fit (k=8, 4 rounds)": kmeans}


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    spark = get_spark("stress-corpus")
    spark.sparkContext.setLogLevel("ERROR")
    docs = load_table(spark, SF_DIR, "documents")
    emb = load_table(spark, SF_DIR, "embeddings")
    big_docs = replicate_docs(docs, n).repartition(32).localCheckpoint()
    big_emb = replicate_embeddings(emb, n).repartition(32).localCheckpoint()
    print(f"docs: {docs.count():,} -> {big_docs.count():,}; "
          f"embeddings: {emb.count():,} -> {big_emb.count():,}")
    for label, d, e in (("sf0.1", docs, emb), (f"{n}x", big_docs, big_emb)):
        print(f"--- {label}")
        for name, fn in doc_ops().items():
            bench(name, fn, d)
        for name, fn in emb_ops().items():
            bench(name, fn, e)


if __name__ == "__main__":
    main()
