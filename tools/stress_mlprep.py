"""20x replication stress for the round-5 corpus-prep family.

sf0.1 documents / embeddings copied N times with shifted ids. Document
text is salted PER TOKEN (every token gets a per-copy suffix), not by an
appended suffix token: span-level dedup looks at every interior k-token
window, so a suffix-only salt (the stress_corpus.py recipe, fine for
whole-document shingling) would leave every interior span identical
across copies — N-way duplicated everywhere, the degenerate
collapse-to-empty workload. Per-token salting keeps each copy's
WITHIN-copy duplicate structure intact (spans still collide across docs
of the same copy) while making copies disjoint, so duplicated-span
GROUPS scale with the corpus and each span's document count stays
bounded — the realistic growth profile. Embedding copies are exact
(vectors unchanged), which stresses semdedup's bucket-quadratic pair
step at 20x occupancy — the worst case for that operator.

Usage: python tools/stress_mlprep.py [N]. Results recorded in SCALING.md;
re-run after touching remove_duplicated_spans / tfidf / neardup_survivors /
train_shuffle / quantize / standardize.
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

from pyspark.sql import DataFrame, functions as F

from tools.stress_corpus import bench, replicate_embeddings
from weather_api_automate_etl_spark.operators import (
    corpus,
    dedup,
    embeddings as emb_ops_mod,
    similarity,
    textops,
)
from weather_api_automate_etl_spark.session import get_spark
from weather_api_automate_etl_spark.sources.tables import load_table

SF_DIR = "/root/testdata/sf0.1"


def replicate_docs_tokensalt(docs: DataFrame, n: int) -> DataFrame:
    """N shifted copies with every TOKEN suffixed by the copy index (see
    module docstring for why span-level stress cannot use suffix-only
    salting)."""
    def salter(i: int):
        # unary closure, NOT `lambda t, i=i`: pyspark binds a second HOF
        # lambda param (even defaulted) to the element index
        return lambda tk: F.concat(tk, F.lit(f"_{i}"))

    copies = [
        docs.withColumn("doc_id", F.col("doc_id") + F.lit(i * 10_000_000))
        .withColumn(
            "text",
            F.array_join(
                F.transform(F.split(F.col("text"), " "), salter(i)), " "
            ),
        )
        for i in range(n)
    ]
    out = copies[0]
    for c in copies[1:]:
        out = out.unionByName(c)
    return out


def doc_ops() -> dict:
    return {
        "dup_span_removal (k=5)": lambda d: dedup.remove_duplicated_spans(
            d, k=5, min_docs=2
        ),
        "tfidf_top_terms (k=3)": lambda d: textops.tfidf_top_terms(d, k=3),
        "token_entropy": textops.token_entropy,
        "train_shuffle (8 shards)": lambda d: corpus.train_shuffle(
            d, n_shards=8, seed="epoch0"
        ),
    }


def emb_ops() -> dict:
    def semdedup(emb):
        buckets = similarity.hyperplane_lsh_buckets(
            emb, "embedding", dim=64, n_planes=8
        )
        blocked = emb.join(buckets, "vec_id").select(
            "vec_id", "embedding", "bucket"
        )
        pairs = dedup.embedding_neardup_pairs(
            blocked, "vec_id", "embedding", block_col="bucket", threshold=0.3
        )
        return dedup.neardup_survivors(emb, pairs, "vec_id")

    def vec_pairs(emb):
        buckets = similarity.hyperplane_lsh_buckets(
            emb, "embedding", dim=64, n_planes=8
        )
        blocked = emb.join(buckets, "vec_id").select(
            "vec_id", "embedding", "bucket"
        )
        return dedup.embedding_neardup_pairs_vectorized(
            blocked, "vec_id", "embedding", block_col="bucket", threshold=0.3
        )

    return {
        "semdedup_survivors": semdedup,
        "vectorized_pairs": vec_pairs,
        "quantize_int8": lambda e: emb_ops_mod.quantize_int8(
            e, "vec_id", "embedding"
        ),
        "standardize_dims": lambda e: emb_ops_mod.standardize_dims(
            e, "vec_id", "embedding"
        ),
    }


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    spark = get_spark("stress-mlprep")
    spark.sparkContext.setLogLevel("ERROR")
    docs = load_table(spark, SF_DIR, "documents")
    emb = load_table(spark, SF_DIR, "embeddings")
    big_docs = replicate_docs_tokensalt(docs, n).repartition(32).localCheckpoint()
    big_emb = replicate_embeddings(emb, n).repartition(32).localCheckpoint()
    print(
        f"docs: {docs.count():,} -> {big_docs.count():,}; "
        f"embeddings: {emb.count():,} -> {big_emb.count():,}"
    )
    for label, d, e in (("sf0.1", docs, emb), (f"{n}x", big_docs, big_emb)):
        print(f"--- {label}")
        for name, fn in doc_ops().items():
            bench(name, fn, d)
        for name, fn in emb_ops().items():
            bench(name, fn, e)


if __name__ == "__main__":
    main()
