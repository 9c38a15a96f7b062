"""20x replication stress for the round-5 third-wave stat/ML family.

Replication recipes per input table, chosen so each operator's HARD axis
actually grows:
- documents: per-token copy salting (stress_mlprep's recipe) — the
  vocabulary grows ~20x, which is the worst case for bigram_logprob's
  vocabulary-keyed count joins, while the CMS sketch must stay fixed-size
  (its whole point — the sketch table is depth x width no matter the
  corpus, so its cost should grow only with the scanned stream).
- embeddings: exact copies with shifted ids — covariance answers are
  unchanged (same distribution), work is linear in rows; the gemm-partial
  merge stays (d+1)^2 x partitions regardless.
- events: shifted event_id/user_id copies — 20x series for MAD
  (two-pass percentile) and autocorrelation (lag window + moments).
- lineitem: shifted l_orderkey copies — 20x baskets with identical
  per-copy structure, so basket-pair GROUPS scale while per-order
  fan-out stays bounded (the realistic growth profile for the
  order-keyed self-join).
- part: shifted keys + per-copy brand salt — block COUNT grows 20x
  while per-block size stays bounded (new vendors bring new catalogs),
  the axis a BLOCKED fuzzy join must scale along.

Usage: python tools/stress_statml.py [N]. Results recorded in
SCALING.md; re-run after touching count_min_frequencies /
bigram_logprob / covariance_matrix / pca_project / q_basket_pairs.
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

from pyspark.sql import DataFrame, functions as F

from tools.stress_corpus import bench, replicate_embeddings
from tools.stress_mlprep import replicate_docs_tokensalt
from weather_api_automate_etl_spark.operators import (
    corpus,
    dedup,
    embeddings as emb_ops_mod,
    stats,
    textops,
)
from weather_api_automate_etl_spark.session import get_spark
from weather_api_automate_etl_spark.sources.tables import load_table

SF_DIR = "/root/testdata/sf0.1"


def replicate_shifted(df: DataFrame, n: int, cols: dict[str, int]) -> DataFrame:
    """N copies with each id column in ``cols`` shifted by copy*offset."""
    copies = [
        df.select(
            *[
                (F.col(c) + F.lit(i * off)).alias(c) if off else F.col(c)
                for c, off in (
                    (f.name, cols.get(f.name, 0)) for f in df.schema.fields
                )
            ]
        )
        for i in range(n)
    ]
    out = copies[0]
    for c in copies[1:]:
        out = out.unionByName(c)
    return out


def doc_ops() -> dict:
    return {
        "cms_frequency (4x256)": lambda d: textops.count_min_frequencies(
            d, depth=4, width=256, min_count=50
        ),
        "bigram_logprob": textops.bigram_logprob,
        "blocklist_filter": lambda d: corpus.blocklist_filter(
            d, terms=("slow", "big", "hash")
        ),
    }


def emb_ops() -> dict:
    return {
        "covariance_matrix": lambda e: emb_ops_mod.covariance_matrix(
            e, "embedding"
        ),
        "pca_project (k=8)": lambda e: emb_ops_mod.pca_project(
            e, "vec_id", "embedding", k=8
        ),
    }


def event_ops() -> dict:
    return {
        "mad_outliers": lambda ev: stats.mad_robust_z(
            ev, "event_type", "value", keep_cols=("event_id",)
        ),
        "autocorr_lag1": lambda ev: stats.autocorr_lag1(
            ev, "user_id", "value", ("ts", "event_id")
        ),
    }


def fuzzy(part: DataFrame) -> DataFrame:
    return dedup.fuzzy_match_blocked(
        part, "p_partkey", "p_brand", "p_name", max_dist=2
    )


def basket(li: DataFrame) -> DataFrame:
    return stats.basket_pairs(li, "l_orderkey", "l_partkey")


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    spark = get_spark("stress-statml")
    spark.sparkContext.setLogLevel("ERROR")
    docs = load_table(spark, SF_DIR, "documents")
    emb = load_table(spark, SF_DIR, "embeddings")
    ev = load_table(spark, SF_DIR, "events")
    li = load_table(spark, SF_DIR, "lineitem")
    big_docs = replicate_docs_tokensalt(docs, n).repartition(32).localCheckpoint()
    big_emb = replicate_embeddings(emb, n).repartition(32).localCheckpoint()
    big_ev = (
        replicate_shifted(
            ev, n, {"event_id": 100_000_000, "user_id": 1_000_000}
        )
        .repartition(32)
        .localCheckpoint()
    )
    big_li = (
        replicate_shifted(li, n, {"l_orderkey": 100_000_000})
        .repartition(32)
        .localCheckpoint()
    )
    # parts: shift keys AND salt the brand per copy — new vendors bring
    # new catalogs, so block COUNT grows with the corpus while per-block
    # size stays bounded (the realistic axis for a BLOCKED pair join; an
    # unsalted brand would grow each block 20x and the pair set 400x,
    # which is precisely the failure mode blocking exists to prevent)
    part = load_table(spark, SF_DIR, "part")
    big_part = (
        replicate_shifted(part, n, {"p_partkey": 100_000_000})
        .withColumn(
            "p_brand",
            F.concat(
                F.col("p_brand"),
                F.lit("#"),
                ((F.col("p_partkey") / F.lit(100_000_000)).cast("int")).cast(
                    "string"
                ),
            ),
        )
        .repartition(32)
        .localCheckpoint()
    )
    print(
        f"docs {docs.count():,}->{big_docs.count():,}  "
        f"emb {emb.count():,}->{big_emb.count():,}  "
        f"events {ev.count():,}->{big_ev.count():,}  "
        f"lineitem {li.count():,}->{big_li.count():,}"
    )
    for label, d, e, v, l, pt in (
        ("sf0.1", docs, emb, ev, li, part),
        (f"{n}x", big_docs, big_emb, big_ev, big_li, big_part),
    ):
        print(f"--- {label}")
        for name, fn in doc_ops().items():
            bench(name, fn, d)
        for name, fn in emb_ops().items():
            bench(name, fn, e)
        for name, fn in event_ops().items():
            bench(name, fn, v)
        bench("basket_pairs", basket, l)
        bench("fuzzy_match (blocked)", fuzzy, pt)


if __name__ == "__main__":
    main()
