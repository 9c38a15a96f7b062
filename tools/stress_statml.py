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
    embeddings as emb_ops_mod,
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
    # registry callables take (spark, sf_dir) and can't see the stressed
    # frame; both queries are thin wrappers, so re-express them directly

    def mad(ev):
        med = ev.groupBy("event_type").agg(
            F.expr("percentile(value, 0.5)").alias("med")
        )
        mad_t = (
            ev.join(F.broadcast(med), "event_type")
            .groupBy("event_type", "med")
            .agg(F.expr("percentile(abs(value - med), 0.5)").alias("mad"))
        )
        z = (
            F.lit(0.6745)
            * (F.col("value") - F.col("med"))
            / F.when(F.col("mad") != 0, F.col("mad"))
        )
        return ev.join(F.broadcast(mad_t), "event_type").select(
            "event_id", (F.abs(z) > 3.5).alias("is_outlier")
        )

    def autocorr(ev):
        from pyspark.sql import Window

        w = Window.partitionBy("user_id").orderBy(F.col("ts"), F.col("event_id"))
        p = ev.select(
            "user_id",
            F.col("value").alias("x"),
            F.lag("value").over(w).alias("xp"),
        ).filter(F.col("xp").isNotNull())
        m = p.groupBy("user_id").agg(
            F.count(F.lit(1)).cast("double").alias("n"),
            F.sum("x").alias("sx"),
            F.sum("xp").alias("sy"),
            F.sum(F.col("x") * F.col("xp")).alias("sxy"),
            F.sum(F.col("x") * F.col("x")).alias("sxx"),
            F.sum(F.col("xp") * F.col("xp")).alias("syy"),
        )
        n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
        den = F.sqrt(
            (n * F.col("sxx") - sx * sx) * (n * F.col("syy") - sy * sy)
        )
        return m.select(
            "user_id",
            ((n * F.col("sxy") - sx * sy) / F.when(den != 0, den)).alias("r"),
        )

    return {"mad_outliers": mad, "autocorr_lag1": autocorr}


def fuzzy(part: DataFrame) -> DataFrame:
    a = part.select(
        F.col("p_partkey").alias("p1"), "p_brand",
        F.col("p_name").alias("name_a"),
    )
    b = part.select(
        F.col("p_partkey").alias("p2"), "p_brand",
        F.col("p_name").alias("name_b"),
    )
    dist = F.levenshtein("name_a", "name_b")
    return (
        a.join(b, "p_brand")
        .filter(F.col("p1") < F.col("p2"))
        .filter(dist <= 2)
        .select("p1", "p2", dist.alias("d"))
    )


def basket(li: DataFrame) -> DataFrame:
    b = li.select("l_orderkey", "l_partkey").distinct()
    n = b.agg(F.countDistinct("l_orderkey").cast("double").alias("n_orders"))
    m = b.groupBy("l_partkey").agg(F.count(F.lit(1)).alias("c"))
    a2 = b.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("p2"))
    p = (
        b.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("p1"))
        .join(a2, "ok")
        .filter(F.col("p1") < F.col("p2"))
        .groupBy("p1", "p2")
        .agg(F.count(F.lit(1)).alias("c_ab"))
        .filter(F.col("c_ab") >= 2)
    )
    return (
        p.join(m.select(F.col("l_partkey").alias("p1"), F.col("c").alias("c1")), "p1")
        .join(m.select(F.col("l_partkey").alias("p2"), F.col("c").alias("c2")), "p2")
        .crossJoin(F.broadcast(n))
        .select(
            "p1", "p2", "c_ab",
            (F.col("n_orders") * F.col("c_ab")
             / (F.col("c1").cast("double") * F.col("c2"))).alias("lift"),
        )
    )


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
