"""20x replication stress for the round-9 evaluation/matching family.

Replication recipes per hard axis:
- events: shifted event_id/user_id copies (stress_timeseries recipe) —
  20x rows through the scan-dominated single-aggregate ops (roc_auc,
  pr_sweep, cuped, mcnemar) where cost must stay ~linear; 20x USERS for
  the user-partitioned windows (interval_coalesce, conformal,
  caliper_match's date blocks grow in occupancy, not count).
- documents: per-copy salt-token copies (stress_corpus recipe) — near-dup
  structure preserved within a copy, so lsh_recall_audit's truth and
  candidate sides both grow ~20x in PAIRS while staying bounded per
  bucket; good_turing's vocabulary grows with the salt tokens.
- embeddings: shifted-id copies — jl_project is map-only (must be
  ~linear); embedding_drift's shuffle stays <= 2*d rows per partition
  regardless of input size.

Usage: python tools/stress_eval.py [N]. Results recorded in SCALING.md;
re-run after touching any operator named below.
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from tools.stress_corpus import SF_DIR, bench, replicate_docs, replicate_embeddings
from tools.stress_timeseries import replicate as replicate_events
from weather_api_automate_etl_spark.operators import (
    dedup,
    embeddings as emb_ops,
    sampling,
    stats,
    textops,
    timeseries,
    windows,
)
from weather_api_automate_etl_spark.session import get_spark
from weather_api_automate_etl_spark.sources.tables import load_table

def event_ops() -> dict:
    # Column exprs are built lazily (inside this call) — classic-mode
    # pyspark requires an active SparkContext to construct Columns.
    SCORE = F.floor(F.col("value") * 10) / 10
    IS_PURCHASE = F.col("event_type") == "purchase"
    start = F.unix_micros(F.col("ts").cast("timestamp"))
    dur = F.floor(F.col("value") * 60).cast("long") * F.lit(1_000_000)
    return {
        "roc_auc": lambda ev: stats.roc_auc(ev, SCORE, IS_PURCHASE),
        "pr_sweep (9 thr)": lambda ev: stats.pr_threshold_sweep(
            ev, SCORE, IS_PURCHASE, tuple(float(v) for v in range(50, 451, 50))
        ),
        "kruskal_wallis": lambda ev: stats.kruskal_wallis(
            ev.select(SCORE.alias("s"), "event_type"), "s", "event_type"
        ),
        "interval_coalesce": lambda ev: windows.coalesce_intervals(
            ev, "user_id", start, start + dur
        ),
        "conformal": lambda ev: stats.conformal_calibration(
            ev, "event_type", "value", F.col("event_id") % 2 == 0
        ),
        "caliper_match": lambda ev: sampling.caliper_match(
            ev.filter(F.col("event_type").isin("purchase", "view")),
            F.to_date(F.col("ts").cast("timestamp")),
            F.col("value"),
            IS_PURCHASE,
            "event_id",
            caliper=2.0,
        ),
        "cuped": lambda ev: stats.cuped_adjusted_lift(
            ev,
            "user_id",
            F.floor(F.col("value")),
            F.floor(F.col("value")),
            F.col("ts").cast("timestamp")
            >= F.to_timestamp(F.lit("2024-01-16")),
        ),
        "cross_correlation": lambda ev: timeseries.cross_correlation(
            ev,
            "ts",
            F.when(IS_PURCHASE, 1).otherwise(0),
            F.when(F.col("event_type") == "click", 1).otherwise(0),
        ),
    }


def doc_ops() -> dict:
    return {
        "lsh_recall_audit": lambda d: dedup.lsh_recall_audit(
            d, "doc_id", "text", threshold=0.5
        ),
        "good_turing (k=3)": lambda d: textops.good_turing_counts(
            d, "text", max_r=10, shingle_k=3
        ),
    }


def emb_ops_map() -> dict:
    signs = emb_ops.jl_sign_matrix(16, 64)
    return {
        "jl_project (64->16)": lambda e: emb_ops.jl_project(
            e, "vec_id", "embedding", signs
        ),
        "embedding_drift": lambda e: emb_ops.embedding_drift(
            e, "embedding", F.col("vec_id") % 2 == 1
        ),
    }


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    spark = get_spark("stress-eval")
    spark.sparkContext.setLogLevel("ERROR")
    ev = load_table(spark, SF_DIR, "events")
    docs = load_table(spark, SF_DIR, "documents")
    emb = load_table(spark, SF_DIR, "embeddings")
    ev_n = replicate_events(ev, n).localCheckpoint(eager=True)
    docs_n = replicate_docs(docs, n).localCheckpoint(eager=True)
    emb_n = replicate_embeddings(emb, n).localCheckpoint(eager=True)

    print(f"== 1x -> {n}x ==")
    for name, fn in event_ops().items():
        t1 = bench(f"{name} 1x", fn, ev)
        tn = bench(f"{name} {n}x", fn, ev_n)
        print(f"{name:24s} ratio {tn / t1:6.1f}x")
    for name, fn in doc_ops().items():
        t1 = bench(f"{name} 1x", fn, docs)
        tn = bench(f"{name} {n}x", fn, docs_n)
        print(f"{name:24s} ratio {tn / t1:6.1f}x")
    for name, fn in emb_ops_map().items():
        t1 = bench(f"{name} 1x", fn, emb)
        tn = bench(f"{name} {n}x", fn, emb_n)
        print(f"{name:24s} ratio {tn / t1:6.1f}x")


if __name__ == "__main__":
    main()
