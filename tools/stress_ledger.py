"""Ledger scale stress: the three claims sources/ledger.py makes,
measured on a grown mart.

Builds a month-partitioned orders mart from the sf0.1 table replicated Nx
(N*150k rows across ~85 month partitions) INSIDE the ledger, then times:

1. MERGE SLOPE — a fixed-size 1-month update batch applied via
   ledger_merge at 1x and Nx mart size: the claim is the merge reads and
   rewrites only the touched partition, so its cost tracks the BATCH
   (flat in mart size up to that partition's own growth), while a
   full-refresh rewrite scales with the MART;
2. SKIP SCAN — a 1-month range aggregate through ledger_scan (manifest
   zone-map pruning on o_orderdate) vs the same aggregate over the full
   snapshot with a post-hoc filter: the claim is the pruned scan touches
   1/85th of the data so its cost is ~flat in mart size;
3. COMPACTION — the same skip scan before and after ledger_compact.
   Measured design property worth stating: this ledger is COPY-ON-WRITE
   at partition grain, so merges do NOT accumulate files (each merge
   fully rewrites its touched partition into one fresh directory —
   unlike append/deletion-vector designs where every commit adds files).
   Fragmentation here comes from WRITE-TASK FAN-OUT (a partition written
   by k shuffle tasks lands k files), which is what compaction resets.

Usage: python tools/stress_ledger.py [N] (default 8).
Appends nothing; prints a markdown-ready table for SCALING.md.
"""

from __future__ import annotations

import shutil
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from weather_api_automate_etl_spark.session import get_spark
from weather_api_automate_etl_spark.sources import ledger
from weather_api_automate_etl_spark.sources.tables import load_table

SF_DIR = "/root/testdata/sf0.1"
LO, HI = "1996-03-01 00:00:00", "1996-03-31 23:59:59"


def _base(spark, n):
    orders = load_table(spark, SF_DIR, "orders")
    copies = [
        orders.withColumn(
            "o_orderkey", F.col("o_orderkey") + F.lit(i * 100_000_000)
        )
        for i in range(n)
    ]
    out = copies[0]
    for c in copies[1:]:
        out = out.unionByName(c)
    return out.select(
        "o_orderkey",
        "o_totalprice",
        "o_orderdate",
        F.date_format("o_orderdate", "yyyy-MM").alias("o_month"),
    )


def _timed(fn):
    t0 = time.monotonic()
    out = fn()
    return round(time.monotonic() - t0, 2), out


def run_scale(spark, n: int) -> dict:
    path = tempfile.mkdtemp(prefix=f"stress_ledger_{n}x_")
    shutil.rmtree(path)
    base = _base(spark, n)
    t_init, _ = _timed(
        lambda: ledger.ledger_write(
            spark, base, path, "o_month", stats_cols=["o_orderdate"]
        )
    )
    rows = base.count()
    # fixed-size batch: one month of the FIRST replica only — batch size
    # does not grow with the mart, the production shape
    batch = (
        base.filter(
            (F.col("o_month") == "1996-03")
            & (F.col("o_orderkey") < 100_000_000)
        )
        .withColumn("o_totalprice", F.col("o_totalprice") + F.lit(100.0))
    )
    t_merge, _ = _timed(lambda: ledger.ledger_merge(spark, path, batch, "o_orderkey"))

    def agg(df):
        return df.agg(
            F.count(F.lit(1)).alias("n"), F.sum("o_totalprice").alias("s")
        ).collect()

    t_skip, _ = _timed(
        lambda: agg(ledger.ledger_scan(spark, path, "o_orderdate", LO, HI))
    )
    t_full, _ = _timed(
        lambda: agg(
            ledger.ledger_read(spark, path).filter(
                F.col("o_orderdate").between(F.lit(LO), F.lit(HI))
            )
        )
    )
    # fragment ONE partition with 6 more single-month merges, then compact
    for i in range(6):
        frag = batch.withColumn(
            "o_totalprice", F.col("o_totalprice") + F.lit(float(i))
        )
        ledger.ledger_merge(spark, path, frag, "o_orderkey")
    t_skip_frag, _ = _timed(
        lambda: agg(ledger.ledger_scan(spark, path, "o_orderdate", LO, HI))
    )
    t_compact, _ = _timed(lambda: ledger.ledger_compact(spark, path))
    t_skip_compacted, _ = _timed(
        lambda: agg(ledger.ledger_scan(spark, path, "o_orderdate", LO, HI))
    )
    plan = ledger.ledger_plan(path, "o_orderdate", LO, HI)
    shutil.rmtree(path, ignore_errors=True)
    return {
        "n": n,
        "rows": rows,
        "init_s": t_init,
        "merge_s": t_merge,
        "skip_scan_s": t_skip,
        "full_scan_s": t_full,
        "skip_partitions": len(plan),
        "skip_frag_s": t_skip_frag,
        "compact_s": t_compact,
        "skip_compacted_s": t_skip_compacted,
    }


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    spark = get_spark("stress-ledger", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    print("| mart | rows | init | 1-mo merge | skip scan | full scan | "
          "skip (7-file frag) | compact | skip (compacted) |")
    print("|---|---|---|---|---|---|---|---|---|")
    for scale in (1, n):
        r = run_scale(spark, scale)
        print(
            f"| {r['n']}x | {r['rows']:,} | {r['init_s']} s | {r['merge_s']} s "
            f"| {r['skip_scan_s']} s ({r['skip_partitions']} parts) "
            f"| {r['full_scan_s']} s | {r['skip_frag_s']} s "
            f"| {r['compact_s']} s | {r['skip_compacted_s']} s |"
        )


if __name__ == "__main__":
    main()
