"""Governance-feature overhead: what the round-8 table-management ops
actually cost at sf0.1.

1. CONSTRAINT GATE — the same 1-month merge with zero / two / four
   declared CHECK constraints: the claim is the gate costs one
   conditional-count aggregate over the WRITE BATCH (map-side combined),
   so overhead is a batch scan, flat in constraint count beyond it and
   independent of mart size;
2. SHALLOW CLONE — clone wall time at 1x and 8x mart size: the claim is
   O(partitions) driver JSON, so growth in DATA moves it not at all;
3. DESCRIBE HISTORY — the manifest walk after a 12-commit biography:
   driver JSON, milliseconds.

Usage: python tools/stress_governance.py [N] (default 8).
Prints a markdown-ready table for SCALING.md.
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


def _base(spark, n):
    orders = load_table(spark, SF_DIR, "orders")
    copies = [
        orders.withColumn(
            "o_orderkey", F.col("o_orderkey") + F.lit(i * 10_000_000)
        )
        for i in range(n)
    ]
    out = copies[0]
    for c in copies[1:]:
        out = out.unionByName(c)
    return out.select(
        "o_orderkey",
        "o_totalprice",
        F.date_format("o_orderdate", "yyyy").alias("o_year"),
    )


def _merge_time(spark, base, checks):
    # best of 2 fresh-table runs: the first merge in a cold JVM pays
    # codegen/warm-up that would otherwise masquerade as gate cost
    best = float("inf")
    for _ in range(2):
        path = tempfile.mkdtemp(prefix="gov_")
        try:
            ledger.ledger_write(spark, base, path, "o_year", checks=checks)
            upd = base.filter(F.col("o_orderkey") % 10 == 3).select(
                "o_orderkey",
                (F.col("o_totalprice") + F.lit(100.0)).alias("o_totalprice"),
                "o_year",
            ).localCheckpoint(eager=True)
            t0 = time.monotonic()
            ledger.ledger_merge(spark, path, upd, "o_orderkey")
            best = min(best, time.monotonic() - t0)
        finally:
            shutil.rmtree(path, ignore_errors=True)
    return best


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    spark = get_spark("stress-governance")
    spark.sparkContext.setLogLevel("ERROR")
    base1 = _base(spark, 1).localCheckpoint(eager=True)

    two = {"price_pos": "o_totalprice > 0", "year_known": "o_year IS NOT NULL"}
    four = {
        **two,
        "key_nonneg": "o_orderkey >= 0",
        "price_sane": "o_totalprice < 1e9",
    }
    t0 = _merge_time(spark, base1, None)
    t2 = _merge_time(spark, base1, two)
    t4 = _merge_time(spark, base1, four)

    # clone cost at 1x and Nx
    times = {}
    for label, frame in (("1x", base1), (f"{n}x", _base(spark, n))):
        src = tempfile.mkdtemp(prefix="gov_src_")
        dst = tempfile.mkdtemp(prefix="gov_dst_")
        shutil.rmtree(dst)
        try:
            ledger.ledger_write(spark, frame, src, "o_year")
            t0c = time.monotonic()
            ledger.ledger_clone(src, dst)
            times[label] = time.monotonic() - t0c
        finally:
            shutil.rmtree(src, ignore_errors=True)
            shutil.rmtree(dst, ignore_errors=True)

    # history walk after a 12-commit biography
    path = tempfile.mkdtemp(prefix="gov_hist_")
    try:
        ledger.ledger_write(spark, base1, path, "o_year")
        for i in range(11):
            upd = base1.filter(
                F.col("o_orderkey") % 50 == i
            ).select(
                "o_orderkey",
                (F.col("o_totalprice") + F.lit(float(i))).alias(
                    "o_totalprice"
                ),
                "o_year",
            )
            ledger.ledger_merge(spark, path, upd, "o_orderkey")
        ledger.ledger_history(spark, path).count()  # session warm-up
        t0h = time.monotonic()
        nrows = ledger.ledger_history(spark, path).count()
        t_hist = time.monotonic() - t0h
        assert nrows == 12
    finally:
        shutil.rmtree(path, ignore_errors=True)

    print("\n| measurement | value |")
    print("|---|---|")
    print(f"| 1-mo merge, 0 checks | {t0:.2f} s |")
    print(f"| 1-mo merge, 2 checks | {t2:.2f} s |")
    print(f"| 1-mo merge, 4 checks | {t4:.2f} s |")
    print(f"| shallow clone, 1x mart (150k rows) | {times['1x']*1000:.1f} ms |")
    print(f"| shallow clone, {n}x mart ({n*150}k rows) | {times[f'{n}x']*1000:.1f} ms |")
    print(f"| DESCRIBE HISTORY, 12 commits | {t_hist*1000:.1f} ms |")


if __name__ == "__main__":
    main()
