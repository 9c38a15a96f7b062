"""Optimistic-concurrency stress: measure what the rebase commit costs
and prove N uncoordinated writers land without a lock.

Builds a year-partitioned orders mart (sf0.1) inside the ledger, then:

1. SEQUENTIAL BASELINE — N disjoint-partition update batches applied one
   after another (no contention, every commit wins its CAS first try);
2. CONCURRENT WRITERS — the same N batches from N real threads released
   by a barrier: CAS losers rebase (sources/ledger.py::
   _commit_with_rebase) and retry; the claim is (a) ALL N commits land,
   (b) the final state equals the sequential run's, and (c) the rebase
   adds only O(partitions) driver JSON work per retry — wall time stays
   in the same band as sequential (the data writes dominate; the
   conflict loop costs manifest arithmetic, not I/O);
3. REBASE MICRO-COST — forced CAS losses via direct _commit races,
   timing just the conflict-inspect + manifest-replay + retry path.

Usage: python tools/stress_occ.py [N] (default 4).
Prints a markdown-ready table for SCALING.md.
"""

from __future__ import annotations

import shutil
import sys
import tempfile
import threading
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from weather_api_automate_etl_spark.session import get_spark
from weather_api_automate_etl_spark.sources import ledger
from weather_api_automate_etl_spark.sources.tables import load_table

SF_DIR = "/root/testdata/sf0.1"


def _base(spark):
    return load_table(spark, SF_DIR, "orders").select(
        "o_orderkey",
        "o_totalprice",
        F.date_format("o_orderdate", "yyyy").alias("o_year"),
    )


def _batches(base, n):
    years = sorted(
        r["o_year"]
        for r in base.select("o_year").distinct().collect()
    )
    assert len(years) >= n, f"need {n} disjoint partitions, have {len(years)}"
    return [
        base.filter(
            (F.col("o_year") == y) & (F.col("o_orderkey") % 10 == 3)
        ).select(
            "o_orderkey",
            (F.col("o_totalprice") + F.lit(100.0)).alias("o_totalprice"),
            "o_year",
        )
        for y in years[:n]
    ]


def _snapshot_sum(spark, path):
    return (
        ledger.ledger_read(spark, path)
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("o_totalprice"), 2).alias("s"),
        )
        .collect()[0]
    )


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    spark = get_spark("stress-occ")
    spark.sparkContext.setLogLevel("ERROR")
    base = _base(spark).localCheckpoint(eager=True)
    batches = [b.localCheckpoint(eager=True) for b in _batches(base, n)]

    # 1. sequential baseline
    seq_path = tempfile.mkdtemp(prefix="occ_seq_")
    try:
        ledger.ledger_write(spark, base, seq_path, "o_year")
        t0 = time.monotonic()
        for b in batches:
            ledger.ledger_merge(spark, seq_path, b, "o_orderkey")
        t_seq = time.monotonic() - t0
        want = _snapshot_sum(spark, seq_path)
        v_seq = ledger._manifest_versions(seq_path)[-1]
    finally:
        shutil.rmtree(seq_path, ignore_errors=True)

    # 2. concurrent writers, real threads + barrier
    conc_path = tempfile.mkdtemp(prefix="occ_conc_")
    try:
        ledger.ledger_write(spark, base, conc_path, "o_year")
        barrier = threading.Barrier(n)
        errors: list[BaseException] = []

        def writer(b):
            try:
                barrier.wait(timeout=120)
                ledger.ledger_merge(spark, conc_path, b, "o_orderkey")
            except BaseException as e:
                errors.append(e)

        threads = [
            threading.Thread(target=writer, args=(b,), daemon=True)
            for b in batches
        ]
        t0 = time.monotonic()
        for th in threads:
            th.start()
        for th in threads:
            th.join(timeout=600)
        t_conc = time.monotonic() - t0
        if errors:
            raise errors[0]
        got = _snapshot_sum(spark, conc_path)
        v_conc = ledger._manifest_versions(conc_path)[-1]
        assert v_conc == v_seq == n + 1, (v_conc, v_seq)
        assert (got["n"], got["s"]) == (want["n"], want["s"]), (got, want)
    finally:
        shutil.rmtree(conc_path, ignore_errors=True)

    # 3. rebase micro-cost: force a CAS loss per commit and time ONLY the
    # conflict-inspect + replay + retry path (no Spark work inside)
    micro_path = tempfile.mkdtemp(prefix="occ_micro_")
    try:
        ledger.ledger_write(spark, base, micro_path, "o_year")
        v = ledger._manifest_versions(micro_path)[-1]
        m = ledger._read_manifest(micro_path, v)
        # competitor takes v+1 touching a partition we do NOT touch
        competitor = {**m, "partitions": {**m["partitions"]}}
        first_pv = sorted(m["partitions"])[0]
        competitor["partitions"][first_pv] = {
            **m["partitions"][first_pv],
            "rows": m["partitions"][first_pv]["rows"],
            "dir": "data-competitor",
        }
        ledger._commit(micro_path, competitor, v + 1)
        ours = {**m, "partitions": {**m["partitions"]}}
        touched = sorted(m["partitions"])[-1]
        t0 = time.monotonic()
        got_v = ledger._commit_with_rebase(
            micro_path, v, m, ours, {touched}
        )
        t_micro = time.monotonic() - t0
        assert got_v == v + 2
    finally:
        shutil.rmtree(micro_path, ignore_errors=True)

    print(f"\n| writers | sequential | concurrent (barrier) | rebase-only |")
    print(f"|---|---|---|---|")
    print(
        f"| {n} disjoint-partition merges | {t_seq:.2f} s "
        f"| {t_conc:.2f} s | {t_micro*1000:.1f} ms |"
    )
    print(
        f"\nfinal state identical (n={want['n']}, sum={want['s']}), "
        f"versions sequential={v_seq} concurrent={v_conc}"
    )


if __name__ == "__main__":
    main()
