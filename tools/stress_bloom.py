"""Bloom-prune vs broadcast-semi crossover: MEASURE the regime claim.

operators/joins.py::bloom_prune_join exists for key sets too large to
broadcast exactly: its bitmap is O(bits) regardless of key count, while a
broadcast semi join ships the whole key set to every task and builds a
per-task hash table. Locally (sf0.1, small key sets) the broadcast path
wins — the round-7 verdict flagged that the crossover was ARGUED, not
measured. This tool grows the build-side key set 10^3 → 10^7 against a
fixed fact table and times three exact-identical-result strategies:

1. broadcast semi — facts ⋉ broadcast(keys) (Spark AUTO chooses this
   under the 10 MB threshold; we force it with a hint to hold the
   strategy fixed as keys grow);
2. shuffle semi  — facts ⋉ keys with broadcast disabled (what Spark
   falls back to once the build side exceeds the threshold: BOTH sides
   shuffle on the key);
3. bloom+semi    — bloom_prune_join: metadata-sized bitmap probe inside
   whole-stage codegen, then the exact semi join over the survivors.

The honest reading of the numbers: the bloom path's win is against the
SHUFFLE semi (it prunes the fact-side shuffle to the survivor set), and
against broadcast once the key set is big enough that shipping and
hashing it per-task dominates — or can't be broadcast at all. The
match-rate knob matters: the fewer facts survive, the more the fact-side
shuffle shrinks.

Usage: python tools/stress_bloom.py [facts_millions] (default 20).
Prints a markdown-ready table for SCALING.md.
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from weather_api_automate_etl_spark.operators.joins import bloom_prune_join
from weather_api_automate_etl_spark.session import get_spark


def _time(fn, reps: int = 3) -> float:
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def main() -> None:
    facts_m = float(sys.argv[1]) if len(sys.argv) > 1 else 20.0
    spark = get_spark()
    n_facts = int(facts_m * 1_000_000)
    # synthetic facts: key space 4x the largest key set so match rate
    # stays ~25% at every size; persisted so every strategy scans the
    # same in-memory input (isolates join cost from parquet I/O)
    facts = (
        spark.range(n_facts)
        .select(
            (F.xxhash64("id") % 40_000_000).alias("k"),
            (F.col("id") % 97).alias("v"),
        )
        .persist()
    )
    facts.count()
    print(f"facts: {n_facts:,} rows, key space 40M\n", flush=True)
    print(
        "| keys | broadcast semi (s) | shuffle semi (s) | bloom+semi (s) "
        "| bloom build (s) | bloom bits |"
    )
    print(
        "|------|--------------------|------------------|----------------"
        "|-----------------|------------|",
        flush=True,
    )
    for n_keys in (1_000, 10_000, 100_000, 1_000_000, 10_000_000):
        keys = (
            spark.range(n_keys)
            .select((F.xxhash64("id", F.lit(7)) % 40_000_000).alias("k"))
            .persist()
        )
        keys.count()
        # size the bitmap for ~1% fp at this key count, 64-bit aligned,
        # clamped to the operator's measured 2^24 probe cap — past it the
        # fp rate degrades toward 1 and the filter prunes nothing, which
        # is exactly the "beyond its regime" row the table should show
        bits = min(1 << 24, max(1 << 16, 1 << (n_keys * 10).bit_length()))

        def broadcast_semi():
            facts.join(F.broadcast(keys), "k", "left_semi").agg(
                F.count(F.lit(1)), F.sum("v")
            ).collect()

        def shuffle_semi():
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
            try:
                facts.join(keys.hint("shuffle_hash"), "k", "left_semi").agg(
                    F.count(F.lit(1)), F.sum("v")
                ).collect()
            finally:
                spark.conf.set(
                    "spark.sql.autoBroadcastJoinThreshold", str(10 * 1024 * 1024)
                )

        def bloom_semi():
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
            try:
                bloom_prune_join(facts, keys, "k", num_bits=bits).agg(
                    F.count(F.lit(1)), F.sum("v")
                ).collect()
            finally:
                spark.conf.set(
                    "spark.sql.autoBroadcastJoinThreshold", str(10 * 1024 * 1024)
                )

        from weather_api_automate_etl_spark.operators.joins import (
            bloom_filter_build,
        )

        tb = _time(broadcast_semi)
        ts = _time(shuffle_semi)
        tf = _time(bloom_semi)
        tbuild = _time(lambda: bloom_filter_build(keys, "k", num_bits=bits))
        print(
            f"| {n_keys:,} | {tb:.2f} | {ts:.2f} | {tf:.2f} | {tbuild:.2f} "
            f"| 2^{bits.bit_length() - 1} |",
            flush=True,
        )
        keys.unpersist()
    facts.unpersist()


if __name__ == "__main__":
    main()
