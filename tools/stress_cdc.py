"""20x replication stress for the CDC family (scd2_apply, snapshot_diff).

Builds a type-2 dimension from the sf0.1 customer table (plus a closed
history row per key so the history-passthrough path carries real weight),
then an update batch with UNEVEN change density — update probability
ramps by key slice from ~5% to ~95%, plus 10% hard deletes and 10% new
keys — and times one SCD2 merge and one snapshot diff at 1x and Nx key
space. Evidences the "current-slice-only join" claim in SCALING.md: cost
should scale with the CURRENT slice, and history rows ride along as a
union, not a join side. Usage: python tools/stress_cdc.py [N].
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import DataFrame, functions as F

from weather_api_automate_etl_spark.operators import cdc
from weather_api_automate_etl_spark.session import get_spark
from weather_api_automate_etl_spark.sources.tables import load_table

SF_DIR = "/root/testdata/sf0.1"
COMPARE = ["c_name", "c_mktsegment", "c_acctbal"]


def replicate(df: DataFrame, n: int) -> DataFrame:
    copies = [
        df.withColumn("c_custkey", F.col("c_custkey") + F.lit(i * 100_000_000))
        for i in range(n)
    ]
    out = copies[0]
    for c in copies[1:]:
        out = out.unionByName(c)
    return out


def build_dim(cust: DataFrame) -> DataFrame:
    """Current row per key + one closed history row per key (so history
    outweighs nothing artificially but the passthrough branch is real)."""
    current = cust.select(
        "c_custkey", *COMPARE,
        F.lit("2024-01-01 00:00:00").cast("timestamp_ntz").alias("valid_from"),
        F.lit(None).cast("timestamp_ntz").alias("valid_to"),
    )
    history = cust.select(
        "c_custkey",
        F.concat(F.col("c_name"), F.lit(" (v0)")).alias("c_name"),
        *COMPARE[1:],
        F.lit("2023-01-01 00:00:00").cast("timestamp_ntz").alias("valid_from"),
        F.lit("2024-01-01 00:00:00").cast("timestamp_ntz").alias("valid_to"),
    )
    return current.unionByName(history)


def build_updates(cust: DataFrame) -> DataFrame:
    """Skewed change density: slice s = key%10 updates with probability
    (s+0.5)/10 (5%..95%); 10% of keys vanish (hard delete); 10% new keys."""
    from weather_api_automate_etl_spark.operators.sampling import hash_fraction

    slice_p = ((F.col("c_custkey") % 10) + F.lit(0.5)) / F.lit(10.0)
    u = hash_fraction(F.col("c_custkey"))
    surviving = cust.filter(F.col("c_custkey") % 10 != 3)  # ~10% deleted
    changed = F.when(
        u < slice_p, F.round(F.col("c_acctbal") + 17.5, 2)
    ).otherwise(F.col("c_acctbal"))
    upd = surviving.select(
        "c_custkey", "c_name", "c_mktsegment", changed.alias("c_acctbal")
    )
    new_keys = cust.filter(F.col("c_custkey") % 10 == 7).select(
        (F.col("c_custkey") + F.lit(7_000_000_000)).alias("c_custkey"),
        "c_name", "c_mktsegment", "c_acctbal",
    )
    return upd.unionByName(new_keys)


def bench(name: str, fn) -> float:
    best = float("inf")
    for _ in range(2):
        t0 = time.monotonic()
        fn().write.format("noop").mode("overwrite").save()
        best = min(best, time.monotonic() - t0)
    print(f"{name:28s} {best:7.2f} s")
    return best


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    spark = get_spark("stress-cdc")
    spark.sparkContext.setLogLevel("ERROR")
    cust = load_table(spark, SF_DIR, "customer")
    big = replicate(cust, n).repartition(32).localCheckpoint()
    for label, c in (("sf0.1", cust), (f"{n}x", big)):
        dim = build_dim(c).localCheckpoint()
        upd = build_updates(c).localCheckpoint()
        print(f"--- {label}: dim={dim.count():,} rows (half history), "
              f"updates={upd.count():,}")
        bench("scd2_apply", lambda: cdc.scd2_apply(
            dim, upd, "c_custkey", COMPARE, "2024-06-01 00:00:00"))
        bench("snapshot_diff", lambda: cdc.snapshot_diff(
            dim.filter(F.col("valid_to").isNull()).select("c_custkey", *COMPARE),
            upd, "c_custkey", COMPARE))


if __name__ == "__main__":
    main()
