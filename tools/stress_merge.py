"""Partition-pruned MERGE stress: the touched-partition-only IO claim
measured.

Builds a date-partitioned orders mart from the sf0.1 table replicated Nx
(N*150k rows across ~85 month partitions), then times (a) a 1-month
update batch applied via merge_into_partitioned — which must read and
rewrite ONLY that month — against (b) the reference's full-refresh shape
(rewrite every partition with the merged frame). The ratio is the
SCALING.md evidence that key-upsert beats rebuild as the mart grows:
full-refresh cost scales with the MART, merge cost with the BATCH.
Usage: python tools/stress_merge.py [N] (default 20).
"""

from __future__ import annotations

import shutil
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from weather_api_automate_etl_spark.operators import cdc
from weather_api_automate_etl_spark.session import get_spark
from weather_api_automate_etl_spark.sources.tables import load_table

SF_DIR = "/root/testdata/sf0.1"


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    spark = get_spark("stress-merge", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    orders = load_table(spark, SF_DIR, "orders")
    copies = [
        orders.withColumn("o_orderkey", F.col("o_orderkey") + F.lit(i * 100_000_000))
        for i in range(n)
    ]
    big = copies[0]
    for c in copies[1:]:
        big = big.unionByName(c)
    big = big.select(
        "o_orderkey", "o_totalprice", "o_orderdate",
        F.date_format("o_orderdate", "yyyy-MM").alias("month"),
    )
    base = tempfile.mkdtemp(prefix="stress_merge_")
    try:
        t0 = time.time()
        big.write.partitionBy("month").parquet(f"{base}/mart")
        n_rows = spark.read.parquet(f"{base}/mart").count()
        n_parts = (
            spark.read.parquet(f"{base}/mart").select("month").distinct().count()
        )
        print(f"mart: {n_rows} rows, {n_parts} month partitions "
              f"(built in {time.time()-t0:.1f}s)")

        target = "1995-06"
        updates = (
            spark.read.parquet(f"{base}/mart")
            .filter(F.col("month") == target)
            .select(
                "o_orderkey",
                (F.col("o_totalprice") + F.lit(100.0)).alias("o_totalprice"),
                "o_orderdate",
                "month",
            )
        ).localCheckpoint(eager=True)
        n_upd = updates.count()

        t0 = time.time()
        touched = cdc.merge_into_partitioned(
            spark, f"{base}/mart", updates, "o_orderkey", "month"
        )
        t_merge = time.time() - t0
        print(f"merge_into_partitioned: batch={n_upd} rows, touched={touched}, "
              f"{t_merge:.2f}s")

        # full-refresh shape: resolve the merge logically, rewrite EVERYTHING
        t0 = time.time()
        merged_all = cdc.merge_into(
            spark.read.parquet(f"{base}/mart"), updates, "o_orderkey"
        )
        merged_all.write.mode("overwrite").partitionBy("month").parquet(
            f"{base}/mart_full"
        )
        t_full = time.time() - t0
        print(f"full refresh:          same batch, all {n_parts} partitions, "
              f"{t_full:.2f}s")
        print(f"speedup: {t_full / t_merge:.1f}x (merge cost ~ batch, "
              f"refresh cost ~ mart)")
    finally:
        shutil.rmtree(base, ignore_errors=True)


if __name__ == "__main__":
    main()
