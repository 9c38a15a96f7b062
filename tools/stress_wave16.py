"""Scale evidence for the wave-16/17 join operators: MEASURE the claims.

Three tables for SCALING.md:

1. **Bucketed SMB join amortization** — write_bucketed pays the shuffle
   once; every subsequent join on the bucket key reads pre-partitioned,
   pre-sorted buckets with ZERO Exchange. This times N successive joins
   against the same pair of tables under (a) plain parquet (each join
   re-shuffles both sides) and (b) bucketed tables (no join shuffles),
   plus the one-time bucketed-write premium — the layout's break-even
   point in number-of-joins, measured.

2. **Geo blocking vs the naive plan** — geo_radius_join's 9x cell
   replication bounds candidates by cell density; the naive alternative
   is a cross join + haversine filter. Times both at growing right-side
   sizes (identical results asserted) until the cross join is
   indefensible — the same honest-crossover discipline as stress_bloom.

3. **BFS/SSSP frontier profile** — per-round frontier and visited sizes
   over the sf0.1 order-part graph: the evidence that per-round cost
   tracks the FRONTIER's neighborhood, not the reachable closure.

Usage: python tools/stress_wave16.py [sf_dir]  (default /root/testdata/sf0.1)
Prints markdown-ready tables.
"""

from __future__ import annotations

import shutil
import sys
import tempfile
import time
import uuid

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from weather_api_automate_etl_spark.operators import graph, joins
from weather_api_automate_etl_spark.session import get_spark


def timed(fn):
    t0 = time.monotonic()
    out = fn()
    return out, time.monotonic() - t0


def stress_bucketed(spark, sf_dir: str, n_joins: int = 5) -> None:
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    od = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey", "o_orderpriority"
    )

    def run_join(left, right):
        return (
            left.hint("merge")
            .join(right, left["l_orderkey"] == right["o_orderkey"])
            .groupBy("o_orderpriority")
            .agg(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))))
            .write.format("noop").mode("overwrite").save()
        )

    # (a) plain parquet: every join pays both shuffles
    plain_times = []
    for _ in range(n_joins):
        _, dt = timed(lambda: run_join(li, od))
        plain_times.append(dt)

    # (b) bucketed: one write premium, then shuffle-free joins
    base = tempfile.mkdtemp(prefix="stress_smb_")
    u = uuid.uuid4().hex[:8]
    ln, rn = f"st_smb_l_{u}", f"st_smb_r_{u}"
    try:
        _, t_write = timed(
            lambda: (
                joins.write_bucketed(li, "l_orderkey", 16, ln, f"{base}/l"),
                joins.write_bucketed(od, "o_orderkey", 16, rn, f"{base}/r"),
            )
        )
        bl, br = spark.table(ln), spark.table(rn)
        bucketed_times = []
        for _ in range(n_joins):
            _, dt = timed(lambda: run_join(bl, br))
            bucketed_times.append(dt)
        # plain baseline write, for an apples-to-apples premium
        _, t_plain_write = timed(
            lambda: (
                li.write.mode("overwrite").parquet(f"{base}/pl"),
                od.write.mode("overwrite").parquet(f"{base}/pr"),
            )
        )
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {ln}")
        spark.sql(f"DROP TABLE IF EXISTS {rn}")
        shutil.rmtree(base, ignore_errors=True)

    p_avg = sum(plain_times[1:]) / (n_joins - 1)
    b_avg = sum(bucketed_times[1:]) / (n_joins - 1)
    premium = t_write - t_plain_write
    print("\n### Bucketed SMB join amortization (sf =", sf_dir, ")\n")
    print("| path | write (s) | join avg of runs 2..%d (s) |" % n_joins)
    print("|---|---|---|")
    print(f"| plain parquet | {t_plain_write:.2f} | {p_avg:.2f} |")
    print(f"| bucketed (16) | {t_write:.2f} | {b_avg:.2f} |")
    if p_avg > b_avg:
        be = premium / (p_avg - b_avg)
        print(
            f"\nwrite premium {premium:.2f}s / per-join saving "
            f"{p_avg - b_avg:.2f}s -> break-even at {be:.1f} joins"
        )
    else:
        print(
            f"\nno per-join saving at this scale (saving {p_avg - b_avg:.2f}s)"
            " — the win appears when the shuffle dominates, i.e. bigger data"
        )


def stress_geo(spark, sf_dir: str) -> None:
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet").select(
        "c_custkey",
        ((F.col("c_custkey") * 37 % 9000) / 100.0 - 45.0).alias("clat"),
        ((F.col("c_custkey") * 73 % 34000) / 100.0 - 170.0).alias("clon"),
    )
    print("\n### Geo radius join: blocked vs naive cross join\n")
    print("| right rows | blocked (s) | cross join (s) | pairs |")
    print("|---|---|---|---|")
    for mult in (1, 4, 16):
        supp = (
            spark.read.parquet(f"{sf_dir}/supplier.parquet")
            .crossJoin(spark.range(mult).select(F.col("id").alias("rep")))
            .select(
                (F.col("s_suppkey") * 100 + F.col("rep")).alias("s_suppkey")
            )
            .select(
                "s_suppkey",
                ((F.col("s_suppkey") * 53 % 9000) / 100.0 - 45.0).alias("slat"),
                ((F.col("s_suppkey") * 97 % 34000) / 100.0 - 170.0).alias(
                    "slon"
                ),
            )
        )
        n_r = supp.count()
        blocked, t_b = timed(
            lambda: joins.geo_radius_join(
                cust, supp, 100.0, 1.5,
                lat_l="clat", lon_l="clon", lat_r="slat", lon_r="slon",
            ).count()
        )
        naive, t_n = timed(
            lambda: cust.crossJoin(supp)
            .withColumn(
                "d",
                joins.haversine_km(
                    F.col("clat"), F.col("clon"),
                    F.col("slat"), F.col("slon"),
                ),
            )
            .filter(F.col("d") < 100.0)
            .count()
        )
        assert blocked == naive, (blocked, naive)
        print(f"| {n_r} | {t_b:.2f} | {t_n:.2f} | {blocked} |")


def stress_frontier(spark, sf_dir: str) -> None:
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    edges = li.select(
        (2 * F.col("l_orderkey")).alias("src"),
        (2 * F.col("l_partkey") + 1).alias("dst"),
    )
    sources = (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .filter(F.col("o_orderkey") % 32 == 0)
        .select((2 * F.col("o_orderkey")).alias("node"))
    )
    print("\n### BFS frontier profile (order-part graph)\n")
    print("| hop | frontier nodes | cumulative visited |")
    print("|---|---|---|")
    dist = graph.bfs_distances(edges, sources, max_hops=4)
    prof = (
        dist.groupBy("hops").agg(F.count(F.lit(1)).alias("n"))
        .orderBy("hops").collect()
    )
    cum = 0
    for r in prof:
        cum += r["n"]
        print(f"| {r['hops']} | {r['n']} | {cum} |")


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("stress-wave16")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()  # warm
    stress_bucketed(spark, sf_dir)
    stress_geo(spark, sf_dir)
    stress_frontier(spark, sf_dir)


if __name__ == "__main__":
    main()
