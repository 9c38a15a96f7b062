"""Micro-benchmark of the ledger write path: Spark JOB COUNT and wall
time per op (write / merge / delete / zorder), at the given sf.

Job count is the observable for the round-12 optimization (metadata
passes re-executed the input DAG; they now read back the written files):
fewer jobs executing the expensive input DAG, same committed bytes.
Usage: python tools/ledger_microbench.py [sf_dir]
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from weather_api_automate_etl_spark.session import get_spark  # noqa: E402
from weather_api_automate_etl_spark.sources import ledger  # noqa: E402
from weather_api_automate_etl_spark.sources.tables import load_table  # noqa: E402

from pyspark.sql import functions as F  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("ledger-microbench")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    st = spark.sparkContext.statusTracker()

    orders = load_table(spark, sf_dir, "orders")
    base = orders.select(
        "o_orderkey",
        "o_totalprice",
        F.date_format("o_orderdate", "yyyy").alias("o_year"),
    )
    updates = base.filter(F.col("o_orderkey") % 10 == 3).select(
        "o_orderkey",
        (F.col("o_totalprice") + F.lit(100.0)).alias("o_totalprice"),
        "o_year",
    )
    doomed = base.filter(F.col("o_orderkey") % 7 == 0).select("o_orderkey")

    path = tempfile.mkdtemp(prefix="ledger_ubench_")

    def run(tag, fn):
        ids0 = set(st.getJobIdsForGroup())
        t0 = time.monotonic()
        fn()
        dt = time.monotonic() - t0
        ids1 = set(st.getJobIdsForGroup())
        print(f"{tag}: {dt:.2f}s, {len(ids1 - ids0)} jobs", flush=True)

    try:
        run("write(plain)", lambda: ledger.ledger_write(spark, base, path, "o_year"))
        run(
            "write(stats+bloom)",
            lambda: ledger.ledger_write(
                spark, base, os.path.join(path, "sb"), "o_year",
                stats_cols=["o_orderkey", "o_totalprice"],
                key_index_col="o_orderkey",
            ),
        )
        run("merge", lambda: ledger.ledger_merge(spark, path, updates, "o_orderkey"))
        run("delete", lambda: ledger.ledger_delete(spark, path, doomed, "o_orderkey"))
    finally:
        shutil.rmtree(path, ignore_errors=True)


if __name__ == "__main__":
    main()
