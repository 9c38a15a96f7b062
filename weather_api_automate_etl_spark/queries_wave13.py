"""Round-8 thirteenth-wave queries (ROUND9_PENDING): file-granular ledger
skipping plus the round-8 operator additions.

- ``q_ledger_skip_files``: data skipping at the Delta/Iceberg FILE grain —
  the manifest now records per-file min/max inside each partition entry
  (sources/ledger.py::_per_file_stats), so a narrow range predicate reads
  a strict subset of a kept partition's files. Oracle = the same unpruned
  declarative filter discipline as q_ledger_skip; the file-count strictness
  is asserted in-query and pinned in tests/test_ledger.py.

Same registry/oracle conventions as every wave: identical aliases on both
engines, round(6)/round(2) on aggregation-order-sensitive doubles,
explicit casts where DuckDB widens.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from weather_api_automate_etl_spark.queries import query, t

# ---------------------------------------------------------------------------
# file-granular zone-map skipping
# ---------------------------------------------------------------------------


@query(
    "q_ledger_skip_files",
    oracle="""
    SELECT strftime(o_orderdate, '%Y-%m') AS o_month,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           ROUND(SUM(o_totalprice), 2) AS sum_price
    FROM orders
    WHERE o_orderdate BETWEEN TIMESTAMP '1996-04-01 00:00:00'
                          AND TIMESTAMP '1996-05-31 23:59:59'
    GROUP BY o_month
    """,
    tags=("cdc", "ledger", "layout"),
)
def q_ledger_skip_files(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FILE-granular data skipping through the ledger (sources/ledger.py::
    ledger_plan_files) — the Delta/Iceberg skip grain q_ledger_skip's
    partition-level zone maps cannot reach: the year-partitioned orders
    mart is written range-partitioned by (year, date), so each year
    directory holds several files covering DISJOINT date bands, and the
    manifest records each file's min/max o_orderdate. A two-month
    predicate then (a) prunes every non-1996 partition from the
    partition-level stats, and (b) prunes 1996's own files down to the
    band(s) that can intersect — pure driver-side JSON arithmetic either
    way; the in-query assert pins that strictly fewer files than the kept
    partitions own are read. The oracle is the unpruned declarative
    filter, so over-pruning (dropping a matching file) breaks the hash.
    At 100 TB this is the difference between touching 1 file and 200
    inside a hot daily partition that merges have fragmented."""
    import shutil
    import tempfile

    from weather_api_automate_etl_spark.sources import ledger

    orders = t(spark, sf_dir, "orders")
    base = orders.select(
        "o_orderkey",
        "o_totalprice",
        "o_orderdate",
        F.date_format("o_orderdate", "yyyy").alias("o_year"),
    )
    path = tempfile.mkdtemp(prefix="ledger_skip_files_")
    try:
        # range-partition by (year, date): each year dir gets several
        # parquet files whose o_orderdate stats bands are disjoint —
        # the fragmented-partition shape file skipping exists for
        ledger.ledger_write(
            spark,
            base.repartitionByRange(28, "o_year", "o_orderdate"),
            path,
            "o_year",
            stats_cols=["o_orderdate"],
        )
        lo, hi = "1996-04-01 00:00:00", "1996-05-31 23:59:59"
        plan = ledger.ledger_plan_files(path, "o_orderdate", lo, hi)
        assert set(plan) == {"1996"}, (
            f"partition stats must keep exactly 1996, kept {sorted(plan)}"
        )
        m = ledger._read_manifest(path, 1)
        kept = sum(len(f) for f in plan.values() if f is not None)
        total = sum(
            len(m["partitions"][pv].get("files", {})) for pv in plan
        )
        assert 0 < kept < total, (
            f"file stats must prune within the partition: kept {kept} of "
            f"{total}"
        )
        out = (
            ledger.ledger_scan(spark, path, "o_orderdate", lo, hi)
            .groupBy(F.date_format("o_orderdate", "yyyy-MM").alias("o_month"))
            .agg(
                F.count(F.lit(1)).cast("long").alias("n_rows"),
                F.round(F.sum("o_totalprice"), 2).alias("sum_price"),
            )
        )
        return out.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(path, ignore_errors=True)
