"""SparkSession factory with the engine's canonical configuration.

Plays the role the docker-compose Postgres container plays in the reference
(docker-compose.yml:2-14): the single execution engine every stage talks to.
Design decisions (all scale-oriented, see SURVEY.md §4/§7):

- UTC session timezone — timestamp semantics must hash identically to the
  DuckDB oracle and to the reference's TIMESTAMP-without-TZ columns.
- AQE on (coalesce partitions + skew join) — runtime re-planning replaces the
  Postgres planner's role and keeps plans healthy at 100 TB.
- ``parquet.nanosAsLong`` — fixture generations that store ``events.ts``
  as TIMESTAMP(NANOS) read as ns-long and convert with integer division
  (float division would lose precision above 2^53); µs-typed generations
  read natively and the conf is a harmless no-op. sources/tables.py
  guards on the observed dtype either way.
- Arrow enabled — every Pandas-UDF path (similarity, multimodal) is
  Arrow-batched, never row-at-a-time.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def default_parallelism() -> int:
    """CPU budget: driver contract exposes SPARK_GRAFT_CPUS (default 32)."""
    return int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(
    app_name: str = "weather-api-automate-etl-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) the canonical SparkSession.

    On a real cluster ``master`` comes from spark-submit; locally we default
    to ``local[$SPARK_GRAFT_CPUS]``. Shuffle partitions default to the CPU
    count — AQE coalesces down when partitions are small, and at 100 TB the
    operator code never hard-codes a partition count.
    """
    cpus = default_parallelism()
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master or f"local[{cpus}]")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions or cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.ui.enabled", os.environ.get("SPARK_UI", "false"))
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        # Bound the status-store history: even with the UI off, the app
        # status listeners retain per-execution plan graphs and per-stage
        # task state at 1000-entry defaults; a resident session running
        # hundreds of queries (the bench suite, a long service) pays for
        # that in driver heap + GC, which shows up as round-over-round
        # warm-time drift on sub-second queries. History depth is not a
        # correctness surface; keep just enough for debugging.
        .config("spark.sql.ui.retainedExecutions", "50")
        .config("spark.ui.retainedJobs", "100")
        .config("spark.ui.retainedStages", "100")
        .config("spark.ui.retainedTasks", "1000")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
