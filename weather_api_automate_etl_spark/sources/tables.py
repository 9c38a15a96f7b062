"""Testdata catalog — parquet scans with type normalization.

Plays the role of dbt's ``source()``/``ref()`` resolution
(/root/reference/dbt/models/staging/_staging__sources.yml:4-9,
stg_weather.sql:37): a name → relation mapping. Catalyst then owns predicate
pushdown and column pruning through these scans — ``.explain`` on any query
over these shows PushedFilters/ReadSchema reaching the parquet source.

The one normalization: ``events.ts`` has shipped as parquet
TIMESTAMP(NANOS) in some fixture generations (read as a raw ns-epoch long
under ``spark.sql.legacy.parquet.nanosAsLong``) and TIMESTAMP(MICROS) in
others (read natively as timestamp_ntz). ``load_table`` guards on the
observed dtype: bigint takes **integer** division (``ts div 1000`` — ns
epochs ~1.7e18 exceed double's 2^53 mantissa, so float division would
corrupt microseconds) then casts to timestamp_ntz; native timestamps pass
through. The DuckDB oracle mirrors both with ``CAST(ts AS TIMESTAMP)``.
The streaming stager (queries_ext.py::_drain_event_stream) probes the
file's batch schema the same way before declaring its stream schema.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from weather_api_automate_etl_spark.schemas import TESTDATA_TABLES

#: Tables whose per-row expression cost dwarfs their byte size (md5-heavy
#: shingling/minhash over text). For these, single-partition inputs serialize
#: the CPU work, so redistribution pays for its shuffle many times over.
#: Relational tables are deliberately excluded: measured at sf0.1, the
#: shuffle costs more than the 1-core penalty for scan+agg/join shapes.
_COMPUTE_BOUND_TABLES = frozenset({"documents"})


def _ensure_engine_confs(spark: SparkSession) -> None:
    """Self-configure sessions we didn't build (e.g. the driver's): UTC
    timestamps (oracle hash parity) and ns-as-long parquet reads. Both are
    runtime-settable SQLConfs."""
    for key, val in (
        ("spark.sql.session.timeZone", "UTC"),
        ("spark.sql.legacy.parquet.nanosAsLong", "true"),
    ):
        try:
            if spark.conf.get(key, None) != val:
                spark.conf.set(key, val)
        except Exception:  # noqa: BLE001 — leave immutable confs alone
            pass


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one testdata table, normalizing ns-timestamp columns."""
    _ensure_engine_confs(spark)
    path = f"{sf_dir}/{name}.parquet"
    df = spark.read.parquet(path)
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn(
            "ts", F.timestamp_micros(F.expr("ts div 1000")).cast("timestamp_ntz")
        )
    # The fixture tables ship as ONE single-row-group parquet file each —
    # unsplittable, so downstream stages execute on one core no matter the
    # cluster. For compute-bound tables redistribute to the session's
    # parallelism; guarded on partition count, so on a real multi-file
    # layout (partitions ≥ cores) this is a no-op. Catalyst still pushes
    # filters/pruning through the repartition into the scan.
    if name in _COMPUTE_BOUND_TABLES:
        par = spark.sparkContext.defaultParallelism
        if df.rdd.getNumPartitions() < par:
            df = df.repartition(par)
    return df


def register_testdata(spark: SparkSession, sf_dir: str) -> None:
    """Register every testdata table as a temp view (SQL entry point)."""
    for name in TESTDATA_TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
