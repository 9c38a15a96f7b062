"""File-format sources and sinks beyond parquet: CSV / JSON-lines / ORC.

The reference's only inputs are a REST API and Postgres tables; a complete
engine also ingests flat files. Both readers here follow the same
error-routing contract as the REST source (rest.py / json_ingest.py):
malformed rows are CAPTURED (PERMISSIVE mode + ``_corrupt_record``) and
split to a side channel, never silently dropped and never job-fatal —
at 100 TB a single bad line must not kill a batch.

Schemas are explicit (never inferred): inference costs an extra full read
of the data and produces drifting types across batches.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql import types as T

CORRUPT_COL = "_corrupt_record"


def _with_corrupt(schema: T.StructType) -> T.StructType:
    if CORRUPT_COL in schema.fieldNames():
        return schema
    return T.StructType([*schema.fields, T.StructField(CORRUPT_COL, T.StringType())])


def read_csv(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    header: bool = True,
    sep: str = ",",
) -> tuple[DataFrame, DataFrame]:
    """CSV with bad-record routing → (good, bad).

    ``bad`` holds the raw text of rows that failed type conversion or
    column-count checks; ``good`` has them removed."""
    raw = (
        spark.read.schema(_with_corrupt(schema))
        .option("header", header)
        .option("sep", sep)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .csv(path)
    )
    # caching is required for corrupt-record queries: Spark disallows
    # filtering only on the corrupt column of a lazily re-parsed source
    raw = raw.cache()
    good = raw.filter(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)
    bad = raw.filter(F.col(CORRUPT_COL).isNotNull()).select(
        F.col(CORRUPT_COL).alias("raw_record")
    )
    return good, bad


def read_jsonl(
    spark: SparkSession, path: str, schema: T.StructType
) -> tuple[DataFrame, DataFrame]:
    """JSON-lines with bad-record routing → (good, bad)."""
    raw = (
        spark.read.schema(_with_corrupt(schema))
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .json(path)
    )
    raw = raw.cache()
    good = raw.filter(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)
    bad = raw.filter(F.col(CORRUPT_COL).isNotNull()).select(
        F.col(CORRUPT_COL).alias("raw_record")
    )
    return good, bad


def write_orc(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """ORC sink (zlib-compressed, Spark's built-in columnar alternative to
    parquet — common as the interchange format of Hive-era warehouses)."""
    df.write.mode(mode).orc(path)


def read_orc(spark: SparkSession, path: str, schema: T.StructType) -> DataFrame:
    """ORC source with an EXPLICIT schema (same no-inference contract as
    the CSV/JSONL readers; ORC is self-describing, but pinning the schema
    catches producer drift at read time instead of ten queries later).
    ORC has no malformed-row concept — the file is either valid columnar
    data or fails the footer check — so there is no bad-row channel here.
    Predicate pushdown and column pruning work through this scan exactly
    as for parquet (Catalyst's OrcScan supports both)."""
    return spark.read.schema(schema).orc(path)


def compact_small_files(
    spark: SparkSession,
    path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
) -> int:
    """Compact a parquet directory's small files toward a target file size.

    The small-files problem is the classic failure mode of long-running
    append pipelines (every micro-batch adds files; scans drown in open()
    overhead and lose row-group statistics). Rewrites the directory with
    ``coalesce`` to ceil(total_bytes / target) files via a staging swap.
    Returns the resulting file count. Run it per partition directory in a
    partitioned layout so rewrites stay bounded."""
    import math
    import shutil
    from pathlib import Path

    total = sum(f.stat().st_size for f in Path(path).rglob("*.parquet"))
    n_files = max(1, math.ceil(total / target_file_bytes))
    staged = f"{path}__compacting"
    spark.read.parquet(path).coalesce(n_files).write.mode("overwrite").parquet(staged)
    shutil.rmtree(path)
    shutil.move(staged, path)
    return n_files
