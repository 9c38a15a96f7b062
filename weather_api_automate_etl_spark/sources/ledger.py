"""Minimal snapshot-manifest table ledger — the atomicity layer under
partitioned-mart maintenance.

``merge_into_partitioned`` (operators/cdc.py) is the Hive-layout
primitive: correct, partition-pruned, but its dynamic overwrite swaps
files non-atomically — a crash between staging and delete can expose a
mixed partition state, which is exactly why production lakes put a
TRANSACTION LEDGER (Delta's _delta_log, Iceberg's metadata tree) between
writers and readers. This module is that model reduced to its load-bearing
core, reimplemented from the publicly documented design (Armbrust et al.,
"Delta Lake: High-Performance ACID Table Storage over Cloud Object
Stores", VLDB 2020):

- data files are IMMUTABLE: every write lands in a fresh ``data-<uuid>``
  directory; nothing is ever modified or deleted by a writer;
- the table state is a MANIFEST (``_ledger/v<N>.json``) mapping each
  partition value to the directory that owns its current files, plus the
  partition column's dtype so readers restore types deterministically
  instead of relying on path inference;
- commits are a single atomic ``os.rename`` of a temp manifest into
  place (POSIX rename atomicity — the same primitive single-writer Delta
  relies on for its JSON commits). Readers resolve the newest manifest
  at open time: they see v<N> or v<N+1>, never a mix, and a writer crash
  before the rename leaves only unreferenced orphan files;
- a MERGE therefore rewrites only the touched partitions into a new
  directory and republishes the mapping with those keys repointed —
  untouched partitions are never read, written, or exposed to risk
  (upgrading merge_into_partitioned's best-effort checkpoint discipline
  to an actual atomic swap);
- old versions stay readable (time travel / stale-reader safety) until
  ``vacuum`` drops manifests beyond a retention count and deletes data
  directories no retained manifest references.

Scale shape: the manifest is PARTITION-granular — O(live partitions)
JSON, metadata-scale (a 100 TB mart at daily grain is a few thousand
entries), never O(files) driver state; data moves only for touched
partitions; readers plan directly from the manifest (no directory
listing of the whole table — the object-store win the ledger design
exists for).
"""

from __future__ import annotations

import json
import os
import shutil
import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession, functions as F

_LEDGER_DIR = "_ledger"


def _manifest_versions(path: str) -> list[int]:
    d = os.path.join(path, _LEDGER_DIR)
    if not os.path.isdir(d):
        return []
    out = []
    for name in os.listdir(d):
        if name.startswith("v") and name.endswith(".json"):
            try:
                out.append(int(name[1:-5]))
            except ValueError:
                continue
    return sorted(out)


def _read_manifest(path: str, version: int) -> dict:
    with open(os.path.join(path, _LEDGER_DIR, f"v{version}.json")) as f:
        return json.load(f)


def _commit(path: str, manifest: dict, version: int) -> None:
    """Atomically publish ``manifest`` as v{version}.

    Write-to-temp + ``os.rename`` into the final name: readers either see
    the complete new manifest or none of it. ``os.rename`` over an
    existing name would silently replace a concurrent committer's version
    on POSIX, so the target must not exist — the single-writer contract
    (concurrent committers need a CAS on top, exactly as Delta needs a
    coordinating LogStore on S3)."""
    d = os.path.join(path, _LEDGER_DIR)
    os.makedirs(d, exist_ok=True)
    final = os.path.join(d, f"v{version}.json")
    if os.path.exists(final):
        raise RuntimeError(
            f"ledger commit conflict: v{version} already exists at {path}"
        )
    fd, tmp = tempfile.mkstemp(dir=d, suffix=".tmp")
    try:
        with os.fdopen(fd, "w") as f:
            json.dump(manifest, f, sort_keys=True)
        os.rename(tmp, final)
    except BaseException:
        if os.path.exists(tmp):
            os.unlink(tmp)
        raise


def _write_data_dir(
    df: DataFrame, path: str, partition_col: str
) -> tuple[str, list[str]]:
    """Write one immutable partitioned data directory; return its name and
    the partition values it contains (stringified as in the dir names)."""
    batch = f"data-{uuid.uuid4().hex[:12]}"
    df.write.partitionBy(partition_col).parquet(os.path.join(path, batch))
    values = []
    prefix = f"{partition_col}="
    for name in os.listdir(os.path.join(path, batch)):
        if name.startswith(prefix):
            values.append(name[len(prefix):])
    return batch, values


def ledger_write(
    spark: SparkSession, df: DataFrame, path: str, partition_col: str
) -> int:
    """Initialize (or fully refresh) the table: one immutable data dir
    holding every partition, one manifest mapping all of them to it.
    Returns the committed version."""
    dtype = df.schema[partition_col].dataType.simpleString()
    batch, values = _write_data_dir(df, path, partition_col)
    version = (_manifest_versions(path) or [0])[-1] + 1
    manifest = {
        "partition_col": partition_col,
        "partition_dtype": dtype,
        "partitions": {v: batch for v in values},
    }
    _commit(path, manifest, version)
    return version


def ledger_read(
    spark: SparkSession, path: str, version: int | None = None
) -> DataFrame:
    """Open a snapshot: the newest manifest by default, or a pinned
    ``version`` (time travel). Plans directly from the manifest — each
    owning directory is read once with ``basePath`` so the partition
    column materializes, then the partition dtype recorded at write time
    is restored explicitly (never inferred from path strings)."""
    versions = _manifest_versions(path)
    if not versions:
        raise FileNotFoundError(f"no ledger manifest under {path}")
    v = versions[-1] if version is None else version
    if v not in versions:
        raise FileNotFoundError(f"ledger version v{v} not found (have {versions})")
    m = _read_manifest(path, v)
    pcol = m["partition_col"]
    by_dir: dict[str, list[str]] = {}
    for pval, d in m["partitions"].items():
        by_dir.setdefault(d, []).append(pval)
    parts = []
    for d, pvals in sorted(by_dir.items()):
        base = os.path.join(path, d)
        dirs = [os.path.join(base, f"{pcol}={pv}") for pv in sorted(pvals)]
        parts.append(spark.read.option("basePath", base).parquet(*dirs))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.withColumn(pcol, F.col(pcol).cast(m["partition_dtype"]))


def ledger_merge(
    spark: SparkSession,
    path: str,
    updates: DataFrame,
    key: str,
) -> int:
    """Atomic partition-granular MERGE: resolve the upsert inside the
    touched partitions only (operators/cdc.py::merge_into — update rows
    win, untouched rows carry), write the merged partitions as a NEW
    immutable directory, and commit a manifest with exactly those keys
    repointed. Readers flip from v<N> to v<N+1> in one rename; a crash at
    any earlier point leaves v<N> fully intact plus orphans for vacuum.
    An update batch may introduce NEW partition values — they join the
    mapping on commit. Returns the committed version (the previous
    version if the batch is empty)."""
    from weather_api_automate_etl_spark.operators.cdc import merge_into

    versions = _manifest_versions(path)
    if not versions:
        raise FileNotFoundError(f"no ledger manifest under {path}")
    v = versions[-1]
    m = _read_manifest(path, v)
    pcol = m["partition_col"]
    touched = [
        r["__pv"]
        for r in updates.select(
            F.col(pcol).cast("string").alias("__pv")
        ).distinct().collect()
    ]
    if not touched:
        return v
    existing = [pv for pv in touched if pv in m["partitions"]]
    if existing:
        current = ledger_read(spark, path, v).filter(
            F.col(pcol).cast("string").isin(touched)
        )
        merged = merge_into(current, updates.select(*current.columns), key)
    else:
        merged = updates
    batch, written = _write_data_dir(merged, path, pcol)
    manifest = {
        "partition_col": pcol,
        "partition_dtype": m["partition_dtype"],
        "partitions": {**m["partitions"], **{pv: batch for pv in written}},
    }
    _commit(path, manifest, v + 1)
    return v + 1


def ledger_vacuum(path: str, keep_versions: int = 2) -> list[str]:
    """Drop manifests beyond the ``keep_versions`` newest and delete every
    data directory none of the retained manifests references — including
    orphans from crashed writers (present on disk, named in no manifest).
    Returns the deleted directory names. Safe for stale readers pinned to
    any RETAINED version; shrinking ``keep_versions`` trades time-travel
    depth for storage, exactly Delta's retention knob."""
    versions = _manifest_versions(path)
    if not versions:
        return []
    keep = versions[-keep_versions:] if keep_versions > 0 else []
    live: set[str] = set()
    for v in keep:
        live.update(_read_manifest(path, v)["partitions"].values())
    deleted = []
    for name in os.listdir(path):
        if name.startswith("data-") and name not in live:
            shutil.rmtree(os.path.join(path, name))
            deleted.append(name)
    for v in versions:
        if v not in keep:
            os.unlink(os.path.join(path, _LEDGER_DIR, f"v{v}.json"))
    return sorted(deleted)
