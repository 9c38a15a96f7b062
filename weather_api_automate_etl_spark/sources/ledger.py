"""Minimal snapshot-manifest table ledger — the atomicity + data-skipping
layer under partitioned-mart maintenance.

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
  partition value to an entry ``{dir, rows, stats}`` — the directory that
  owns its current files, its row count, and optional per-column min/max
  statistics — plus the partition column's dtype so readers restore types
  deterministically instead of relying on path inference;
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
- the per-partition STATS enable manifest-level data skipping
  (``ledger_plan``/``ledger_scan``): a predicate on any stats-tracked
  column prunes every partition whose [min, max] cannot intersect it —
  the zone-map mechanism under Delta/Iceberg/Snowflake readers, and the
  reason a date-range query over a date-correlated column touches 2 of
  3000 partitions without the column being the partition key;
- ``ledger_compact`` is OPTIMIZE: rewrite chosen partitions' accumulated
  small files into one file per partition in a fresh directory and
  commit — readers never block, the small-files problem every
  append/merge-heavy table develops is fixed by a background writer;
- old versions stay readable (time travel / stale-reader safety) until
  ``vacuum`` drops manifests beyond a retention count and deletes data
  directories no retained manifest references.

Scale shape: the manifest is PARTITION-granular — O(live partitions)
JSON, metadata-scale (a 100 TB mart at daily grain is a few thousand
entries), never O(files) driver state; stats add two scalars per tracked
column per partition; data moves only for touched partitions; readers
plan directly from the manifest (no directory listing of the whole
table — the object-store win the ledger design exists for).
"""

from __future__ import annotations

import json
import os
import shutil
import tempfile
import uuid
from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession, functions as F

_LEDGER_DIR = "_ledger"

#: numeric Spark dtypes whose stats are stored (and compared) as floats;
#: everything else is stored stringified and compared lexicographically,
#: which is order-preserving for the types it is offered for (timestamps
#: and dates stringify as ISO-8601; plain strings compare as themselves)
_NUM_KINDS = ("int", "bigint", "smallint", "tinyint", "float", "double", "decimal")


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


def _partition_stats(
    df: DataFrame, partition_col: str, stats_cols: Sequence[str]
) -> dict[str, dict]:
    """Per-partition (rows, min/max per stats col) in ONE batch-scale
    aggregate — the write-side cost of data skipping. Numeric columns
    store floats; temporal/string columns store their ISO/string form
    (order-preserving for lexicographic pruning)."""
    aggs = [F.count(F.lit(1)).alias("__rows")]
    kinds: dict[str, str] = {}
    for c in stats_cols:
        dt = df.schema[c].dataType.simpleString()
        kinds[c] = "num" if dt.startswith(_NUM_KINDS) else "str"
        mn, mx = F.min(F.col(c)), F.max(F.col(c))
        if kinds[c] == "num":
            aggs += [mn.cast("double").alias(f"__mn_{c}"),
                     mx.cast("double").alias(f"__mx_{c}")]
        else:
            aggs += [mn.cast("string").alias(f"__mn_{c}"),
                     mx.cast("string").alias(f"__mx_{c}")]
    rows = (
        df.groupBy(F.col(partition_col).cast("string").alias("__pv"))
        .agg(*aggs)
        .collect()
    )
    out: dict[str, dict] = {}
    for r in rows:
        stats = {
            c: {"min": r[f"__mn_{c}"], "max": r[f"__mx_{c}"], "kind": kinds[c]}
            for c in stats_cols
        }
        out[r["__pv"]] = {"rows": r["__rows"], "stats": stats}
    return out


def _bloom_positions(col: F.Column, num_bits: int, num_hashes: int) -> F.Column:
    """The k probe-bit positions of a key — xxhash64 with k seeds, the
    same family operators/joins.py::bloom_filter_build uses. Build and
    probe both run in Spark, so the hash needs no Python twin."""
    seeds = F.array(*[F.lit(s) for s in range(num_hashes)])
    return F.transform(seeds, lambda s: F.pmod(F.xxhash64(col, s), F.lit(num_bits)))


def _partition_blooms(
    df: DataFrame,
    partition_col: str,
    key_col: str,
    num_bits: int,
    num_hashes: int,
) -> dict[str, str]:
    """Per-partition Bloom bitmap over ``key_col`` as hex strings — the
    membership index ledger_delete's locate phase prunes with. One
    distributed pass (explode k positions → distinct → per-(partition,
    word) OR); the driver receives ≤ partitions·bits/64 word rows."""
    words = (
        df.select(
            F.col(partition_col).cast("string").alias("__pv"),
            F.explode(
                _bloom_positions(F.col(key_col), num_bits, num_hashes)
            ).alias("__bit"),
        )
        .distinct()
        .groupBy("__pv", (F.col("__bit") / 64).cast("long").alias("__word"))
        .agg(
            F.bit_or(
                F.call_function(
                    "shiftleft",
                    F.lit(1).cast("long"),
                    (F.col("__bit") % 64).cast("int"),
                )
            ).alias("__bits")
        )
        .collect()
    )
    maps: dict[str, list[int]] = {}
    for r in words:
        maps.setdefault(r["__pv"], [0] * (num_bits // 64))[r["__word"]] = r["__bits"]
    return {
        pv: "".join(f"{w & 0xFFFFFFFFFFFFFFFF:016x}" for w in bm)
        for pv, bm in maps.items()
    }


def _write_data_dir(
    df: DataFrame,
    path: str,
    partition_col: str,
    stats_cols: Sequence[str] = (),
    key_index: dict | None = None,
) -> dict[str, dict]:
    """Write one immutable partitioned data directory; return the manifest
    entries it produces: partition value → {dir, rows, stats[, key_bloom]}."""
    batch = f"data-{uuid.uuid4().hex[:12]}"
    df.write.partitionBy(partition_col).parquet(os.path.join(path, batch))
    stats = _partition_stats(df, partition_col, stats_cols)
    blooms = (
        _partition_blooms(
            df, partition_col, key_index["col"],
            key_index["bits"], key_index["hashes"],
        )
        if key_index
        else {}
    )
    entries: dict[str, dict] = {}
    prefix = f"{partition_col}="
    for name in os.listdir(os.path.join(path, batch)):
        if name.startswith(prefix):
            pv = name[len(prefix):]
            meta = stats.get(pv, {"rows": None, "stats": {}})
            entries[pv] = {"dir": batch, **meta}
            if pv in blooms:
                entries[pv]["key_bloom"] = blooms[pv]
    return entries


def ledger_write(
    spark: SparkSession,
    df: DataFrame,
    path: str,
    partition_col: str,
    stats_cols: Sequence[str] = (),
    txn: tuple[str, int] | None = None,
    key_index_col: str | None = None,
    key_index_bits: int = 1 << 15,
    key_index_hashes: int = 4,
) -> int:
    """Initialize (or fully refresh) the table: one immutable data dir
    holding every partition, one manifest mapping all of them to it, with
    per-partition min/max stats for ``stats_cols`` (the skipping index —
    pick the columns range predicates arrive on). ``txn=(app_id, txn_id)``
    records an application transaction watermark in the manifest (the
    streaming sink's exactly-once handle — see ledger_merge).

    ``key_index_col`` adds a per-partition Bloom MEMBERSHIP index over
    that column (default 2^15 bits ≈ 8 KiB hex per partition in the
    manifest): ledger_delete's locate phase then prunes candidate
    partitions from the manifest alone instead of scanning the table.
    Sizing note: the index is manifest-resident, so bits·partitions is
    the knob — at thousands of partitions either shrink the bitmap or
    move the index to a sidecar per data dir (the Delta choice of
    per-file bloom sidecars). Returns the committed version."""
    if key_index_bits % 64:
        raise ValueError(f"key_index_bits must be a multiple of 64, got {key_index_bits}")
    dtype = df.schema[partition_col].dataType.simpleString()
    key_index = (
        {"col": key_index_col, "bits": key_index_bits, "hashes": key_index_hashes}
        if key_index_col
        else None
    )
    entries = _write_data_dir(df, path, partition_col, stats_cols, key_index)
    version = (_manifest_versions(path) or [0])[-1] + 1
    manifest = {
        "partition_col": partition_col,
        "partition_dtype": dtype,
        "stats_cols": list(stats_cols),
        "key_index": key_index,
        "txn": {txn[0]: txn[1]} if txn else {},
        "partitions": entries,
    }
    _commit(path, manifest, version)
    return version


def _resolve(path: str, version: int | None) -> tuple[int, dict]:
    versions = _manifest_versions(path)
    if not versions:
        raise FileNotFoundError(f"no ledger manifest under {path}")
    v = versions[-1] if version is None else version
    if v not in versions:
        raise FileNotFoundError(f"ledger version v{v} not found (have {versions})")
    return v, _read_manifest(path, v)


def _read_partitions(
    spark: SparkSession, path: str, m: dict, pvals: Sequence[str]
) -> DataFrame:
    pcol = m["partition_col"]
    by_dir: dict[str, list[str]] = {}
    for pv in pvals:
        by_dir.setdefault(m["partitions"][pv]["dir"], []).append(pv)
    parts = []
    for d, vals in sorted(by_dir.items()):
        base = os.path.join(path, d)
        dirs = [os.path.join(base, f"{pcol}={pv}") for pv in sorted(vals)]
        parts.append(spark.read.option("basePath", base).parquet(*dirs))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.withColumn(pcol, F.col(pcol).cast(m["partition_dtype"]))


def ledger_read(
    spark: SparkSession, path: str, version: int | None = None
) -> DataFrame:
    """Open a snapshot: the newest manifest by default, or a pinned
    ``version`` (time travel). Plans directly from the manifest — each
    owning directory is read once with ``basePath`` so the partition
    column materializes, then the partition dtype recorded at write time
    is restored explicitly (never inferred from path strings)."""
    _, m = _resolve(path, version)
    return _read_partitions(spark, path, m, list(m["partitions"]))


def ledger_plan(
    path: str,
    col: str,
    lo,
    hi,
    version: int | None = None,
) -> list[str]:
    """Manifest-level data skipping: the partition values whose recorded
    [min, max] for ``col`` can intersect [lo, hi] — pure driver-side JSON
    arithmetic over O(partitions) entries, no filesystem or Spark touch.
    Partitions written without stats for ``col`` are conservatively kept
    (skipping may only ever remove provably-empty work)."""
    _, m = _resolve(path, version)
    if col not in m.get("stats_cols", []):
        raise ValueError(
            f"column {col!r} carries no stats in this ledger "
            f"(stats_cols={m.get('stats_cols')})"
        )
    keep = []
    for pv, entry in m["partitions"].items():
        s = entry.get("stats", {}).get(col)
        if s is None or s["min"] is None or s["max"] is None:
            keep.append(pv)  # no evidence → cannot skip
            continue
        smin, smax = s["min"], s["max"]
        if s["kind"] == "num":
            smin, smax, qlo, qhi = float(smin), float(smax), float(lo), float(hi)
        else:
            qlo, qhi = str(lo), str(hi)
        if not (smax < qlo or smin > qhi):
            keep.append(pv)
    return sorted(keep)


def ledger_scan(
    spark: SparkSession,
    path: str,
    col: str,
    lo,
    hi,
    version: int | None = None,
) -> DataFrame:
    """Stats-pruned range scan: read ONLY the partitions ``ledger_plan``
    keeps, then apply the exact ``col BETWEEN lo AND hi`` predicate — the
    zone-map read path. Bit-identical to filtering the full snapshot (the
    q_ledger_skip oracle), touching only the partitions that can match."""
    v, m = _resolve(path, version)
    keep = ledger_plan(path, col, lo, hi, version=v)
    if not keep:
        return (
            _read_partitions(spark, path, m, list(m["partitions"]))
            .filter(F.lit(False))
        )
    return _read_partitions(spark, path, m, keep).filter(
        F.col(col).between(F.lit(lo), F.lit(hi))
    )


def ledger_merge(
    spark: SparkSession,
    path: str,
    updates: DataFrame,
    key: str,
    txn: tuple[str, int] | None = None,
) -> int:
    """Atomic partition-granular MERGE: resolve the upsert inside the
    touched partitions only (operators/cdc.py::merge_into — update rows
    win, untouched rows carry), write the merged partitions as a NEW
    immutable directory (with refreshed stats), and commit a manifest
    with exactly those keys repointed. Readers flip from v<N> to v<N+1>
    in one rename; a crash at any earlier point leaves v<N> fully intact
    plus orphans for vacuum. An update batch may introduce NEW partition
    values — they join the mapping on commit.

    ``txn=(app_id, txn_id)`` is the EXACTLY-ONCE handle (the ledger form
    of Delta's ``txn`` action): the manifest carries each application's
    highest applied transaction id, and a merge whose ``txn_id`` is not
    greater than the recorded watermark returns the current version
    WITHOUT reading, writing, or committing anything. Structured
    Streaming's checkpoint gives at-least-once batch REPLAY; recording
    the batch id in the same atomic commit as the data turns replay into
    a no-op — stronger than value-idempotence, which still pays the
    merge I/O on every redelivery. Returns the committed version (the
    previous version if the batch is empty or already applied)."""
    from weather_api_automate_etl_spark.operators.cdc import merge_into

    versions = _manifest_versions(path)
    if not versions:
        raise FileNotFoundError(f"no ledger manifest under {path}")
    v = versions[-1]
    m = _read_manifest(path, v)
    if txn is not None and txn[1] <= m.get("txn", {}).get(txn[0], -1):
        return v  # transaction already applied: replay is a pure no-op
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
        current = _read_partitions(spark, path, m, existing).filter(
            F.col(pcol).cast("string").isin(touched)
        )
        merged = merge_into(current, updates.select(*current.columns), key)
    else:
        merged = updates
    entries = _write_data_dir(
        merged, path, pcol, m.get("stats_cols", []), m.get("key_index")
    )
    manifest = {
        "partition_col": pcol,
        "partition_dtype": m["partition_dtype"],
        "stats_cols": m.get("stats_cols", []),
        "key_index": m.get("key_index"),
        "txn": {
            **m.get("txn", {}),
            **({txn[0]: txn[1]} if txn else {}),
        },
        "partitions": {**m["partitions"], **entries},
    }
    _commit(path, manifest, v + 1)
    return v + 1


def ledger_compact(
    spark: SparkSession,
    path: str,
    partitions: Sequence[str] | None = None,
) -> int:
    """OPTIMIZE: rewrite the chosen partitions (default: every partition
    whose directory holds more than one data file) into ONE file per
    partition in a fresh directory and commit — state is bit-identical
    (pinned in tests), only the file layout changes. Runs as a background
    writer against live readers: they keep planning from v<N> until the
    rename. Returns the committed version (unchanged if nothing needs
    compaction)."""
    versions = _manifest_versions(path)
    if not versions:
        raise FileNotFoundError(f"no ledger manifest under {path}")
    v = versions[-1]
    m = _read_manifest(path, v)
    pcol = m["partition_col"]
    if partitions is None:
        partitions = []
        for pv, entry in m["partitions"].items():
            pdir = os.path.join(path, entry["dir"], f"{pcol}={pv}")
            n_files = sum(
                1 for f in os.listdir(pdir) if f.endswith(".parquet")
            )
            if n_files > 1:
                partitions.append(pv)
    partitions = [pv for pv in partitions if pv in m["partitions"]]
    if not partitions:
        return v
    current = _read_partitions(spark, path, m, partitions)
    # hash-partition by the partition column: each value's rows land in
    # one task, so partitionBy emits exactly one file per partition dir
    compacted = current.repartition(F.col(pcol))
    entries = _write_data_dir(
        compacted, path, pcol, m.get("stats_cols", []), m.get("key_index")
    )
    manifest = {
        "partition_col": pcol,
        "partition_dtype": m["partition_dtype"],
        "stats_cols": m.get("stats_cols", []),
        "key_index": m.get("key_index"),
        "txn": m.get("txn", {}),
        "partitions": {**m["partitions"], **entries},
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
        live.update(
            e["dir"] for e in _read_manifest(path, v)["partitions"].values()
        )
    deleted = []
    for name in os.listdir(path):
        if name.startswith("data-") and name not in live:
            shutil.rmtree(os.path.join(path, name))
            deleted.append(name)
    for v in versions:
        if v not in keep:
            os.unlink(os.path.join(path, _LEDGER_DIR, f"v{v}.json"))
    return sorted(deleted)


def ledger_delete(
    spark: SparkSession,
    path: str,
    keys: DataFrame,
    key: str,
    txn: tuple[str, int] | None = None,
) -> int:
    """Row-level DELETE through the ledger — the takedown /
    right-to-be-forgotten path a training-data corpus needs: remove every
    row matching the key set, atomically, rewriting only the partitions
    that actually contain matches.

    Locating the matches is the honest cost split (the same split Delta's
    DELETE makes):

    - if ``keys`` carries the partition column, the candidate set prunes
      to those partitions with no scan at all;
    - otherwise, on a table written with ``key_index_col``, the
      manifest's per-partition Bloom bitmaps prune the candidate set with
      pure driver arithmetic — no table scan — and one semi-join scan of
      the CANDIDATES ONLY confirms exact hits (false-positive partitions
      are confirmed out here, so a no-hit partition is never rewritten);
    - without an index, ONE semi-join scan of the snapshot finds the
      (partition, hit) pairs — corpus-linear read, metadata-sized output.

    Partitions whose every row is deleted leave the mapping entirely (the
    readback simply stops planning them). Delete is idempotent by
    construction — re-deleting absent keys touches nothing — and
    ``txn`` gives it the same exactly-once replay handle as merge.
    Returns the committed version (unchanged when nothing matches)."""
    versions = _manifest_versions(path)
    if not versions:
        raise FileNotFoundError(f"no ledger manifest under {path}")
    v = versions[-1]
    m = _read_manifest(path, v)
    if txn is not None and txn[1] <= m.get("txn", {}).get(txn[0], -1):
        return v
    pcol = m["partition_col"]
    kdf = keys.select(key).distinct() if pcol not in keys.columns else keys
    ki = m.get("key_index")
    if pcol in keys.columns:
        candidates = sorted(
            {
                r["__pv"]
                for r in keys.select(
                    F.col(pcol).cast("string").alias("__pv")
                ).distinct().collect()
            }
            & set(m["partitions"])
        )
        kdf = keys.select(key).distinct()
    else:
        scan_over = list(m["partitions"])
        if ki is not None and ki["col"] == key:
            # manifest-resident membership index: keep only partitions
            # whose Bloom bitmap could contain at least one doomed key —
            # pure driver arithmetic, no table scan
            key_rows = kdf.select(
                _bloom_positions(F.col(key), ki["bits"], ki["hashes"]).alias("__pos")
            ).collect()
            key_positions = [tuple(r["__pos"]) for r in key_rows]
            scan_over = []
            for pv, entry in m["partitions"].items():
                hx = entry.get("key_bloom")
                if hx is None:
                    scan_over.append(pv)  # unindexed partition: keep
                    continue
                words = [
                    int(hx[i : i + 16], 16) for i in range(0, len(hx), 16)
                ]
                if any(
                    all(words[p // 64] >> (p % 64) & 1 for p in pos)
                    for pos in key_positions
                ):
                    scan_over.append(pv)
            if not scan_over:
                return v
        # exact confirm over the (possibly bloom-pruned) candidates only:
        # Bloom false positives are confirmed OUT here, so a no-hit
        # partition is never rewritten
        snap = _read_partitions(spark, path, m, scan_over)
        candidates = sorted(
            r["__pv"]
            for r in snap.join(kdf, key, "left_semi")
            .select(F.col(pcol).cast("string").alias("__pv"))
            .distinct()
            .collect()
        )
    if not candidates:
        return v
    current = _read_partitions(spark, path, m, candidates)
    kept = current.join(kdf, key, "left_anti")
    entries = _write_data_dir(
        kept, path, pcol, m.get("stats_cols", []), ki
    )
    remaining = {
        pv: e for pv, e in m["partitions"].items() if pv not in candidates
    }
    manifest = {
        "partition_col": pcol,
        "partition_dtype": m["partition_dtype"],
        "stats_cols": m.get("stats_cols", []),
        "key_index": ki,
        "txn": {
            **m.get("txn", {}),
            **({txn[0]: txn[1]} if txn else {}),
        },
        "partitions": {**remaining, **entries},
    }
    _commit(path, manifest, v + 1)
    return v + 1


def ledger_changes(
    spark: SparkSession,
    path: str,
    key: str,
    compare_cols: Sequence[str],
    v_from: int,
    v_to: int | None = None,
) -> DataFrame:
    """Change data feed between two committed versions — the ledger form
    of Delta's CDF: every key whose tracked columns changed between
    ``v_from`` and ``v_to`` (default: newest), classified
    added/removed/changed, with the new-side values.

    The manifest diff does the heavy lifting BEFORE any data is read:
    only partitions whose owning entry differs between the two manifests
    (repointed, appeared, or vanished) can contain changes — partition-
    grain copy-on-write guarantees an untouched mapping entry means
    byte-identical data — so both snapshot slices read just those
    partitions, then one hash-compare full-outer join
    (operators/cdc.py::snapshot_diff) classifies the keys. A downstream
    consumer incrementally follows a 3000-partition mart by reading the
    handful its last sync actually touched; 'unchanged' rows inside a
    rewritten partition are filtered out, so the feed carries exactly
    the net row-level delta."""
    v_to_r, m_to = _resolve(path, v_to)
    v_from_r, m_from = _resolve(path, v_from)
    if v_from_r > v_to_r:
        raise ValueError(f"v_from={v_from_r} is newer than v_to={v_to_r}")
    from weather_api_automate_etl_spark.operators.cdc import snapshot_diff

    pf, pt = m_from["partitions"], m_to["partitions"]
    changed = sorted(
        pv
        for pv in set(pf) | set(pt)
        if pf.get(pv, {}).get("dir") != pt.get(pv, {}).get("dir")
    )
    old_pvs = [pv for pv in changed if pv in pf]
    new_pvs = [pv for pv in changed if pv in pt]
    cols = [key, *compare_cols]
    if not changed:
        # build an empty, correctly-typed frame off either snapshot
        any_m = m_to if pt else m_from
        base = _read_partitions(spark, path, any_m, list(any_m["partitions"]))
        return (
            snapshot_diff(base.select(*cols), base.select(*cols), key, compare_cols)
            .filter(F.lit(False))
        )
    old_slice = (
        _read_partitions(spark, path, m_from, old_pvs).select(*cols)
        if old_pvs
        else None
    )
    new_slice = (
        _read_partitions(spark, path, m_to, new_pvs).select(*cols)
        if new_pvs
        else None
    )
    if old_slice is None:
        old_slice = new_slice.filter(F.lit(False))
    if new_slice is None:
        new_slice = old_slice.filter(F.lit(False))
    return snapshot_diff(old_slice, new_slice, key, compare_cols).filter(
        F.col("change_type") != "unchanged"
    )
