"""Atomic snapshot ledger (sources/ledger.py): commit atomicity, crash
isolation, time travel, merge equivalence, vacuum retention."""

from __future__ import annotations

import json
import os
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from weather_api_automate_etl_spark.sources import ledger


@pytest.fixture()
def mart(tmp_path, spark):
    df = spark.createDataFrame(
        [(k, float(k * 10), str(2000 + k % 3)) for k in range(30)],
        "k long, price double, year string",
    )
    path = str(tmp_path / "mart")
    v = ledger.ledger_write(spark, df, path, "year")
    assert v == 1
    return path, df


def _snapshot(spark, path, version=None):
    return sorted(
        (r.k, r.price, r.year)
        for r in ledger.ledger_read(spark, path, version).collect()
    )


def test_write_read_roundtrip_restores_partition_dtype(spark, mart):
    path, df = mart
    got = ledger.ledger_read(spark, path)
    assert dict(got.dtypes)["year"] == "string"
    assert _snapshot(spark, path) == sorted(
        (r.k, r.price, r.year) for r in df.collect()
    )


def test_merge_rewrites_only_touched_partitions_and_matches_merge_into(
    spark, mart
):
    path, df = mart
    m1 = ledger._read_manifest(path, 1)
    updates = spark.createDataFrame(
        # reprice two keys of year 2001; insert a new key into NEW year 2999
        [(1, 999.0, "2001"), (4, 888.0, "2001"), (100, 5.0, "2999")],
        "k long, price double, year string",
    )
    v = ledger.ledger_merge(spark, path, updates, "k")
    assert v == 2
    m2 = ledger._read_manifest(path, 2)
    # untouched partitions keep their original directory; touched + new
    # ones point at exactly one fresh directory
    assert m2["partitions"]["2000"] == m1["partitions"]["2000"]
    assert m2["partitions"]["2002"] == m1["partitions"]["2002"]
    assert m2["partitions"]["2001"] != m1["partitions"]["2001"]
    assert m2["partitions"]["2999"] == m2["partitions"]["2001"]
    # state equivalence vs the in-memory merge of the whole table
    from weather_api_automate_etl_spark.operators.cdc import merge_into

    want = sorted(
        (r.k, r.price, r.year)
        for r in merge_into(df, updates, "k").collect()
    )
    assert _snapshot(spark, path) == want
    # time travel: v1 is untouched
    assert _snapshot(spark, path, version=1) == sorted(
        (r.k, r.price, r.year) for r in df.collect()
    )


def test_crashed_writer_leaves_current_version_intact(spark, mart):
    path, _ = mart
    before = _snapshot(spark, path)
    # simulate a writer that died after the data write, before the commit:
    # a data dir exists on disk but no manifest references it
    updates = spark.createDataFrame([(1, -1.0, "2001")], "k long, price double, year string")
    ledger._write_data_dir(updates, path, "year")
    assert _snapshot(spark, path) == before  # readers never see orphans
    # vacuum removes the orphan without touching live data
    orphans = ledger.ledger_vacuum(path, keep_versions=1)
    assert len(orphans) == 1
    assert _snapshot(spark, path) == before


def test_commit_conflict_raises_instead_of_clobbering(spark, mart):
    path, _ = mart
    m = ledger._read_manifest(path, 1)
    with pytest.raises(RuntimeError, match="conflict"):
        ledger._commit(path, m, 1)


def test_vacuum_retention_drops_old_versions_and_unreferenced_dirs(
    spark, mart
):
    path, _ = mart
    for i in range(3):
        updates = spark.createDataFrame(
            [(i, float(1000 + i), str(2000 + i % 3))],
            "k long, price double, year string",
        )
        ledger.ledger_merge(spark, path, updates, "k")
    assert ledger._manifest_versions(path) == [1, 2, 3, 4]
    latest = _snapshot(spark, path)
    # keep 2: v3/v4 still reference every dir (each merge rewrote a
    # DIFFERENT partition, untouched ones stay with their old owners), so
    # retention must delete manifests but NO data
    deleted = ledger.ledger_vacuum(path, keep_versions=2)
    assert deleted == []
    assert ledger._manifest_versions(path) == [3, 4]
    assert _snapshot(spark, path) == latest
    assert _snapshot(spark, path, version=3)  # retained version readable
    with pytest.raises(FileNotFoundError):
        ledger.ledger_read(spark, path, version=1)
    # keep 1: only v4's owners survive — the init dir (which by now owns
    # no partition in v4) must be reclaimed
    deleted = ledger.ledger_vacuum(path, keep_versions=1)
    assert len(deleted) == 1 and deleted[0].startswith("data-")
    assert _snapshot(spark, path) == latest
    live = set(ledger._read_manifest(path, 4)["partitions"].values())
    on_disk = {n for n in os.listdir(path) if n.startswith("data-")}
    assert on_disk == live


def test_empty_update_batch_is_a_noop_version(spark, mart):
    path, _ = mart
    empty = spark.createDataFrame([], "k long, price double, year string")
    assert ledger.ledger_merge(spark, path, empty, "k") == 1
    assert ledger._manifest_versions(path) == [1]
