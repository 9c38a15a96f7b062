"""CSV/JSONL bad-record routing + small-file compaction."""


from __future__ import annotations

import pytest

from pathlib import Path

from pyspark.sql import functions as F, types as T

from weather_api_automate_etl_spark.sources import formats

SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("name", T.StringType()),
        T.StructField("score", T.DoubleType()),
    ]
)


def test_read_csv_routes_bad_rows(spark, tmp_path):
    p = tmp_path / "in.csv"
    p.write_text(
        "id,name,score\n"
        "1,alice,0.5\n"
        "not_a_number,bob,0.7\n"   # bad: id fails conversion
        "3,carol,0.9\n"
    )
    good, bad = formats.read_csv(spark, str(p), SCHEMA)
    assert sorted(r.id for r in good.collect()) == [1, 3]
    bad_rows = bad.collect()
    assert len(bad_rows) == 1 and "not_a_number" in bad_rows[0].raw_record


def test_read_jsonl_routes_bad_rows(spark, tmp_path):
    p = tmp_path / "in.jsonl"
    p.write_text(
        '{"id": 1, "name": "alice", "score": 0.5}\n'
        "this is not json\n"
        '{"id": 3, "name": "carol", "score": 0.9}\n'
    )
    good, bad = formats.read_jsonl(spark, str(p), SCHEMA)
    assert sorted(r.id for r in good.collect()) == [1, 3]
    assert bad.count() == 1


def test_orc_roundtrip_and_pushdown(spark, tmp_path):
    from weather_api_automate_etl_spark.sources import formats
    from weather_api_automate_etl_spark.sources.tables import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    path = str(tmp_path / "docs_orc")
    formats.write_orc(docs, path)
    back = formats.read_orc(spark, path, docs.schema)
    assert back.count() == docs.count()
    assert sorted(r.doc_id for r in back.collect()) == sorted(
        r.doc_id for r in docs.collect()
    )
    # filters/pruning reach the ORC scan like they do for parquet
    plan = (
        back.filter(F.col("doc_id") > 100).select("doc_id", "lang")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "PushedFilters: [IsNotNull(doc_id), GreaterThan(doc_id,100)" in plan
    assert "ReadSchema: struct<doc_id:bigint,lang:string>" in plan


def test_compact_small_files(spark, tmp_path):
    path = str(tmp_path / "frag")
    spark.range(10_000).repartition(24).write.parquet(path)
    assert len(list(Path(path).rglob("*.parquet"))) == 24
    n = formats.compact_small_files(spark, path, target_file_bytes=10**9)
    files = list(Path(path).rglob("*.parquet"))
    assert n == 1 and len(files) == 1
    assert spark.read.parquet(path).count() == 10_000


@pytest.mark.slow
def test_cli_pipeline_and_incremental(spark, tmp_path):
    # drive the __main__ entry points in-process (same session via getOrCreate)
    from weather_api_automate_etl_spark.__main__ import main

    raw, marts = str(tmp_path / "raw"), str(tmp_path / "marts")
    rc = main(
        ["pipeline", "--raw", raw, "--marts", marts,
         "--date", "2026-01-01", "--pin-extracted-at"]
    )
    assert rc == 0
    # the CLI must NOT have stopped the pre-existing (test) session
    assert spark.read.parquet(f"{marts}/fct_weather_observations").count() == 7
    rc = main(["incremental", "--raw", raw, "--marts", marts, "--since", "2026-01-01"])
    assert rc == 0
