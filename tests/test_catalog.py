"""Catalog ops: schema routing, idempotent DDL, materializations, manifest."""

from __future__ import annotations

import json

from pyspark.sql import Row

from weather_api_automate_etl_spark.sources.catalog import Catalog, resolve_schema


def test_resolve_schema_custom_wins():
    # dbt macros/schema.sql:1-7 — custom schema wins, else target default
    assert resolve_schema("analytics", "raw") == "raw"
    assert resolve_schema("analytics", " marts ") == "marts"
    assert resolve_schema("analytics", None) == "analytics"
    assert resolve_schema("analytics", "") == "analytics"


def test_idempotent_ddl_and_manifest(spark):
    cat = Catalog(spark)
    name = cat.create_raw_weather()
    assert name == "raw.weather"
    cat.create_raw_weather()  # CREATE TABLE IF NOT EXISTS — safe to re-run
    assert spark.table(name).columns[:2] == ["id", "city"]

    cat.materialize_view(
        spark.createDataFrame([Row(x=1)]), "stg_demo"
    )
    manifest = json.loads(cat.docs_manifest())
    assert manifest["raw.weather"]["materialization"] == "incremental_append"
    assert manifest["stg_demo"]["materialization"] == "view"
    assert {f["name"] for f in manifest["stg_demo"]["schema"]["fields"]} == {"x"}
    spark.sql("DROP TABLE IF EXISTS raw.weather")
    spark.sql("DROP DATABASE IF EXISTS raw")


def test_materialize_table_full_refresh(spark):
    cat = Catalog(spark, default_schema="default")
    df1 = spark.createDataFrame([Row(x=1), Row(x=2)])
    df2 = spark.createDataFrame([Row(x=9)])
    name = cat.materialize_table(df1, "mart_demo")
    assert spark.table(name).count() == 2
    cat.materialize_table(df2, "mart_demo")  # full refresh replaces
    assert [r.x for r in spark.table(name).collect()] == [9]
    spark.sql("DROP TABLE IF EXISTS default.mart_demo")
