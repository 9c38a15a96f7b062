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


def test_sql_macros_register_and_inline(spark):
    """The dbt-macro SQL UDF surface: registered functions must agree with
    the functions/core.py expressions AND inline into the plan (no Python
    boundary — a SQL UDF is an expression substitution)."""
    from weather_api_automate_etl_spark.sources.catalog import register_sql_macros

    names = register_sql_macros(spark)
    assert {"pg_dow", "pg_hour", "surrogate_key2", "weather_category",
            "quantity_bucket"} <= set(names)
    row = spark.sql(
        """
        SELECT pg_dow(TIMESTAMP_NTZ '2024-01-07 10:30:00') AS dow,
               pg_hour(TIMESTAMP_NTZ '2024-01-07 10:30:00') AS hr,
               surrogate_key2('paris', NULL) AS sk,
               weather_category('Sunny with rain') AS cat,
               quantity_bucket(10.0) AS b
        """
    ).head()
    assert row["dow"] == 0  # 2024-01-07 is a Sunday; Postgres dow 0=Sunday
    assert row["hr"] == 10
    # dbt_utils sentinel + '-' separator, byte-exact vs functions/core.py
    import hashlib

    assert row["sk"] == hashlib.md5(
        b"paris-_dbt_utils_surrogate_key_null_"
    ).hexdigest()
    assert row["cat"] == "Clear"  # branch order: sunny wins over rain
    assert row["b"] == "Cold"  # inclusive upper bound
    plan = (
        spark.sql("SELECT pg_dow(TIMESTAMP_NTZ '2024-01-07 10:30:00')")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BatchEvalPython" not in plan
    # idempotent: CREATE OR REPLACE registers cleanly twice
    register_sql_macros(spark)
