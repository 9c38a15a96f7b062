"""Catalog: schema routing, idempotent DDL, materializations, docs manifest.

Covers the reference's dbt-side catalog machinery (SURVEY.md §2.1):

- op 4  — idempotent DDL: ``CREATE TABLE IF NOT EXISTS raw.weather``
  (/root/reference/dags/weatherstack_full_pipeline.py:25-45);
- op 9  — view materialization for staging models
  (dbt/models/staging/stg_weather.sql:1-4, dbt_project.yml:26-28);
- op 10 — table materialization (full-refresh CTAS) for marts
  (dbt_project.yml:29-32);
- op 11 — ``generate_schema_name`` routing: a model's custom schema wins,
  else the target default (dbt/macros/schema.sql:1-7);
- op 29 — ``dbt docs generate`` terminal task → a JSON schema manifest of
  every registered relation (dags :166-169).

Spark mapping: databases in the session catalog named by the routing rule;
staging = temp views (Catalyst inlines and optimizes *through* them, so the
staging quality filter reaches every mart's scan); marts = saved tables.
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

from weather_api_automate_etl_spark.schemas import RAW_WEATHER


def resolve_schema(default_schema: str, custom_schema: str | None) -> str:
    """dbt ``generate_schema_name`` parity (macros/schema.sql:1-7):
    the model's custom schema wins outright, else the target default."""
    return custom_schema.strip() if custom_schema else default_schema


@dataclass
class Catalog:
    spark: SparkSession
    default_schema: str = "analytics"
    #: name → (qualified relation, materialization, schema json) for docs
    _registry: dict[str, tuple[str, str, str]] = field(default_factory=dict)

    def qualify(self, table: str, custom_schema: str | None = None) -> str:
        return f"{resolve_schema(self.default_schema, custom_schema)}.{table}"

    def ensure_database(self, schema: str) -> None:
        self.spark.sql(f"CREATE DATABASE IF NOT EXISTS {schema}")

    def create_raw_weather(self, custom_schema: str = "raw") -> str:
        """Idempotent DDL for the declared raw schema (op 4): CREATE TABLE
        IF NOT EXISTS with the §1.2 StructType; safe to run every batch."""
        self.ensure_database(resolve_schema(self.default_schema, custom_schema))
        name = self.qualify("weather", custom_schema)
        ddl = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in RAW_WEATHER.fields)
        self.spark.sql(f"CREATE TABLE IF NOT EXISTS {name} ({ddl}) USING parquet")
        self._register(name, "incremental_append")
        return name

    def materialize_view(self, df: DataFrame, table: str) -> str:
        """Staging materialization (op 9): a temp view — recomputed per
        query, zero storage, optimizer-transparent."""
        df.createOrReplaceTempView(table)
        self._registry[table] = (table, "view", df.schema.json())
        return table

    def materialize_table(
        self, df: DataFrame, table: str, custom_schema: str | None = None
    ) -> str:
        """Mart materialization (op 10): full-refresh CTAS each run."""
        self.ensure_database(resolve_schema(self.default_schema, custom_schema))
        name = self.qualify(table, custom_schema)
        df.write.mode("overwrite").saveAsTable(name)
        self._register(name, "table")
        return name

    def _register(self, name: str, materialization: str) -> None:
        self._registry[name] = (
            name,
            materialization,
            self.spark.table(name).schema.json(),
        )

    def docs_manifest(self) -> str:
        """op 29 — the docs-generation terminal task, as a JSON manifest of
        every registered relation (name, materialization, schema)."""
        return json.dumps(
            {
                name: {"relation": rel, "materialization": mat, "schema": json.loads(sch)}
                for name, (rel, mat, sch) in sorted(self._registry.items())
            },
            indent=2,
        )


#: The reference's dbt-macro surface as Spark SQL UDFs (CREATE FUNCTION …
#: RETURN <expr>): raw-SQL users get the same semantics-trap-correct
#: building blocks the DataFrame API exposes via functions/core.py —
#: Postgres day-of-week (0=Sunday), dbt_utils surrogate keys (sentinel +
#: '-' separator + md5), the ordered ILIKE recode, and inclusive range
#: bucketing. SQL UDFs inline into the plan (no BatchEvalPython — pinned
#: by test_catalog), so using them costs nothing over hand-expanding.
#: Timestamp params are TIMESTAMP_NTZ: the fixture's ts columns are NTZ,
#: and an LTZ param would insert an NTZ→LTZ cast through the session
#: timezone that shifts DST-gap wall times (the round-5 review finding).
_SQL_MACROS: tuple[tuple[str, str], ...] = (
    (
        "pg_dow",
        "CREATE OR REPLACE TEMPORARY FUNCTION pg_dow(ts TIMESTAMP_NTZ) "
        "RETURNS INT RETURN CAST(dayofweek(ts) - 1 AS INT)",
    ),
    (
        "pg_hour",
        "CREATE OR REPLACE TEMPORARY FUNCTION pg_hour(ts TIMESTAMP_NTZ) "
        "RETURNS INT RETURN CAST(hour(ts) AS INT)",
    ),
    (
        "surrogate_key2",
        "CREATE OR REPLACE TEMPORARY FUNCTION surrogate_key2"
        "(a STRING, b STRING) RETURNS STRING RETURN "
        "md5(concat_ws('-', coalesce(a, '_dbt_utils_surrogate_key_null_'), "
        "coalesce(b, '_dbt_utils_surrogate_key_null_')))",
    ),
    (
        "weather_category",
        "CREATE OR REPLACE TEMPORARY FUNCTION weather_category(d STRING) "
        "RETURNS STRING RETURN CASE "
        "WHEN contains(lower(d), 'sunny') THEN 'Clear' "
        "WHEN contains(lower(d), 'rain') THEN 'Rain' "
        "WHEN contains(lower(d), 'cloud') THEN 'Cloudy' "
        "ELSE trim(d) END",
    ),
    (
        # NB: reproduces the reference's inclusive-BETWEEN recode
        # byte-for-byte (stg_weather.sql:27-33, §2 op 15) INCLUDING its
        # integer-oriented band gaps — a fractional value in (10,11),
        # (20,21) or (30,31) falls through to the ELSE branch exactly as
        # it would in the reference. Fidelity over smoothness: q_range_-
        # bucket's oracle pins the same semantics on l_quantity.
        "quantity_bucket",
        "CREATE OR REPLACE TEMPORARY FUNCTION quantity_bucket(q DOUBLE) "
        "RETURNS STRING RETURN CASE "
        "WHEN q < 0 THEN 'Freezing' "
        "WHEN q BETWEEN 0 AND 10 THEN 'Cold' "
        "WHEN q BETWEEN 11 AND 20 THEN 'Mild' "
        "WHEN q BETWEEN 21 AND 30 THEN 'Warm' "
        "ELSE 'Hot' END",
    ),
)


def register_sql_macros(spark: SparkSession) -> list[str]:
    """Install the reference's macro surface as session-scoped SQL UDFs
    and return the registered names. Idempotent (CREATE OR REPLACE);
    call once per session before handing raw-SQL users the views from
    ``sources.tables.register_testdata``."""
    for _, ddl in _SQL_MACROS:
        spark.sql(ddl)
    return [name for name, _ in _SQL_MACROS]
