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
