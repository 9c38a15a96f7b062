"""Silver layer — the reference's ``stg_weather`` model as a DataFrame fn.

Reimplements /root/reference/dbt/models/staging/stg_weather.sql (the whole
file, :6-42) natively: projection+rename, TRIM(UPPER()) normalization, the
ordered ILIKE recode, the inclusive range bucketing, DATE() truncation, and
the aberrant-row quality filter. In the reference this is a Postgres VIEW
(dbt_project.yml:26-28); here it's a lazily-evaluated DataFrame, so Catalyst
inlines it into every downstream mart and pushes the :39-42 filter into the
raw parquet scan (verified by PushedFilters in .explain).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from weather_api_automate_etl_spark.functions.core import (
    temperature_category,
    weather_category,
)


def stg_weather(raw: DataFrame) -> DataFrame:
    """raw.weather → stg_weather (stg_weather.sql:6-42)."""
    return (
        raw
        # WHERE temperature IS NOT NULL AND BETWEEN -50 AND 60 AND city IS NOT NULL
        # (stg_weather.sql:39-42) — placed before the projection so Catalyst
        # pushes it into the scan for every consumer of this view.
        .filter(
            F.col("temperature").isNotNull()
            & F.col("temperature").between(-50, 60)
            & F.col("city").isNotNull()
        )
        .select(
            # exact reference column set and names (stg_weather.sql:7-26):
            # `id` is NOT renamed, the raw description is NOT kept, and the
            # wind_direction / visibility / uv_index passthroughs survive.
            F.col("id"),
            F.trim(F.upper(F.col("city"))).alias("city_clean"),
            F.trim(F.upper(F.col("country"))).alias("country_clean"),
            F.col("temperature"),
            weather_category(F.col("weather_description")).alias("weather_category"),
            F.col("humidity"),
            F.col("wind_speed"),
            F.col("wind_direction"),
            F.col("pressure"),
            F.col("visibility"),
            F.col("uv_index"),
            F.col("observation_time"),
            F.col("extracted_at"),
            F.col("data_interval_start"),
            temperature_category(F.col("temperature")).alias("temperature_category"),
            F.to_date(F.col("extracted_at")).alias("extraction_date"),
        )
    )
