"""Declared schemas.

``RAW_WEATHER`` mirrors the reference's only authored DDL — the 15-column
``raw.weather`` table created at
/root/reference/dags/weatherstack_full_pipeline.py:25-43 — mapped to Spark
types per SURVEY.md §1.2 (SERIAL→long, VARCHAR/TEXT→string, INTEGER→int,
TIMESTAMP→timestamp_ntz, JSONB→string holding the raw JSON payload).

``TESTDATA_TABLES`` lists the driver fixture tables (TESTDATA.md) the
oracle-checked queries run on.
"""

from __future__ import annotations

from pyspark.sql import types as T

RAW_WEATHER = T.StructType(
    [
        T.StructField("id", T.LongType(), False),
        T.StructField("city", T.StringType(), False),
        T.StructField("country", T.StringType(), True),
        T.StructField("temperature", T.IntegerType(), True),
        T.StructField("weather_description", T.StringType(), True),
        T.StructField("humidity", T.IntegerType(), True),
        T.StructField("wind_speed", T.IntegerType(), True),
        T.StructField("wind_direction", T.StringType(), True),
        T.StructField("pressure", T.IntegerType(), True),
        T.StructField("visibility", T.IntegerType(), True),
        T.StructField("uv_index", T.IntegerType(), True),
        T.StructField("observation_time", T.StringType(), True),
        T.StructField("extracted_at", T.TimestampNTZType(), False),
        T.StructField("data_interval_start", T.TimestampNTZType(), True),
        T.StructField("raw_json", T.StringType(), True),
    ]
)

# Shape of the Weatherstack API response actually consumed by the reference
# (dags/weatherstack_full_pipeline.py:80-107): location.{name,country},
# current.{temperature, weather_descriptions[], humidity, wind_speed,
# wind_dir, pressure, visibility, uv_index, observation_time}, optional error.
WEATHERSTACK_RESPONSE = T.StructType(
    [
        T.StructField(
            "location",
            T.StructType(
                [
                    T.StructField("name", T.StringType(), True),
                    T.StructField("country", T.StringType(), True),
                ]
            ),
            True,
        ),
        T.StructField(
            "current",
            T.StructType(
                [
                    T.StructField("temperature", T.IntegerType(), True),
                    T.StructField("weather_descriptions", T.ArrayType(T.StringType()), True),
                    T.StructField("humidity", T.IntegerType(), True),
                    T.StructField("wind_speed", T.IntegerType(), True),
                    T.StructField("wind_dir", T.StringType(), True),
                    T.StructField("pressure", T.IntegerType(), True),
                    T.StructField("visibility", T.IntegerType(), True),
                    T.StructField("uv_index", T.IntegerType(), True),
                    T.StructField("observation_time", T.StringType(), True),
                ]
            ),
            True,
        ),
        T.StructField(
            "error",
            T.StructType(
                [
                    T.StructField("code", T.IntegerType(), True),
                    T.StructField("type", T.StringType(), True),
                    T.StructField("info", T.StringType(), True),
                ]
            ),
            True,
        ),
    ]
)

TESTDATA_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)
