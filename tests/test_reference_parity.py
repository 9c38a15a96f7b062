"""Reference parity: the declared stg_weather SQL semantics (SURVEY.md §2,
transcribed from the documented behavior of stg_weather.sql:6-42) executed
by DuckDB over the FIXTURES.md edge-case rows must agree with our
DataFrame operator row-for-row — the strongest form of "same capabilities".
"""

from __future__ import annotations

import datetime as dt

import duckdb
import pytest
from pyspark.sql import types as T

from weather_api_automate_etl_spark.operators.staging import stg_weather
from weather_api_automate_etl_spark.schemas import RAW_WEATHER

TS = dt.datetime(2024, 1, 7, 13, 0)  # Sunday 13:00

# The declared staging semantics as ANSI SQL (from the survey's operator
# inventory ops 12-17: TRIM/UPPER normalize, ordered ILIKE recode, range
# buckets with inclusive BETWEEN, DATE(), aberrant-row filter).
STG_SQL = """
SELECT
  id,
  trim(upper(city)) AS city_clean,
  trim(upper(country)) AS country_clean,
  temperature,
  wind_direction,
  visibility,
  uv_index,
  CASE WHEN weather_description ILIKE '%sunny%' THEN 'Clear'
       WHEN weather_description ILIKE '%rain%'  THEN 'Rain'
       WHEN weather_description ILIKE '%cloud%' THEN 'Cloudy'
       ELSE trim(weather_description) END AS weather_category,
  CASE WHEN temperature < 0 THEN 'Freezing'
       WHEN temperature BETWEEN 0  AND 10 THEN 'Cold'
       WHEN temperature BETWEEN 11 AND 20 THEN 'Mild'
       WHEN temperature BETWEEN 21 AND 30 THEN 'Warm'
       ELSE 'Hot' END AS temperature_category,
  CAST(extracted_at AS DATE) AS extraction_date
FROM raw_weather
WHERE temperature IS NOT NULL
  AND temperature BETWEEN -50 AND 60
  AND city IS NOT NULL
"""

EDGE_ROWS = [
    # (id, city, country, temperature, description) — FIXTURES.md §A set
    (0, "PARIS", "FRANCE", None, "Sunny"),
    (1, "OSLO", "NORWAY", -51, "Snow"),
    (2, "OSLO", "NORWAY", -50, "Snow"),
    (3, "DUBAI", "UAE", 60, "Sunny"),
    (4, "DUBAI", "UAE", 61, "Sunny"),
    (5, None, "FRANCE", 20, "Sunny"),
    (6, "  paris ", " france  ", 15, "SUNNY spells"),
    (7, "LYON", "FRANCE", 15, "sunny with rain"),
    (8, "LYON", "FRANCE", 15, "Light rain"),
    (9, "LYON", "FRANCE", 15, "Partly cloudy"),
    (10, "LYON", "FRANCE", 15, "  Mist  "),
    *[(11 + i, "NICE", "FRANCE", t, "any") for i, t in enumerate([-1, 0, 10, 11, 20, 21, 30, 31])],
]


@pytest.fixture()
def raw_rows():
    base = dict(
        humidity=50, wind_speed=10, wind_direction="NW", pressure=1000,
        visibility=10, uv_index=3, observation_time="01:00 PM",
        extracted_at=TS, data_interval_start=TS, raw_json="{}",
    )
    return [
        dict(base, id=i, city=c, country=co, temperature=t, weather_description=d)
        for (i, c, co, t, d) in EDGE_ROWS
    ]


def test_stg_weather_matches_declared_sql(spark, raw_rows, tmp_path):
    nullable = T.StructType([T.StructField(f.name, f.dataType, True) for f in RAW_WEATHER.fields])
    df = spark.createDataFrame(
        [tuple(r[f.name] for f in nullable.fields) for r in raw_rows], nullable
    )
    path = str(tmp_path / "raw_weather.parquet")
    df.coalesce(1).write.mode("overwrite").parquet(path)

    con = duckdb.connect()
    con.execute(f"CREATE VIEW raw_weather AS SELECT * FROM '{path}/*.parquet'")
    expected = {
        r[0]: r[1:]
        for r in con.execute(STG_SQL).fetchall()
    }

    got = {
        r.id: (
            r.city_clean, r.country_clean, r.temperature,
            r.wind_direction, r.visibility, r.uv_index,
            r.weather_category, r.temperature_category, r.extraction_date,
        )
        for r in stg_weather(df)
        .select(
            "id", "city_clean", "country_clean", "temperature",
            "wind_direction", "visibility", "uv_index",
            "weather_category", "temperature_category", "extraction_date",
        )
        .collect()
    }
    assert got == expected
    # the documented drops happened: null temp, out-of-range, null city
    assert {0, 1, 4, 5}.isdisjoint(got)
