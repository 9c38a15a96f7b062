"""stg_weather / marts semantics on the FIXTURES.md §A edge-case rows."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F, types as T

from weather_api_automate_etl_spark.operators.marts import (
    dim_locations,
    fct_weather_observations,
    join_observations,
)
from weather_api_automate_etl_spark.operators.staging import stg_weather
from weather_api_automate_etl_spark.schemas import RAW_WEATHER

TS = dt.datetime(2024, 1, 7, 13, 0)  # a Sunday, 13:00


# Nullable twin of the declared schema: the reference declares city NOT NULL
# (dag :28) yet staging still filters null cities (stg_weather.sql:42) — the
# filter path needs null-bearing fixtures.
_NULLABLE_RAW = T.StructType(
    [T.StructField(f.name, f.dataType, True) for f in RAW_WEATHER.fields]
)


def _raw(spark, rows):
    base = {
        "id": 0, "city": "paris", "country": "france", "temperature": 15,
        "weather_description": "Sunny", "humidity": 50, "wind_speed": 10,
        "wind_direction": "NW", "pressure": 1000, "visibility": 10,
        "uv_index": 3, "observation_time": "01:00 PM", "extracted_at": TS,
        "data_interval_start": TS, "raw_json": "{}",
    }
    data = []
    for i, override in enumerate(rows):
        r = dict(base, id=i, **override)
        data.append(tuple(r[f.name] for f in RAW_WEATHER.fields))
    return spark.createDataFrame(data, _NULLABLE_RAW)


def test_quality_filter_drops_aberrant_rows(spark):
    # stg_weather.sql:39-42 — null/out-of-range temperature and null city drop
    raw = _raw(spark, [
        {"temperature": None},           # dropped
        {"temperature": -51},            # dropped
        {"temperature": -50},            # kept → Freezing
        {"temperature": 60},             # kept → Hot
        {"temperature": 61},             # dropped
        {"city": None},                  # dropped
    ])
    stg = stg_weather(raw)
    got = {r.id: r.temperature_category for r in stg.collect()}
    assert got == {2: "Freezing", 3: "Hot"}


def test_staging_normalizes_and_derives(spark):
    raw = _raw(spark, [{"city": "  paris ", "country": " france  "}])
    row = stg_weather(raw).head()
    assert row.city_clean == "PARIS" and row.country_clean == "FRANCE"
    assert row.extraction_date == dt.date(2024, 1, 7)


def test_dim_groups_and_counts(spark):
    # dup locations collapse to one dim row with total_observations=2
    raw = _raw(spark, [
        {"city": "paris "}, {"city": " PARIS"}, {"city": "london"},
    ])
    dim = dim_locations(stg_weather(raw))
    rows = {r.city: r.total_observations for r in dim.collect()}
    assert rows == {"PARIS": 2, "LONDON": 1}


def test_fct_dim_keys_agree_and_join(spark):
    # the star join joins every fact row (surrogate keys byte-identical)
    raw = _raw(spark, [{}, {"city": "london"}, {"country": None}])
    stg = stg_weather(raw)
    dim, fct = dim_locations(stg), fct_weather_observations(stg)
    joined = join_observations(fct, dim)
    assert joined.count() == fct.count() == 3
    assert fct.select("day_of_week", "extraction_hour").distinct().collect()[0][0:2] == (0, 13)


def test_category_closure(spark):
    # property: every surviving row lands in the declared category set
    raw = _raw(spark, [{"temperature": t} for t in range(-50, 61, 7)])
    cats = {r.temperature_category for r in stg_weather(raw).collect()}
    assert cats <= {"Freezing", "Cold", "Mild", "Warm", "Hot"}
