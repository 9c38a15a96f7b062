"""Golden-fixture tests for the semantics-trap expressions (FIXTURES.md §A).

Every expected value cites the reference behavior it locks in
(file:line under /root/reference)."""

from __future__ import annotations

import datetime as dt
import hashlib

from pyspark.sql import Row, functions as F

from weather_api_automate_etl_spark.functions.core import (
    SURROGATE_NULL_SENTINEL,
    pg_dow,
    pg_hour,
    surrogate_key,
    temperature_category,
    weather_category,
)


def test_temperature_bucket_edges(spark):
    # stg_weather.sql:27-33 — BETWEEN inclusive; edges land in lower bucket.
    cases = {-51: "Freezing", -1: "Freezing", 0: "Cold", 10: "Cold", 11: "Mild",
             20: "Mild", 21: "Warm", 30: "Warm", 31: "Hot", 60: "Hot"}
    df = spark.createDataFrame([(t,) for t in cases], "temperature int")
    got = {r.temperature: r.bucket for r in
           df.select("temperature", temperature_category("temperature").alias("bucket")).collect()}
    assert got == cases


def test_weather_category_order_and_case(spark):
    # stg_weather.sql:11-16 — ILIKE case-insensitive; first branch wins;
    # ELSE trims.
    cases = [
        ("SUNNY spells", "Clear"),
        ("sunny with rain", "Clear"),  # first-match-wins
        ("Light rain", "Rain"),
        ("Partly cloudy", "Cloudy"),
        ("  Mist  ", "Mist"),  # ELSE TRIM
    ]
    df = spark.createDataFrame([(c[0],) for c in cases], "d string")
    got = [r.c for r in df.select(weather_category("d").alias("c")).collect()]
    assert got == [c[1] for c in cases]


def test_surrogate_key_matches_dbt_utils(spark):
    # dim_locations.sql:7 via dbt_utils 1.3.1: md5('PARIS' || '-' || 'FRANCE')
    df = spark.createDataFrame([Row(city="PARIS", country="FRANCE")])
    got = df.select(surrogate_key("city", "country").alias("k")).head().k
    assert got == hashlib.md5(b"PARIS-FRANCE").hexdigest()


def test_surrogate_key_null_sentinel(spark):
    # null country → '_dbt_utils_surrogate_key_null_' replaces the value
    df = spark.createDataFrame([("PARIS", None)], "city string, country string")
    got = df.select(surrogate_key("city", "country").alias("k")).head().k
    expect = hashlib.md5(f"PARIS-{SURROGATE_NULL_SENTINEL}".encode()).hexdigest()
    assert got == expect


def test_pg_dow_sunday_is_zero(spark):
    # fct_weather_observations.sql:22 — Postgres dow: 0=Sunday..6=Saturday.
    # 2024-01-07 was a Sunday; 2024-01-13 a Saturday.
    df = spark.createDataFrame(
        [(dt.datetime(2024, 1, 7, 13, 0),), (dt.datetime(2024, 1, 13, 1, 0),)],
        "ts timestamp_ntz",
    )
    got = [(r.dow, r.hr) for r in
           df.select(pg_dow("ts").alias("dow"), pg_hour("ts").alias("hr")).collect()]
    assert got == [(0, 13), (6, 1)]
