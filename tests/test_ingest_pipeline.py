"""Ingestion source + end-to-end pipeline runner (DAG parity)."""

from __future__ import annotations

import datetime as dt

import pytest

from weather_api_automate_etl_spark.plans import pipeline
from weather_api_automate_etl_spark.sources import json_ingest, rest

BATCH = dt.datetime(2026, 1, 1)


def test_fetch_routes_transport_errors(spark):
    def flaky(city: str) -> str:
        if city == "Boom":
            raise ConnectionError("socket closed")
        return rest.fake_fetcher(city)

    fetched = rest.fetch_locations(spark, ["Paris", "Boom"], flaky)
    ok, failed = rest.split_errors(fetched)
    assert ok.count() == 1 and failed.count() == 1
    assert "ConnectionError" in failed.head().fetch_error


def test_decode_routes_api_errors_and_extracts(spark):
    # 'Xanadu' triggers the fake API error envelope (dag :75-77 semantics);
    # 'NoWhere' exercises the location.name fallback via a minimal payload.
    fetched = rest.fetch_locations(spark, ["Paris", "Xanadu"], rest.fake_fetcher)
    ok, _ = rest.split_errors(fetched)
    decoded = json_ingest.decode_payloads(ok)
    obs = json_ingest.extract_observations(decoded, BATCH)
    errs = json_ingest.error_records(decoded)
    assert obs.count() == 1 and errs.count() == 1
    row = obs.head()
    assert row.city == "Paris" and row.data_interval_start == BATCH
    assert row.weather_description in {"Sunny", "Light rain", "Partly cloudy"}
    err = errs.head()
    assert err.error_kind == "api_error" and err.api_error_code == 615


def test_decode_routes_null_payload_rows_to_errors(spark):
    # round-12 review: a NULL raw_json (transport failure reaching decode
    # because the caller skipped split_errors) must route to the error
    # channel, never pass downstream as an all-NULL "good" observation
    fetched = spark.createDataFrame(
        [("Ghent", '{"current": {"temperature": 5}}'), ("Lost", None)],
        "city string, raw_json string",
    )
    decoded = json_ingest.decode_payloads(fetched)
    obs = json_ingest.extract_observations(decoded, BATCH)
    errs = json_ingest.error_records(decoded)
    assert [r.city for r in obs.collect()] == ["Ghent"]
    err = errs.head()
    assert err.city == "Lost" and err.error_kind == "parse_error"


def test_extract_falls_back_to_queried_city(spark):
    fetched = spark.createDataFrame(
        [("Ghent", '{"current": {"temperature": 5}}')], "city string, raw_json string"
    )
    obs = json_ingest.extract_observations(
        json_ingest.decode_payloads(fetched), BATCH
    )
    assert obs.head().city == "Ghent"  # location.get('name', city), dag :96


def test_pipeline_end_to_end(spark, tmp_path):
    p = pipeline.WeatherPipeline(
        spark,
        raw_path=str(tmp_path / "raw"),
        marts_path=str(tmp_path / "marts"),
    )
    results = p.run(BATCH)
    assert [r.name for r in results] == [
        "extract_and_load", "build_staging", "test_staging", "build_marts", "test_marts",
    ]
    assert all(r.error is None for r in results)
    dim = spark.read.parquet(str(tmp_path / "marts/dim_locations"))
    fct = spark.read.parquet(str(tmp_path / "marts/fct_weather_observations"))
    assert dim.count() > 0 and fct.count() > 0
    # star keys agree: every fact row joins
    assert fct.join(dim, "location_key").count() == fct.count()


def test_stage_retries_then_succeeds():
    attempts = []

    def flaky():
        attempts.append(1)
        if len(attempts) < 3:
            raise RuntimeError("transient")

    res = pipeline.run_stages([pipeline.Stage("s", flaky, retries=2)])
    assert res[0].attempts == 3 and res[0].error is None


def test_stage_fails_fast_after_retries():
    def dead():
        raise RuntimeError("permanent")

    with pytest.raises(pipeline.PipelineFailure, match="permanent"):
        pipeline.run_stages([pipeline.Stage("s", dead, retries=1)])
