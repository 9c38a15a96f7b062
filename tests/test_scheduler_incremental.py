"""Scheduler (catchup=False parity) + incremental mart refresh."""


from __future__ import annotations

import pytest

import datetime as dt

from pyspark.sql import functions as F

from weather_api_automate_etl_spark.plans import incremental, pipeline, scheduler


def test_interval_start_is_last_complete_day():
    now = dt.datetime(2026, 8, 13, 7, 30)
    assert scheduler.interval_start(now) == dt.datetime(2026, 8, 12)


def test_tick_runs_once_and_skips_when_current(tmp_path):
    ran = []
    s = scheduler.DailyScheduler(str(tmp_path / "wm.json"), ran.append)
    now = dt.datetime(2026, 8, 13, 7, 30)
    assert s.tick(now) == dt.datetime(2026, 8, 12)
    assert s.tick(now) is None                     # already current
    assert s.tick(now + dt.timedelta(hours=5)) is None
    assert s.tick(now + dt.timedelta(days=1)) == dt.datetime(2026, 8, 13)
    assert ran == [dt.datetime(2026, 8, 12), dt.datetime(2026, 8, 13)]


def test_no_catchup_after_downtime(tmp_path):
    ran = []
    s = scheduler.DailyScheduler(str(tmp_path / "wm.json"), ran.append)
    s.tick(dt.datetime(2026, 8, 1, 6))
    # a week of downtime: catchup=False → only the latest interval runs
    s.tick(dt.datetime(2026, 8, 8, 6))
    assert ran == [dt.datetime(2026, 7, 31), dt.datetime(2026, 8, 7)]
    # explicit backfill fills the gap — but never re-runs the completed
    # 8/7 interval (append-style sinks must not double up)
    filled = s.backfill(dt.datetime(2026, 8, 1), dt.datetime(2026, 8, 8, 6))
    assert filled == [dt.datetime(2026, 8, d) for d in range(1, 7)]


@pytest.mark.slow
def test_incremental_refresh_touches_only_recent_partitions(spark, tmp_path):
    raw, mart = str(tmp_path / "raw"), str(tmp_path / "marts")
    p = pipeline.WeatherPipeline(
        spark, raw_path=raw, marts_path=mart, pin_extracted_at=True
    )
    p.run(dt.datetime(2026, 1, 1))
    p.run(dt.datetime(2026, 1, 2))

    written = incremental.refresh_incremental(
        spark, raw, mart, since=dt.date(2026, 1, 2)
    )
    # fct refresh covered only day 2 (7 cities), dim covers full history
    assert written["fct_weather_observations"] == 7
    assert written["dim_locations"] >= 1
    # but the mart still contains BOTH days (day-1 partition untouched)
    fct = spark.read.parquet(f"{mart}/fct_weather_observations")
    days = {r.extraction_date for r in fct.select("extraction_date").distinct().collect()}
    assert len(days) == 2 and fct.count() == 14
