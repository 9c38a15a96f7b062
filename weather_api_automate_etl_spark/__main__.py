"""CLI — run the engine the way the reference is run via Airflow triggers.

Usage:
  python -m weather_api_automate_etl_spark pipeline --raw PATH --marts PATH
      [--date YYYY-MM-DD] [--cities A B C] [--pin-extracted-at]
  python -m weather_api_automate_etl_spark tick --raw PATH --marts PATH --state PATH
  python -m weather_api_automate_etl_spark incremental --raw PATH --marts PATH --since YYYY-MM-DD
  python -m weather_api_automate_etl_spark bench

``pipeline`` runs one batch (the DAG end-to-end); ``tick`` consults the
scheduler state and runs the latest complete daily interval if pending
(catchup=False); ``incremental`` refreshes only recent mart partitions.
"""

from __future__ import annotations

import argparse
import datetime as dt
import sys


def main(argv: list[str] | None = None) -> int:
    parser = argparse.ArgumentParser(prog="weather_api_automate_etl_spark")
    sub = parser.add_subparsers(dest="cmd", required=True)

    def add_paths(p: argparse.ArgumentParser) -> None:
        p.add_argument("--raw", required=True, help="raw layer parquet dir")
        p.add_argument("--marts", required=True, help="marts parquet dir")

    p_pipe = sub.add_parser("pipeline", help="run one batch end-to-end")
    add_paths(p_pipe)
    p_pipe.add_argument("--date", default=None, help="data_interval_start (YYYY-MM-DD)")
    p_pipe.add_argument("--cities", nargs="*", default=None)
    p_pipe.add_argument("--pin-extracted-at", action="store_true")

    p_tick = sub.add_parser("tick", help="scheduler tick (catchup=False)")
    add_paths(p_tick)
    p_tick.add_argument("--state", required=True, help="scheduler state JSON path")

    p_inc = sub.add_parser("incremental", help="refresh recent mart partitions")
    add_paths(p_inc)
    p_inc.add_argument("--since", required=True, help="refresh partitions >= date")

    sub.add_parser("bench", help="run the benchmark harness")

    args = parser.parse_args(argv)

    if args.cmd == "bench":
        import bench

        bench.main()
        return 0

    from pyspark.sql import SparkSession

    from weather_api_automate_etl_spark.session import get_spark

    # only own (and stop) the session if nobody created one before us —
    # get_spark is getOrCreate, so an embedding process keeps its session
    pre_existing = SparkSession.getActiveSession() is not None
    spark = get_spark("weather-etl-cli")
    try:
        if args.cmd == "pipeline":
            from weather_api_automate_etl_spark.plans.pipeline import WeatherPipeline

            start = (
                dt.datetime.fromisoformat(args.date)
                if args.date
                else dt.datetime.now(dt.UTC).replace(tzinfo=None)
            )
            kwargs = {"pin_extracted_at": args.pin_extracted_at}
            if args.cities:
                kwargs["cities"] = args.cities
            results = WeatherPipeline(spark, args.raw, args.marts, **kwargs).run(start)
            for r in results:
                print(f"{r.name}: ok ({r.attempts} attempt(s), {r.seconds:.1f}s)")
        elif args.cmd == "tick":
            from weather_api_automate_etl_spark.plans.pipeline import WeatherPipeline
            from weather_api_automate_etl_spark.plans.scheduler import DailyScheduler

            pipe = WeatherPipeline(spark, args.raw, args.marts, pin_extracted_at=True)
            ran = DailyScheduler(args.state, pipe.run).tick(
                dt.datetime.now(dt.UTC).replace(tzinfo=None)
            )
            print(f"ran interval: {ran}" if ran else "up to date")
        elif args.cmd == "incremental":
            from weather_api_automate_etl_spark.plans.incremental import (
                refresh_incremental,
            )

            written = refresh_incremental(
                spark, args.raw, args.marts, dt.date.fromisoformat(args.since)
            )
            for mart, n in written.items():
                print(f"{mart}: {n} rows")
    finally:
        if not pre_existing:
            spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
