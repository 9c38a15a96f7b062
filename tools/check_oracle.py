"""Local replica of the driver's correctness gate.

Runs every registry query on Spark AND its DuckDB oracle at the given sf,
then compares row count, sorted column names, and order-insensitive values.
Usage: python tools/check_oracle.py [--hostile] [sf_dir] [query ...]

``--hostile`` swaps the engine's session factory for a deliberately
adversarial one (non-UTC timezone, no nanosAsLong conf, odd shuffle
partitioning) — the driver builds its OWN session, so every query must
self-heal its required confs, not just the ones the smoke drive touches.
"""

from __future__ import annotations

import datetime as dt
import math
import sys

import duckdb

sys.path.insert(0, "/root/repo")

from weather_api_automate_etl_spark.queries import REGISTRY, _load_extensions  # noqa: E402

_load_extensions()
from weather_api_automate_etl_spark.schemas import TESTDATA_TABLES  # noqa: E402
from weather_api_automate_etl_spark.session import get_spark  # noqa: E402


def canon(v):
    """Canonical comparable form of a cell value."""
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(round(v, 9))
    if isinstance(v, dt.datetime):
        return v.isoformat()
    if isinstance(v, dt.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(canon(x) for x in v) + "]"
    return str(v)


def frame_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(canon(r[i]) for i in order) for r in rows)


def _hostile_spark():
    from pyspark.sql import SparkSession

    return (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.session.timeZone", "America/New_York")
        .config("spark.sql.shuffle.partitions", "13")
        .config("spark.ui.showConsoleProgress", "false")
        .appName("oracle-check-hostile")
        .getOrCreate()
    )


def main() -> int:
    args = [a for a in sys.argv[1:] if a != "--hostile"]
    hostile = "--hostile" in sys.argv[1:]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    only = set(args[1:])
    spark = _hostile_spark() if hostile else get_spark("oracle-check", shuffle_partitions=8)
    con = duckdb.connect()
    for name in TESTDATA_TABLES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM '{sf_dir}/{name}.parquet'"
        )
    failures = []
    for name, spec in REGISTRY.items():
        if only and name not in only:
            continue
        if hostile:
            # the engine's conf self-healing (load_table) PERSISTS on the
            # shared session, so without re-poisoning per query only the
            # FIRST query actually faces the hostile confs
            spark.conf.set("spark.sql.session.timeZone", "America/New_York")
            try:
                spark.conf.unset("spark.sql.legacy.parquet.nanosAsLong")
            except Exception:  # noqa: BLE001 — not set yet on the first query
                pass
        try:
            sdf = spec.fn(spark, sf_dir)
            s_cols = sdf.columns
            s_rows = [tuple(r) for r in sdf.collect()]
        except Exception as e:  # noqa: BLE001
            failures.append((name, f"spark error: {e}"))
            print(f"FAIL  {name}: spark error: {e}")
            continue
        # The external harness canonicalizes through a pandas sort, which
        # cannot hash list/dict-valued cells: any complex-typed output column
        # on an oracle-backed query would pass here but fail there (round-1
        # q_array_agg). Fail locally instead.
        if spec.oracle is not None:
            complex_cols = [
                f.name
                for f in sdf.schema.fields
                if f.dataType.typeName() in ("array", "map", "struct")
            ]
            if complex_cols:
                msg = f"complex-typed output columns break driver canon: {complex_cols}"
                failures.append((name, msg))
                print(f"FAIL  {name}: {msg}")
                continue
        if spec.oracle is None:
            print(f"ok    {name}: rows-only ({len(s_rows)} rows, no oracle)")
            continue
        try:
            res = con.execute(spec.oracle)
            d_cols = [d[0] for d in res.description]
            d_rows = res.fetchall()
        except Exception as e:  # noqa: BLE001
            failures.append((name, f"duckdb error: {e}"))
            print(f"FAIL  {name}: duckdb error: {e}")
            continue
        problems = []
        if sorted(s_cols) != sorted(d_cols):
            problems.append(f"columns spark={sorted(s_cols)} duckdb={sorted(d_cols)}")
        if len(s_rows) != len(d_rows):
            problems.append(f"rowcount spark={len(s_rows)} duckdb={len(d_rows)}")
        if not problems:
            a, b = frame_rows(s_cols, s_rows), frame_rows(d_cols, d_rows)
            if a != b:
                diff = [(x, y) for x, y in zip(a, b) if x != y][:3]
                problems.append(f"values differ; first diffs: {diff}")
        if problems:
            failures.append((name, "; ".join(problems)))
            print(f"FAIL  {name}: {'; '.join(problems)}")
        else:
            print(f"ok    {name}: {len(s_rows)} rows match")
    print(f"\n{len(REGISTRY) - len(failures)}/{len(REGISTRY)} queries match")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
