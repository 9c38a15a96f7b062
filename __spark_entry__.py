"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

The real registry lives in ``weather_api_automate_etl_spark/queries.py`` —
one entry per SURVEY.md §2 operator plus the LLM-data-pipeline extensions.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from weather_api_automate_etl_spark import queries as _q  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    Runs the reference's full declared pipeline shape transplanted onto the
    fixtures: staging normalization → md5 surrogate keys → dim/fct marts →
    the implied broadcast star join with grouped revenue (SURVEY.md §2 op 22).
    """
    # The driver may build its own session; the engine's required configs
    # (UTC, ns-as-long parquet) are applied on the fly if absent.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    try:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    except Exception:  # noqa: BLE001 — immutable on some builds; events unused here
        pass
    return _q.REGISTRY["q_join_fct_dim"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 (+ extensions)."""
    return _q.queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB oracle twins; omitted keys get the driver's rows-only check."""
    return _q.oracle_sql()
