"""Round-5 fifth-wave queries: blocked fuzzy matching (entity
resolution), data-freshness checks, join-key skew profiling, and
cumulative-distinct windows.

Per-query rationale lives in each function docstring; registry/oracle
conventions in queries.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from weather_api_automate_etl_spark.operators import dedup, quality, stats, timeseries
from weather_api_automate_etl_spark.queries import query, t

# ---------------------------------------------------------------------------
# blocked fuzzy match (entity resolution on dirty names)
# ---------------------------------------------------------------------------

# threshold 2 on the fixture's two-word names: exact-duplicate and
# near-identical names match; the bulk of in-block pairs (d >= 3 — a
# different word) do not. d=10 would accept ~every in-block pair here.
_FUZZY_MAX_DIST = 2


@query(
    "q_fuzzy_match",
    oracle=f"""
    SELECT a.p_partkey AS p1, b.p_partkey AS p2, a.p_brand,
           CAST(levenshtein(a.p_name, b.p_name) AS INTEGER) AS dist
    FROM part a JOIN part b
      ON a.p_brand = b.p_brand AND a.p_partkey < b.p_partkey
    WHERE levenshtein(a.p_name, b.p_name) <= {_FUZZY_MAX_DIST}
    """,
    tags=("dedup", "joins", "text"),
)
def q_fuzzy_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy name matching inside brand blocks: part-name pairs within
    Levenshtein distance 2 — the entity-resolution primitive (dirty
    catalog/vendor/customer names) that exact and shingle dedup both
    miss. BLOCKED on the brand key so the quadratic pair set is per-block
    only (the LSH-bucket discipline — never all-pairs across the
    catalog; with no natural block, LSH over name shingles provides
    one). ``levenshtein`` is the JVM built-in — unit-cost edit distance,
    identical on both engines — evaluated only inside blocks."""
    return dedup.fuzzy_match_blocked(
        t(spark, sf_dir, "part"),
        "p_partkey",
        "p_brand",
        "p_name",
        max_dist=_FUZZY_MAX_DIST,
    )


# ---------------------------------------------------------------------------
# data freshness (staleness per stream, relative to the corpus watermark)
# ---------------------------------------------------------------------------

_STALE_AFTER_S = 3600


@query(
    "q_freshness",
    oracle=f"""
    WITH g AS (SELECT max(CAST(ts AS TIMESTAMP)) AS gmax FROM events),
    last AS (
      SELECT event_type, max(CAST(ts AS TIMESTAMP)) AS last_ts,
             CAST(count(*) AS BIGINT) AS n_events
      FROM events GROUP BY event_type
    )
    SELECT l.event_type, l.last_ts, l.n_events,
           CAST(date_diff('second', l.last_ts, g.gmax) AS BIGINT)
             AS lag_seconds,
           date_diff('second', l.last_ts, g.gmax) > {_STALE_AFTER_S}
             AS is_stale
    FROM last l, g
    """,
    tags=("quality", "timeseries", "agg"),
)
def q_freshness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-stream freshness: each event_type's last event time, its lag
    behind the corpus watermark (the global max — wall clock would make
    the check non-reproducible), and a staleness flag at 1 h — the
    data-quality monitor that catches a silently dead upstream before a
    day of marts build on stale partitions. Two map-side-combined
    aggregates and a 1-row broadcast; second-granularity lag floors
    identically on both engines."""
    return quality.freshness(
        t(spark, sf_dir, "events"), "event_type", "ts",
        stale_after_s=_STALE_AFTER_S,
    )


# ---------------------------------------------------------------------------
# join-key skew profile (the diagnostic that motivates the salted family)
# ---------------------------------------------------------------------------

_SKEW_TOP_K = 10


@query(
    "q_skew_profile",
    oracle=f"""
    WITH c AS (
      SELECT user_id, count(*) AS cnt FROM events GROUP BY user_id
    ),
    tot AS (SELECT CAST(sum(cnt) AS DOUBLE) AS total,
                   quantile_cont(cnt, 0.5) AS med FROM c)
    SELECT CAST(rnk AS INTEGER) AS rnk, user_id, CAST(cnt AS BIGINT) AS cnt,
           ROUND(cnt / total, 6) AS share,
           ROUND(cnt / med, 6) AS x_median
    FROM (
      SELECT c.user_id, c.cnt, t.total, t.med,
             row_number() OVER (ORDER BY c.cnt DESC, c.user_id ASC) AS rnk
      FROM c, tot t
    )
    WHERE rnk <= {_SKEW_TOP_K}
    """,
    tags=("agg", "quality"),
)
def q_skew_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hot-key diagnostic for a join/aggregation key: the top-10 heaviest
    user_ids with their share of all rows and their multiple of the
    median key size — the measurement that decides whether the salted
    join/agg path (operators/skew.py) is worth its extra shuffle. One
    key-cardinality count aggregate; the ranking window runs over the
    COUNT table, not the rows, and top-k of a key-cardinality frame is
    WindowGroupLimit-pruned (the global window is over key counts —
    metadata relative to the fact table — with the limit pushed into
    each partition before the single-partition rank)."""
    return stats.skew_profile(
        t(spark, sf_dir, "events"), "user_id", top_k=_SKEW_TOP_K
    )


# ---------------------------------------------------------------------------
# cumulative distinct (running count of kinds seen per series)
# ---------------------------------------------------------------------------


@query(
    "q_cumulative_distinct",
    oracle="""
    WITH f AS (
      SELECT event_id, user_id, event_type, CAST(ts AS TIMESTAMP) AS tss,
             CASE WHEN row_number() OVER (PARTITION BY user_id, event_type
                                          ORDER BY CAST(ts AS TIMESTAMP),
                                                   event_id) = 1
                  THEN 1 ELSE 0 END AS first_seen
      FROM events
    )
    SELECT event_id, user_id,
           CAST(SUM(first_seen) OVER (PARTITION BY user_id
                                      ORDER BY tss, event_id
                                      ROWS UNBOUNDED PRECEDING) AS BIGINT)
             AS n_types_so_far
    FROM f
    """,
    tags=("windows", "timeseries"),
)
def q_cumulative_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running count of distinct event_types each user has seen — the
    exploration/breadth signal (feature onboarding, catalog coverage)
    that a naive COUNT(DISTINCT) OVER would need full-history state for.
    The first-seen trick makes it two plain windows: flag each (user,
    type)'s first occurrence (one window keyed by user+type), then a
    running sum of flags per user — O(1) state per row, both windows
    partitioned, no distinct-set accumulation anywhere."""
    return timeseries.cumulative_distinct(
        t(spark, sf_dir, "events"),
        "user_id",
        "event_type",
        ("ts", "event_id"),
        "event_id",
    )


# ---------------------------------------------------------------------------
# SQL macro surface (the dbt-macro migration path for raw-SQL users)
# ---------------------------------------------------------------------------


@query(
    "q_sql_macros",
    oracle="""
    SELECT event_id,
           CAST(date_part('dow', CAST(ts AS TIMESTAMP)) AS INTEGER) AS dow,
           CAST(date_part('hour', CAST(ts AS TIMESTAMP)) AS INTEGER) AS hr,
           md5(concat_ws('-',
               coalesce(event_type, '_dbt_utils_surrogate_key_null_'),
               coalesce(CAST(user_id AS VARCHAR),
                        '_dbt_utils_surrogate_key_null_'))) AS sk,
           CASE WHEN value < 0 THEN 'Freezing'
                WHEN value BETWEEN 0  AND 10 THEN 'Cold'
                WHEN value BETWEEN 11 AND 20 THEN 'Mild'
                WHEN value BETWEEN 21 AND 30 THEN 'Warm'
                ELSE 'Hot' END AS bucket
    FROM events
    """,
    tags=("relational", "sql"),
)
def q_sql_macros(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The dbt-macro migration path completed for raw-SQL users: the
    reference's macros (Postgres dow/hour, dbt_utils surrogate key,
    range bucketing) are installed as Spark SQL UDFs
    (sources/catalog.py::register_sql_macros — CREATE FUNCTION … RETURN
    expr, which INLINES into the plan: no Python boundary, pinned in
    test_catalog) and this query calls them from plain SQL over the
    registered views. The oracle runs the HAND-EXPANDED expressions —
    macro call ≡ expansion is exactly the dbt contract."""
    from weather_api_automate_etl_spark.sources.catalog import (
        register_sql_macros,
    )
    from weather_api_automate_etl_spark.sources.tables import register_testdata

    register_testdata(spark, sf_dir)
    register_sql_macros(spark)
    return spark.sql(
        """
        SELECT event_id,
               pg_dow(ts) AS dow,
               pg_hour(ts) AS hr,
               surrogate_key2(event_type, CAST(user_id AS STRING)) AS sk,
               quantity_bucket(value) AS bucket
        FROM events
        """
    )
