"""Analytics extension queries: temporal joins, non-equi joins, deterministic
sampling, cube/grouping sets, conditional aggregation.

Per-query rationale lives in each function docstring; registry/oracle
conventions in queries.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.window import Window

from weather_api_automate_etl_spark.operators import joins, sampling, skew, windows
from weather_api_automate_etl_spark.queries import query, t


# ---------------------------------------------------------------------------
# As-of join (union-merge, one shuffle)
# ---------------------------------------------------------------------------


@query(
    "q_asof_join",
    oracle="""
    SELECT c.event_id, CAST(c.ts AS TIMESTAMP) AS ts, c.user_id,
           p.purchase_ts, p.purchase_value
    FROM (SELECT event_id, ts, user_id FROM events WHERE event_type = 'click') c
    ASOF LEFT JOIN (
      SELECT user_id, CAST(ts AS TIMESTAMP) AS purchase_ts,
             MAX(value) AS purchase_value
      FROM events WHERE event_type = 'purchase' GROUP BY 1, 2
    ) p ON c.user_id = p.user_id AND CAST(c.ts AS TIMESTAMP) >= p.purchase_ts
    """,
    tags=("joins",),
)
def q_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Attach each click to the user's latest prior-or-simultaneous purchase.

    Spark has no ASOF JOIN; operators/joins.py::asof_join implements the
    union-merge strategy (one shuffle on user_id, no range cartesian). The
    DuckDB oracle uses its native ASOF LEFT JOIN — an independent engine's
    implementation of the same semantics."""
    ev = t(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "ts", "user_id"
    )
    purchases = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", F.col("ts").alias("purchase_ts"))
        .agg(F.max("value").alias("purchase_value"))
    )
    return joins.asof_join(
        clicks,
        purchases,
        key="user_id",
        left_ts="ts",
        right_ts="purchase_ts",
        payload_cols=["purchase_ts", "purchase_value"],
    )


# ---------------------------------------------------------------------------
# Range (interval) join against a broadcast tier table
# ---------------------------------------------------------------------------

_TIERS = [
    ("micro", 0.0, 25_000.0),
    ("small", 25_000.0, 100_000.0),
    ("medium", 100_000.0, 200_000.0),
    ("large", 200_000.0, 350_000.0),
    ("jumbo", 350_000.0, 1_000_000.0),
]


@query(
    "q_range_join",
    oracle="""
    SELECT tier, COUNT(*) AS n_orders,
           ROUND(SUM(o_totalprice), 2) AS tier_revenue
    FROM orders
    JOIN (
      VALUES ('micro',  0.0e0,      25000.0e0),
             ('small',  25000.0e0,  100000.0e0),
             ('medium', 100000.0e0, 200000.0e0),
             ('large',  200000.0e0, 350000.0e0),
             ('jumbo',  350000.0e0, 1000000.0e0)
    ) tiers(tier, lo, hi)
      ON o_totalprice >= lo AND o_totalprice < hi
    GROUP BY tier
    """,
    tags=("joins",),
)
def q_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Non-equi interval join: price tiers via a broadcast range table.

    The 5-row tier dim is broadcast (BroadcastNestedLoopJoin) so the orders
    side never shuffles for the join; only the tiny post-join agg does."""
    orders = t(spark, sf_dir, "orders")
    ranges = spark.createDataFrame(_TIERS, "tier string, lo double, hi double")
    return (
        joins.range_join_small(orders, ranges, "o_totalprice")
        .groupBy("tier")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("tier_revenue"),
        )
    )


# ---------------------------------------------------------------------------
# Big-big interval join (binned equi-join strategy)
# ---------------------------------------------------------------------------


@query(
    "q_interval_join",
    oracle="""
    WITH g AS (
      SELECT user_id, event_id, ts,
             epoch_us(CAST(ts AS TIMESTAMP))
               - lag(epoch_us(CAST(ts AS TIMESTAMP))) OVER w AS gap_us
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id)
    ),
    s AS (
      SELECT *, CAST(SUM(CASE WHEN gap_us IS NULL OR gap_us > 30 * 60 * 1000000
                              THEN 1 ELSE 0 END)
               OVER (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id
                     ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_seq
      FROM g
    ),
    sess AS (
      SELECT user_id, session_seq,
             MIN(CAST(ts AS TIMESTAMP)) AS session_start,
             MAX(CAST(ts AS TIMESTAMP)) AS session_end
      FROM s GROUP BY 1, 2
    )
    SELECT e.event_id, e.user_id, sess.session_seq
    FROM (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts
          FROM events WHERE event_type = 'error') e
    JOIN sess ON e.user_id = sess.user_id
             AND e.ts BETWEEN sess.session_start AND sess.session_end
    """,
    tags=("joins",),
)
def q_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Assign every error event to its containing user session — a big-big
    point-in-interval join.

    Both sides scale with the data, so broadcasting is off the table; the
    operator bucketizes to hourly bins and equi-joins on (user_id, bin) +
    residual BETWEEN (operators/joins.py::interval_join_binned). The DuckDB
    oracle runs the naive inequality join — same rows, different strategy."""
    ev = t(spark, sf_dir, "events")
    sessions = windows.sessionize(ev, gap_minutes=30).select(
        "user_id", "session_seq", "session_start", "session_end"
    )
    errors = ev.filter(F.col("event_type") == "error").select(
        "event_id", "user_id", "ts"
    )
    return joins.interval_join_binned(
        errors,
        sessions,
        key="user_id",
        ts_col="ts",
        lo_col="session_start",
        hi_col="session_end",
    ).select("event_id", "user_id", "session_seq")


# ---------------------------------------------------------------------------
# Top-N per group
# ---------------------------------------------------------------------------


@query(
    "q_topn_per_group",
    oracle="""
    SELECT o_orderpriority, o_orderkey, o_totalprice,
           CAST(row_number() OVER (PARTITION BY o_orderpriority
                                   ORDER BY o_totalprice DESC, o_orderkey) AS INTEGER)
             AS rk
    FROM orders
    QUALIFY rk <= 3
    """,
    tags=("windows",),
)
def q_topn_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders by price within each priority class. row_number (not
    rank) + a deterministic tie-break; Catalyst pushes the rk<=3 filter
    into the Window via WindowGroupLimit, so each partition keeps only a
    3-row heap instead of fully sorting."""
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        t(spark, sf_dir, "orders")
        .select(
            "o_orderpriority",
            "o_orderkey",
            "o_totalprice",
            F.row_number().over(w).alias("rk"),
        )
        .filter(F.col("rk") <= 3)
    )


# ---------------------------------------------------------------------------
# Deterministic stratified sampling
# ---------------------------------------------------------------------------

_SAMPLE_RATES = {"en": 0.25, "de": 0.5, "es": 0.5, "fr": 1.0, "zh": 0.1}


@query(
    "q_stratified_sample",
    oracle="""
    SELECT doc_id, lang, source, n_chars FROM documents
    WHERE CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS UBIGINT)
          / 4294967296.0e0
          < CASE lang WHEN 'en' THEN 0.25e0 WHEN 'de' THEN 0.5e0
                      WHEN 'es' THEN 0.5e0 WHEN 'fr' THEN 1.0e0
                      WHEN 'zh' THEN 0.1e0 END
    """,
    tags=("sampling",),
)
def q_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language deterministic downsample (content-hash threshold).

    Replayable across reruns/partitionings — the keep set is a pure function
    of doc_id, unlike seed-based df.sample(). Pure filter, zero shuffle."""
    docs = t(spark, sf_dir, "documents")
    return sampling.stratified_sample(docs, "lang", _SAMPLE_RATES, "doc_id").select(
        "doc_id", "lang", "source", "n_chars"
    )


# ---------------------------------------------------------------------------
# Cube + grouping_id
# ---------------------------------------------------------------------------


@query(
    "q_cube",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(GROUPING(l_returnflag, l_linestatus) AS INTEGER) AS gid,
           COUNT(*) AS n_rows, ROUND(SUM(l_quantity), 2) AS sum_qty
    FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
    tags=("agg",),
)
def q_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full cube over (returnflag, linestatus) with grouping_id — all four
    grouping sets in one pass (Spark expands to a single Expand + hash agg,
    first grouping column is the grouping_id MSB on both engines)."""
    return (
        t(spark, sf_dir, "lineitem")
        .cube("l_returnflag", "l_linestatus")
        .agg(
            F.grouping_id().cast("int").alias("gid"),
            F.count(F.lit(1)).alias("n_rows"),
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        )
    )


# ---------------------------------------------------------------------------
# Conditional aggregation (FILTER-clause semantics)
# ---------------------------------------------------------------------------


@query(
    "q_conditional_agg",
    oracle="""
    SELECT o_orderpriority,
           COUNT(*) AS n_orders,
           COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS n_filled,
           ROUND(SUM(o_totalprice) FILTER (WHERE o_totalprice > 200000.0e0), 2)
             AS high_value_revenue
    FROM orders GROUP BY o_orderpriority
    """,
    tags=("agg",),
)
def q_conditional_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional aggregates (SQL FILTER clause) in one grouped pass —
    no self-joins, no multiple scans."""
    orders = t(spark, sf_dir, "orders")
    return orders.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.count_if(F.col("o_orderstatus") == "F").alias("n_filled"),
        F.round(
            F.sum(F.when(F.col("o_totalprice") > 200000.0, F.col("o_totalprice"))), 2
        ).alias("high_value_revenue"),
    )


# ---------------------------------------------------------------------------
# Skew-safe aggregation (salting is semantics-transparent: plain GROUP BY oracle)
# ---------------------------------------------------------------------------


@query(
    "q_salted_agg",
    oracle="""
    SELECT l_returnflag,
           COUNT(l_quantity) AS n_rows,
           ROUND(SUM(l_extendedprice), 2) AS total_price,
           MIN(l_quantity) AS min_qty,
           MAX(l_quantity) AS max_qty
    FROM lineitem GROUP BY l_returnflag
    """,
    tags=("agg", "skew"),
)
def q_salted_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-phase salted aggregation on a 3-value (maximally hot) grouping
    key. Results are identical to a plain GROUP BY — the oracle proves the
    salting transform is semantics-transparent — while each reduce task
    handles at most 1/16 of a hot key's rows.

    Rounding: SUM merges exact per-salt partial sums, so the phase-2 sum
    is a reordering of the same doubles; round(2) absorbs the last-ulp
    difference exactly as for every other double aggregate."""
    li = t(spark, sf_dir, "lineitem")
    out = skew.salted_agg(
        li,
        keys=["l_returnflag"],
        aggs={
            "n_rows": ("l_quantity", "count"),
            "total_price": ("l_extendedprice", "sum"),
            "min_qty": ("l_quantity", "min"),
            "max_qty": ("l_quantity", "max"),
        },
        salt_from="l_orderkey",
        n_salts=16,
    )
    return out.withColumn("total_price", F.round("total_price", 2))


# ---------------------------------------------------------------------------
# Analytic distribution functions (ntile / percent_rank / cume_dist)
# ---------------------------------------------------------------------------


@query(
    "q_window_distribution",
    oracle="""
    SELECT o_orderkey, o_orderpriority,
           CAST(ntile(4) OVER w AS INTEGER) AS price_quartile,
           ROUND(percent_rank() OVER w, 6) AS pct_rank,
           ROUND(cume_dist() OVER w, 6) AS cume
    FROM orders
    WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey)
    """,
    tags=("windows",),
)
def q_window_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution analytics per priority class: quartile assignment,
    percentile rank, cumulative distribution. One shuffle on the partition
    key serves all three (same window spec, deterministic tie-break)."""
    w = Window.partitionBy("o_orderpriority").orderBy("o_totalprice", "o_orderkey")
    return t(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_orderpriority",
        F.ntile(4).over(w).alias("price_quartile"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
    )


# ---------------------------------------------------------------------------
# Date/time arithmetic
# ---------------------------------------------------------------------------


@query(
    "q_date_arithmetic",
    oracle="""
    SELECT o_orderkey,
           CAST(o_orderdate AS DATE) AS order_date,
           CAST(o_orderdate AS DATE) + 30 AS due_date,
           last_day(CAST(o_orderdate AS DATE)) AS month_end,
           CAST(date_trunc('month', CAST(o_orderdate AS DATE)) AS DATE) AS month_start,
           CAST(date_diff('day', DATE '1997-01-01', CAST(o_orderdate AS DATE)) AS INTEGER)
             AS days_since_epoch_97,
           CAST(quarter(o_orderdate) AS INTEGER) AS qtr,
           CAST(weekofyear(o_orderdate) AS INTEGER) AS iso_week
    FROM orders
    """,
    tags=("scalar",),
)
def q_date_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar arithmetic surface: offsets, month boundaries, day diffs,
    quarter and ISO week — all JVM-side expressions in one projection."""
    d = F.to_date("o_orderdate")
    return t(spark, sf_dir, "orders").select(
        "o_orderkey",
        d.alias("order_date"),
        F.date_add(d, 30).alias("due_date"),
        F.last_day(d).alias("month_end"),
        F.trunc(d, "month").alias("month_start"),
        F.datediff(d, F.lit("1997-01-01").cast("date")).alias("days_since_epoch_97"),
        F.quarter(d).alias("qtr"),
        F.weekofyear(d).alias("iso_week"),
    )


# ---------------------------------------------------------------------------
# Array aggregation / nested types
# ---------------------------------------------------------------------------


@query(
    "q_array_agg",
    oracle="""
    SELECT l_orderkey,
           array_to_string(list(l_linenumber ORDER BY l_linenumber), ',')
             AS line_numbers,
           CAST(len(list(l_linenumber)) AS INTEGER) AS n_lines,
           CAST(list_max(list(l_linenumber)) AS INTEGER) AS max_line,
           array_to_string(list_sort(list_distinct(list(l_returnflag))), ',')
             AS flags
    FROM lineitem GROUP BY l_orderkey
    """,
    tags=("agg", "nested"),
)
def q_array_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nested-type aggregation: per-order sorted line-number arrays plus
    array length/max/distinct — collect_list with explicit sort_array
    (collect order is partition-dependent; sorting restores determinism).

    Array outputs are serialized to comma-joined strings in BOTH twins:
    the external harness canonicalizes results through a pandas sort, which
    cannot hash list-valued cells (round-1 red row)."""
    return (
        t(spark, sf_dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(
            F.array_join(
                F.sort_array(F.collect_list("l_linenumber")).cast("array<string>"),
                ",",
            ).alias("line_numbers"),
            F.count("l_linenumber").cast("int").alias("n_lines"),
            F.max("l_linenumber").alias("max_line"),
            F.array_join(
                F.array_distinct(F.sort_array(F.collect_list("l_returnflag"))), ","
            ).alias("flags"),
        )
    )


# ---------------------------------------------------------------------------
# Time-series gap fill / resample
# ---------------------------------------------------------------------------


@query(
    "q_gap_fill",
    oracle="""
    WITH c AS (
      SELECT event_type, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day,
             COUNT(*) AS n FROM events GROUP BY 1, 2
    ), b AS (
      SELECT event_type, MIN(day) AS lo, MAX(day) AS hi FROM c GROUP BY 1
    ), g AS (
      SELECT b.event_type,
             CAST(unnest(generate_series(b.lo, b.hi, INTERVAL 1 DAY)) AS DATE)
               AS day
      FROM b
    )
    SELECT g.event_type, g.day, COALESCE(c.n, 0) AS n_events
    FROM g LEFT JOIN c ON g.event_type = c.event_type AND g.day = c.day
    """,
    tags=("timeseries",),
)
def q_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resample events to a dense daily grid per event_type, zero-filling
    days with no traffic (the classic time-series gap-fill the reference's
    daily scheduler assumes away — SURVEY.md §2.6 runs once per day and
    skips nothing).

    Scale shape: one shuffle to the (type, day) pre-aggregate — tiny output
    (days x types, independent of row count) — then the calendar grid is
    built by sequence()+explode over per-type bounds and LEFT-joined back.
    Both join sides are post-aggregation minis, so AQE broadcasts; the raw
    events table is never touched again."""
    ev = t(spark, sf_dir, "events").select(
        "event_type", F.to_date("ts").alias("day")
    )
    counts = ev.groupBy("event_type", "day").agg(F.count(F.lit(1)).alias("n"))
    grid = (
        counts.groupBy("event_type")
        .agg(F.min("day").alias("lo"), F.max("day").alias("hi"))
        .select(
            "event_type",
            F.explode(
                F.sequence("lo", "hi", F.expr("interval 1 day"))
            ).alias("day"),
        )
    )
    return grid.join(counts, ["event_type", "day"], "left").select(
        "event_type", "day", F.coalesce("n", F.lit(0)).alias("n_events")
    )


# ---------------------------------------------------------------------------
# Forward fill (last observation carried forward)
# ---------------------------------------------------------------------------


@query(
    "q_forward_fill",
    oracle="""
    SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts,
           ROUND(last_value(CASE WHEN event_type = 'purchase' THEN value END
                            IGNORE NULLS)
                 OVER (PARTITION BY user_id
                       ORDER BY CAST(ts AS TIMESTAMP), event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
                 6) AS last_purchase_value
    FROM events
    """,
    tags=("timeseries", "windows"),
)
def q_forward_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward-fill: carry each user's most recent purchase value onto every
    subsequent event (LOCF — the standard panel-data imputation). One shuffle
    on user_id; the running state is a single value per partition, so the
    window frame is streaming-friendly (no buffering of the full frame)."""
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    purchase_value = F.when(F.col("event_type") == "purchase", F.col("value"))
    return t(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        "ts",
        F.round(
            F.last(purchase_value, ignorenulls=True).over(w), 6
        ).alias("last_purchase_value"),
    )


# ---------------------------------------------------------------------------
# Argmax / argmin (max_by, min_by)
# ---------------------------------------------------------------------------


@query(
    "q_argmax",
    oracle="""
    SELECT o_orderpriority,
           MAX(CASE WHEN rn_max = 1 THEN o_orderkey END) AS top_orderkey,
           MAX(CASE WHEN rn_min = 1 THEN o_orderkey END) AS cheapest_orderkey,
           ROUND(MAX(o_totalprice), 2) AS max_price
    FROM (
      SELECT o_orderpriority, o_orderkey, o_totalprice,
             row_number() OVER (PARTITION BY o_orderpriority
                                ORDER BY o_totalprice DESC, o_orderkey DESC)
               AS rn_max,
             row_number() OVER (PARTITION BY o_orderpriority
                                ORDER BY o_totalprice ASC, o_orderkey ASC)
               AS rn_min
      FROM orders
    ) GROUP BY 1
    """,
    tags=("agg",),
)
def q_argmax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Argmax/argmin per group via max_by/min_by keyed on a (price, key)
    struct — the struct tie-break makes the pick deterministic, which bare
    max_by is not. Single aggregate pass, no window shuffle; the oracle
    proves equivalence against the row_number() formulation."""
    key_struct = F.struct("o_totalprice", "o_orderkey")
    return (
        t(spark, sf_dir, "orders")
        .groupBy("o_orderpriority")
        .agg(
            F.max_by("o_orderkey", key_struct).alias("top_orderkey"),
            F.min_by("o_orderkey", key_struct).alias("cheapest_orderkey"),
            F.round(F.max("o_totalprice"), 2).alias("max_price"),
        )
    )


# ---------------------------------------------------------------------------
# Ratio-to-total / running share (window over aggregate)
# ---------------------------------------------------------------------------


@query(
    "q_ratio_to_total",
    oracle="""
    WITH r AS (
      SELECT o_orderpriority, SUM(o_totalprice) AS rev
      FROM orders GROUP BY 1
    )
    SELECT o_orderpriority,
           ROUND(rev, 2) AS revenue,
           ROUND(rev / SUM(rev) OVER (), 6) AS share,
           ROUND(SUM(rev) OVER (ORDER BY rev DESC, o_orderpriority
                                ROWS UNBOUNDED PRECEDING)
                 / SUM(rev) OVER (), 6) AS cum_share
    FROM r
    """,
    tags=("windows", "agg"),
)
def q_ratio_to_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Percent-of-total and running (Pareto) share per priority class —
    ratio_to_report re-expressed as a window-over-aggregate. The windows run
    over the tiny post-aggregate (one row per priority), so the single-
    partition global frame is harmless at any scale."""
    rev = (
        t(spark, sf_dir, "orders")
        .groupBy("o_orderpriority")
        .agg(F.sum("o_totalprice").alias("rev"))
    )
    w_all = Window.partitionBy()
    w_run = (
        Window.partitionBy()
        .orderBy(F.desc("rev"), "o_orderpriority")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return rev.select(
        "o_orderpriority",
        F.round("rev", 2).alias("revenue"),
        F.round(F.col("rev") / F.sum("rev").over(w_all), 6).alias("share"),
        F.round(
            F.sum("rev").over(w_run) / F.sum("rev").over(w_all), 6
        ).alias("cum_share"),
    )


# ---------------------------------------------------------------------------
# Histogram bucketing (fixed-width, width_bucket semantics)
# ---------------------------------------------------------------------------


@query(
    "q_histogram",
    oracle="""
    SELECT CAST(least(floor(o_totalprice / 30000e0), 19) AS INTEGER)
             AS bucket,
           ROUND(least(floor(o_totalprice / 30000e0), 19) * 30000e0, 2)
             AS bucket_lo,
           COUNT(*) AS n,
           ROUND(AVG(o_totalprice), 4) AS avg_price
    FROM orders GROUP BY 1, 2
    """,
    tags=("agg",),
)
def q_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram of order value: 20 x 30k buckets with an
    overflow top bucket (width_bucket semantics spelled out as floor math so
    both engines compute bit-identical bucket ids). Map-side combinable —
    the shuffle carries at most 20 rows per task."""
    bucket = F.least(F.floor(F.col("o_totalprice") / 30000.0), F.lit(19)).cast(
        "int"
    )
    return (
        t(spark, sf_dir, "orders")
        .groupBy(
            bucket.alias("bucket"),
            F.round(bucket * 30000.0, 2).alias("bucket_lo"),
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.avg("o_totalprice"), 4).alias("avg_price"),
        )
    )


# ---------------------------------------------------------------------------
# Word count (tokenize-explode-aggregate)
# ---------------------------------------------------------------------------


@query(
    "q_wordcount",
    oracle="""
    SELECT word, COUNT(*) AS n
    FROM (
      SELECT unnest(regexp_split_to_array(lower(text), '[^a-z]+')) AS word
      FROM documents
    ) WHERE word <> '' GROUP BY 1 HAVING COUNT(*) >= 5
    """,
    tags=("text",),
)
def q_wordcount(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus word frequencies (the canonical tokenize-explode-aggregate):
    lowercase, split on non-letters, count, keep words seen >= 5 times.
    Partial aggregation combines per-task before the shuffle, so the
    exchange carries vocabulary size, not token count — the property that
    makes this viable on a 100 TB corpus."""
    words = (
        t(spark, sf_dir, "documents")
        .select(
            F.explode(F.split(F.lower("text"), "[^a-z]+")).alias("word")
        )
        .filter(F.col("word") != "")
    )
    return (
        words.groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= 5)
    )


# ---------------------------------------------------------------------------
# Scalar subquery (filter against a computed global)
# ---------------------------------------------------------------------------


@query(
    "q_scalar_subquery",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS n_above,
           ROUND(MIN(o_totalprice), 2) AS min_above
    FROM orders
    WHERE o_totalprice > (SELECT ROUND(AVG(o_totalprice), 2) FROM orders)
    GROUP BY 1
    """,
    tags=("relational",),
)
def q_scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orders priced above the global average — a scalar subquery expressed
    DataFrame-side as a 1-row aggregate broadcast into the filter (Spark
    plans the cross join as BroadcastNestedLoopJoin over a single row). The
    threshold is rounded to cents on both engines so the comparison edge is
    engine-independent."""
    orders = t(spark, sf_dir, "orders")
    avg_price = orders.agg(
        F.round(F.avg("o_totalprice"), 2).alias("avg_price")
    )
    return (
        orders.join(F.broadcast(avg_price))
        .filter(F.col("o_totalprice") > F.col("avg_price"))
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_above"),
            F.round(F.min("o_totalprice"), 2).alias("min_above"),
        )
    )


# ---------------------------------------------------------------------------
# Grouping sets (irregular subtotal lattice)
# ---------------------------------------------------------------------------


@query(
    "q_grouping_sets",
    oracle="""
    SELECT o_orderpriority, o_orderstatus,
           CAST(GROUPING(o_orderpriority) AS INTEGER) AS g_priority,
           CAST(GROUPING(o_orderstatus) AS INTEGER) AS g_status,
           COUNT(*) AS n, ROUND(SUM(o_totalprice), 2) AS revenue
    FROM orders
    GROUP BY GROUPING SETS ((o_orderpriority, o_orderstatus),
                            (o_orderpriority), ())
    """,
    tags=("relational", "agg"),
)
def q_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Irregular subtotal lattice via GROUPING SETS — the general form of
    rollup/cube (q_rollup/q_cube cover the regular cases). One aggregate
    pass; Spark expands the sets map-side exactly like ROLLUP. grouping()
    flags disambiguate real NULL keys from subtotal rows."""
    return (
        t(spark, sf_dir, "orders")
        .groupingSets(
            [["o_orderpriority", "o_orderstatus"], ["o_orderpriority"], []],
            "o_orderpriority",
            "o_orderstatus",
        )
        .agg(
            F.grouping("o_orderpriority").cast("int").alias("g_priority"),
            F.grouping("o_orderstatus").cast("int").alias("g_status"),
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("o_totalprice"), 2).alias("revenue"),
        )
    )


# ---------------------------------------------------------------------------
# Hopping (sliding) windows
# ---------------------------------------------------------------------------


@query(
    "q_hopping_windows",
    oracle="""
    WITH e AS (
      SELECT event_type, value,
             unnest([make_timestamp(epoch_us(CAST(ts AS TIMESTAMP))
                                    - epoch_us(CAST(ts AS TIMESTAMP)) % 300000000),
                     make_timestamp(epoch_us(CAST(ts AS TIMESTAMP))
                                    - epoch_us(CAST(ts AS TIMESTAMP)) % 300000000)
                       - INTERVAL 5 MINUTE]) AS window_start
      FROM events
    )
    SELECT window_start, event_type, COUNT(*) AS n,
           ROUND(AVG(value), 6) AS avg_value
    FROM e GROUP BY 1, 2
    """,
    tags=("timeseries", "windows"),
)
def q_hopping_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hopping-window aggregation: 10-minute windows sliding every 5 minutes
    (each event lands in exactly two overlapping windows). Spark's window()
    generator expands the hops map-side before a single combinable agg —
    the streaming-ready form of overlapping-window rollups. The oracle
    expands the same two hops arithmetically."""
    ev = t(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.window("ts", "10 minutes", "5 minutes").alias("w"), "event_type"
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.avg("value"), 6).alias("avg_value"),
        )
        .select(
            F.col("w.start").alias("window_start"), "event_type", "n", "avg_value"
        )
    )


# ---------------------------------------------------------------------------
# Linear interpolation between sparse observations
# ---------------------------------------------------------------------------


@query(
    "q_linear_interpolate",
    oracle="""
    WITH f AS (
      SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts,
             last_value(CASE WHEN event_type = 'purchase' THEN value END
                        IGNORE NULLS) OVER wp AS prev_v,
             last_value(CASE WHEN event_type = 'purchase'
                             THEN CAST(ts AS TIMESTAMP) END
                        IGNORE NULLS) OVER wp AS prev_ts,
             first_value(CASE WHEN event_type = 'purchase' THEN value END
                         IGNORE NULLS) OVER wf AS next_v,
             first_value(CASE WHEN event_type = 'purchase'
                              THEN CAST(ts AS TIMESTAMP) END
                         IGNORE NULLS) OVER wf AS next_ts
      FROM events
      WINDOW
        wp AS (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
        wf AS (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id
               ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
    )
    SELECT event_id, user_id, ts,
           ROUND(CASE
             WHEN prev_ts IS NOT NULL AND next_ts IS NOT NULL
                  AND next_ts > prev_ts
             THEN prev_v + (next_v - prev_v)
                  * (CAST(epoch_us(ts) - epoch_us(prev_ts) AS DOUBLE)
                     / CAST(epoch_us(next_ts) - epoch_us(prev_ts) AS DOUBLE))
             ELSE coalesce(prev_v, next_v)
           END, 6) AS interp_value
    FROM f
    """,
    tags=("timeseries", "windows"),
)
def q_linear_interpolate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear interpolation of the sparse purchase-value signal onto every
    event: bracket each row with the nearest purchase before and after
    (last/first over IGNORE NULLS frames), then lerp by the time fraction.
    Same single user_id shuffle serves both frames; the time ratio is
    integer-µs arithmetic in double, bit-identical across engines."""
    on_purchase = lambda c: F.when(F.col("event_type") == "purchase", c)  # noqa: E731
    wp = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # the forward bracket runs as a running `last` over the REVERSED
    # ordering: a shrinking (current, unboundedFollowing) frame is not
    # incrementally computable (Spark re-scans the remainder per row —
    # the O(n²)-per-partition hazard tools/stress_eval.py measured on
    # caliper_match); "at-or-after me ascending" == "at-or-before me
    # descending", same rows, one extra in-partition sort, no shuffle.
    wf_rev = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").desc(), F.col("event_id").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    ev = t(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        "ts",
        F.last(on_purchase(F.col("value")), ignorenulls=True).over(wp).alias("prev_v"),
        F.last(on_purchase(F.col("ts")), ignorenulls=True).over(wp).alias("prev_ts"),
        F.last(on_purchase(F.col("value")), ignorenulls=True).over(wf_rev).alias("next_v"),
        F.last(on_purchase(F.col("ts")), ignorenulls=True).over(wf_rev).alias("next_ts"),
    )
    # session TZ is UTC (sources/tables.py), so ntz -> instant cast is exact
    us = lambda c: F.unix_micros(F.col(c).cast("timestamp"))  # noqa: E731
    frac = (us("ts") - us("prev_ts")).cast("double") / (
        us("next_ts") - us("prev_ts")
    ).cast("double")
    interp = F.when(
        F.col("prev_ts").isNotNull()
        & F.col("next_ts").isNotNull()
        & (F.col("next_ts") > F.col("prev_ts")),
        F.col("prev_v") + (F.col("next_v") - F.col("prev_v")) * frac,
    ).otherwise(F.coalesce("prev_v", "next_v"))
    return ev.select(
        "event_id", "user_id", "ts", F.round(interp, 6).alias("interp_value")
    )


# ---------------------------------------------------------------------------
# Time-weighted average
# ---------------------------------------------------------------------------


@query(
    "q_time_weighted_avg",
    oracle="""
    WITH d AS (
      SELECT user_id, value,
             CAST(lead(epoch_us(CAST(ts AS TIMESTAMP))) OVER w
                  - epoch_us(CAST(ts AS TIMESTAMP)) AS DOUBLE) AS dur_us
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id)
    )
    SELECT user_id,
           ROUND(SUM(value * dur_us) / SUM(dur_us), 4) AS twa_value,
           CAST(COUNT(dur_us) AS BIGINT) AS n_intervals
    FROM d WHERE dur_us IS NOT NULL AND dur_us > 0
    GROUP BY 1
    """,
    tags=("timeseries", "agg"),
)
def q_time_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average of the value signal per user: each observation
    is weighted by how long it was the current reading (duration to the next
    event). The irregular-sampling-correct mean — a plain AVG over-weights
    bursts. One window shuffle on user_id feeding a map-side-combinable
    aggregate."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    d = (
        t(spark, sf_dir, "events")
        .select(
            "user_id",
            "value",
            (
                F.unix_micros(F.lead("ts").over(w).cast("timestamp"))
                - F.unix_micros(F.col("ts").cast("timestamp"))
            )
            .cast("double")
            .alias("dur_us"),
        )
        .filter(F.col("dur_us").isNotNull() & (F.col("dur_us") > 0))
    )
    return d.groupBy("user_id").agg(
        F.round(
            F.sum(F.col("value") * F.col("dur_us")) / F.sum("dur_us"), 4
        ).alias("twa_value"),
        F.count("dur_us").alias("n_intervals"),
    )


# ---------------------------------------------------------------------------
# Sessionized conversion funnel
# ---------------------------------------------------------------------------


@query(
    "q_funnel",
    oracle="""
    WITH g AS (
      SELECT user_id, event_id, event_type, CAST(ts AS TIMESTAMP) AS ts_c,
             epoch_us(CAST(ts AS TIMESTAMP))
               - lag(epoch_us(CAST(ts AS TIMESTAMP))) OVER w AS gap_us
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id)
    ),
    s AS (
      SELECT *, CAST(SUM(CASE WHEN gap_us IS NULL OR gap_us > 30 * 60 * 1000000
                              THEN 1 ELSE 0 END)
               OVER (PARTITION BY user_id ORDER BY ts_c, event_id
                     ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_seq
      FROM g
    ),
    w2 AS (
      SELECT user_id, session_seq, event_type, ts_c,
             MIN(CASE WHEN event_type = 'click' THEN ts_c END)
               OVER (PARTITION BY user_id, session_seq) AS first_click
      FROM s
    ),
    sess AS (
      SELECT user_id, session_seq,
             MAX(first_click) AS first_click,
             MAX(CASE WHEN event_type = 'purchase' AND ts_c >= first_click
                      THEN 1 ELSE 0 END) AS converted
      FROM w2 GROUP BY 1, 2
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_sessions,
           CAST(SUM(CASE WHEN first_click IS NOT NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_with_click,
           CAST(SUM(converted) AS BIGINT) AS n_converted,
           ROUND(SUM(converted) * 1.0e0 / COUNT(*), 6) AS conv_rate
    FROM sess
    """,
    tags=("timeseries", "windows"),
)
def q_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionized click->purchase conversion funnel: within each 30-minute
    gap session, did a purchase follow the session's first click? Three
    stacked windows share ONE user_id shuffle (the per-session frames are
    sub-partitions of it); the final rollup is a single-row global
    aggregate."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    epoch = F.unix_micros(F.col("ts").cast("timestamp"))
    gap = epoch - F.lag(epoch).over(w)
    is_new = F.when(gap.isNull() | (gap > 30 * 60 * 1_000_000), 1).otherwise(0)
    sess_w = Window.partitionBy("user_id", "session_seq")
    per_event = (
        t(spark, sf_dir, "events")
        .select("user_id", "event_id", "event_type", "ts")
        .withColumn("__new", is_new)
        .withColumn(
            "session_seq",
            F.sum("__new").over(w.rowsBetween(Window.unboundedPreceding, 0)),
        )
        .withColumn(
            "first_click",
            F.min(
                F.when(F.col("event_type") == "click", F.col("ts"))
            ).over(sess_w),
        )
    )
    sessions = per_event.groupBy("user_id", "session_seq").agg(
        F.max("first_click").alias("first_click"),
        F.max(
            F.when(
                (F.col("event_type") == "purchase")
                & (F.col("ts") >= F.col("first_click")),
                1,
            ).otherwise(0)
        ).alias("converted"),
    )
    return sessions.agg(
        F.count(F.lit(1)).alias("n_sessions"),
        F.sum(
            F.when(F.col("first_click").isNotNull(), 1).otherwise(0)
        ).alias("n_with_click"),
        F.sum("converted").alias("n_converted"),
        F.round(F.sum("converted") / F.count(F.lit(1)), 6).alias("conv_rate"),
    )


# ---------------------------------------------------------------------------
# Cohort retention
# ---------------------------------------------------------------------------


@query(
    "q_cohort_retention",
    oracle="""
    WITH c AS (
      SELECT user_id, MIN(CAST(CAST(ts AS TIMESTAMP) AS DATE)) AS cohort_day
      FROM events GROUP BY 1
    ),
    a AS (
      SELECT DISTINCT user_id, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS active_day
      FROM events
    )
    SELECT c.cohort_day,
           CAST(date_diff('day', c.cohort_day, a.active_day) AS INTEGER)
             AS day_offset,
           CAST(COUNT(DISTINCT a.user_id) AS BIGINT) AS n_users
    FROM a JOIN c ON a.user_id = c.user_id
    GROUP BY 1, 2
    """,
    tags=("timeseries", "agg"),
)
def q_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention triangle: users bucketed by first-seen day, counted
    on each subsequent active day offset.

    Single user_id shuffle: per-user active-day sets via collect_set
    (bounded by the calendar, map-side combined), cohort = array_min of the
    set — no cohort/active self-join at all. The exploded frame feeds the
    final cohort x offset rollup, whose output is calendar-bounded and tiny
    at any data scale. The naive two-aggregate + join formulation costs 4
    exchanges; this costs 2 (PLANS.md)."""
    ev = t(spark, sf_dir, "events").select(
        "user_id", F.to_date("ts").alias("day")
    )
    per_user = ev.groupBy("user_id").agg(
        F.collect_set("day").alias("days")
    )
    exploded = per_user.select(
        "user_id",
        F.array_min("days").alias("cohort_day"),
        F.explode("days").alias("active_day"),
    )
    return exploded.groupBy(
        "cohort_day",
        F.datediff("active_day", "cohort_day").alias("day_offset"),
    ).agg(F.count_distinct("user_id").alias("n_users"))


# ---------------------------------------------------------------------------
# Schema-evolution union (UNION ALL BY NAME)
# ---------------------------------------------------------------------------


@query(
    "q_union_by_name",
    oracle="""
    SELECT o_orderkey, o_totalprice, 'archive' AS src
    FROM orders WHERE o_orderstatus = 'F'
    UNION ALL BY NAME
    SELECT 'live' AS src, o_orderkey
    FROM orders WHERE o_orderstatus <> 'F'
    """,
    tags=("relational",),
)
def q_union_by_name(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-evolution union: two generations of the same feed with
    different column order and a column added later, merged by NAME with
    nulls for the missing column (unionByName allowMissingColumns — the
    batch form of a reader-schema merge). Zero shuffle: union is a plan
    concatenation."""
    orders = t(spark, sf_dir, "orders")
    archive = orders.filter(F.col("o_orderstatus") == "F").select(
        "o_orderkey", "o_totalprice", F.lit("archive").alias("src")
    )
    live = orders.filter(F.col("o_orderstatus") != "F").select(
        F.lit("live").alias("src"), "o_orderkey"
    )
    return archive.unionByName(live, allowMissingColumns=True)


# ---------------------------------------------------------------------------
# Unpivot / melt (wide -> long)
# ---------------------------------------------------------------------------


@query(
    "q_unpivot",
    oracle="""
    SELECT event_type, metric, ROUND(val, 4) AS val
    FROM (
      SELECT event_type,
             ROUND(AVG(value), 4) AS avg_value,
             ROUND(MIN(value), 4) AS min_value,
             ROUND(MAX(value), 4) AS max_value
      FROM events GROUP BY 1
    ) UNPIVOT (val FOR metric IN (avg_value, min_value, max_value))
    """,
    tags=("relational",),
)
def q_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide-to-long unpivot (melt): per-type summary stats rotated into
    (metric, value) rows — the inverse of q_pivot. Spark's native unpivot
    is an Expand node: map-side row generation, zero extra shuffle beyond
    the feeding aggregate."""
    wide = (
        t(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(
            F.round(F.avg("value"), 4).alias("avg_value"),
            F.round(F.min("value"), 4).alias("min_value"),
            F.round(F.max("value"), 4).alias("max_value"),
        )
    )
    return wide.unpivot(
        ids=["event_type"],
        values=["avg_value", "min_value", "max_value"],
        variableColumnName="metric",
        valueColumnName="val",
    ).withColumn("val", F.round("val", 4))


# ---------------------------------------------------------------------------
# Period-over-period change
# ---------------------------------------------------------------------------


@query(
    "q_period_over_period",
    oracle="""
    WITH m AS (
      SELECT CAST(date_trunc('month', CAST(o_orderdate AS DATE)) AS DATE)
               AS month,
             SUM(o_totalprice) AS rev
      FROM orders GROUP BY 1
    )
    SELECT month, ROUND(rev, 2) AS revenue,
           ROUND(rev - lag(rev) OVER (ORDER BY month), 2) AS mom_change,
           ROUND((rev - lag(rev) OVER (ORDER BY month))
                 / lag(rev) OVER (ORDER BY month), 6) AS mom_pct
    FROM m
    """,
    tags=("timeseries", "windows"),
)
def q_period_over_period(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Month-over-month revenue deltas: lag over the monthly aggregate.
    The window runs on the post-aggregate (one row per month — calendar-
    bounded), so the single-partition global frame is harmless at any
    scale; the heavy lifting is the map-side-combined monthly rollup."""
    monthly = (
        t(spark, sf_dir, "orders")
        .groupBy(F.trunc(F.to_date("o_orderdate"), "month").alias("month"))
        .agg(F.sum("o_totalprice").alias("rev"))
    )
    w = Window.partitionBy().orderBy("month")
    prev = F.lag("rev").over(w)
    return monthly.select(
        "month",
        F.round("rev", 2).alias("revenue"),
        F.round(F.col("rev") - prev, 2).alias("mom_change"),
        F.round((F.col("rev") - prev) / prev, 6).alias("mom_pct"),
    )


# ---------------------------------------------------------------------------
# Keep-latest dedup (CDC-style compaction)
# ---------------------------------------------------------------------------


@query(
    "q_dedup_keep_latest",
    oracle="""
    SELECT user_id, event_id AS latest_event_id,
           CAST(ts AS TIMESTAMP) AS latest_ts, event_type AS latest_type
    FROM (
      SELECT *, row_number() OVER (PARTITION BY user_id
                                   ORDER BY CAST(ts AS TIMESTAMP) DESC,
                                            event_id DESC) AS rn
      FROM events
    ) WHERE rn = 1
    """,
    tags=("dedup",),
)
def q_dedup_keep_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC-style compaction: keep each key's most recent record (the upsert
    materialization every incremental ingest needs). row_number DESC with a
    deterministic event_id tie-break; Catalyst turns the rn=1 filter into
    WindowGroupLimit, so each partition keeps a 1-row heap instead of fully
    sorting its group."""
    w = Window.partitionBy("user_id").orderBy(
        F.desc("ts"), F.desc("event_id")
    )
    return (
        t(spark, sf_dir, "events")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            F.col("event_id").alias("latest_event_id"),
            F.col("ts").alias("latest_ts"),
            F.col("event_type").alias("latest_type"),
        )
    )


# ---------------------------------------------------------------------------
# Time-based RANGE frame (trailing window)
# ---------------------------------------------------------------------------


@query(
    "q_trailing_window",
    oracle="""
    WITH d AS (
      SELECT CAST(CAST(o_orderdate AS TIMESTAMP) AS DATE) AS day,
             SUM(o_totalprice) AS rev
      FROM orders GROUP BY 1
    )
    SELECT day, ROUND(rev, 2) AS revenue,
           ROUND(SUM(rev) OVER (ORDER BY day
                                RANGE BETWEEN INTERVAL 6 DAY PRECEDING
                                          AND CURRENT ROW), 2)
             AS trailing_7d,
           CAST(COUNT(*) OVER (ORDER BY day
                               RANGE BETWEEN INTERVAL 6 DAY PRECEDING
                                         AND CURRENT ROW) AS BIGINT)
             AS days_in_window
    FROM d
    """,
    tags=("timeseries", "windows"),
)
def q_trailing_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """7-day trailing revenue via a time-based RANGE frame — the frame is
    bounded by event-time distance, not row count, so sparse days widen
    correctly (a 6-row ROWS frame would be wrong across gaps). Spark range
    frames need a numeric sort key: days-since-epoch via datediff; the
    window runs over the daily post-aggregate (calendar-bounded)."""
    daily = (
        t(spark, sf_dir, "orders")
        .groupBy(F.to_date("o_orderdate").alias("day"))
        .agg(F.sum("o_totalprice").alias("rev"))
        .withColumn(
            "day_num", F.datediff("day", F.lit("1970-01-01").cast("date"))
        )
    )
    w = Window.partitionBy().orderBy("day_num").rangeBetween(-6, 0)
    return daily.select(
        "day",
        F.round("rev", 2).alias("revenue"),
        F.round(F.sum("rev").over(w), 2).alias("trailing_7d"),
        F.count(F.lit(1)).over(w).alias("days_in_window"),
    )


# ---------------------------------------------------------------------------
# Event-transition (Markov) counts
# ---------------------------------------------------------------------------


@query(
    "q_event_transitions",
    oracle="""
    WITH n AS (
      SELECT event_type,
             lead(event_type) OVER (PARTITION BY user_id
                                    ORDER BY CAST(ts AS TIMESTAMP), event_id)
               AS next_type
      FROM events
    )
    SELECT event_type, next_type, COUNT(*) AS n,
           ROUND(COUNT(*) * 1.0e0
                 / SUM(COUNT(*)) OVER (PARTITION BY event_type), 6)
             AS transition_prob
    FROM n WHERE next_type IS NOT NULL
    GROUP BY 1, 2
    """,
    tags=("timeseries", "windows"),
)
def q_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event sequences:
    (type -> next type) counts and row-normalized probabilities. One
    user_id shuffle for the lead(), then a combinable pair-count; the
    normalizing window runs over the type x type matrix (bounded by the
    event-type vocabulary, not the data)."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (
        t(spark, sf_dir, "events")
        .select(
            "event_type", F.lead("event_type").over(w).alias("next_type")
        )
        .filter(F.col("next_type").isNotNull())
    )
    counts = pairs.groupBy("event_type", "next_type").agg(
        F.count(F.lit(1)).alias("n")
    )
    w_norm = Window.partitionBy("event_type")
    return counts.select(
        "event_type",
        "next_type",
        "n",
        F.round(F.col("n") / F.sum("n").over(w_norm), 6).alias(
            "transition_prob"
        ),
    )


# ---------------------------------------------------------------------------
# Raw-SQL interface parity (spark.sql over registered views)
# ---------------------------------------------------------------------------

_NATION_RANK_SQL = """
    WITH r AS (
      SELECT n.n_name, SUM(o.o_totalprice) AS rev
      FROM orders o
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation n ON c.c_nationkey = n.n_nationkey
      GROUP BY n.n_name
    )
    SELECT n_name, ROUND(rev, 2) AS revenue,
           CAST(rank() OVER (ORDER BY rev DESC, n_name) AS INTEGER) AS rk
    FROM r
"""


@query("q_sql_interface", oracle=_NATION_RANK_SQL, tags=("relational",))
def q_sql_interface(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The raw-SQL migration path: the reference's users write dbt SQL, so
    the engine must take ANSI SQL strings directly. register_testdata
    exposes every table as a view and the SAME text runs on spark.sql and
    on the DuckDB oracle — dialect-free by construction. Catalyst still
    plans it (broadcast dims, partial aggs); SQL-vs-DataFrame is purely a
    frontend choice."""
    from weather_api_automate_etl_spark.sources.tables import register_testdata

    register_testdata(spark, sf_dir)
    return spark.sql(_NATION_RANK_SQL)


# ---------------------------------------------------------------------------
# Salted join (skew-safe shuffled equi-join) as an oracle-checked contract
# ---------------------------------------------------------------------------


@query(
    "q_salted_join",
    oracle="""
    SELECT l.l_orderkey, l.l_linenumber, o.o_orderpriority,
           ROUND(l.l_extendedprice, 2) AS price
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    """,
    tags=("joins", "skew"),
)
def q_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-safe shuffled join, result-identical to the plain equi-join the
    oracle runs: the big (lineitem) side is salted 8 ways, the orders side
    replicated across salts, joined on (key, salt) — hot orderkeys spread
    over 8 reducers instead of one. The contract pins that salting is
    semantics-preserving; operators/skew.py guards the join types where
    that holds."""
    li = t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_extendedprice"
    )
    orders = t(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    return skew.salted_join(
        li,
        orders.withColumnRenamed("o_orderkey", "l_orderkey"),
        on="l_orderkey",
        salt_from="l_linenumber",
        n_salts=8,
    ).select(
        "l_orderkey",
        "l_linenumber",
        "o_orderpriority",
        F.round("l_extendedprice", 2).alias("price"),
    )


# ---------------------------------------------------------------------------
# Snapshot diff (CDC classification between two table versions)
# ---------------------------------------------------------------------------


@query(
    "q_snapshot_diff",
    oracle="""
    WITH old AS (
      SELECT o_orderkey, o_orderstatus, o_totalprice
      FROM orders WHERE o_orderkey % 7 <> 0
    ),
    new AS (
      SELECT o_orderkey, o_orderstatus,
             CASE WHEN o_orderkey % 3 = 0
                  THEN ROUND(o_totalprice + 10, 2)
                  ELSE o_totalprice END AS o_totalprice
      FROM orders WHERE o_orderkey % 5 <> 0
    )
    SELECT coalesce(n.o_orderkey, o.o_orderkey) AS o_orderkey,
           CASE WHEN o.o_orderkey IS NULL THEN 'added'
                WHEN n.o_orderkey IS NULL THEN 'removed'
                WHEN o.o_orderstatus IS DISTINCT FROM n.o_orderstatus
                     OR o.o_totalprice IS DISTINCT FROM n.o_totalprice
                  THEN 'changed'
                ELSE 'unchanged' END AS change_type,
           n.o_orderstatus, n.o_totalprice
    FROM old o FULL OUTER JOIN new n ON o.o_orderkey = n.o_orderkey
    """,
    tags=("cdc", "joins"),
)
def q_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dbt-snapshot-style CDC diff between two deterministic versions of
    orders (old drops every 7th key; new drops every 5th and bumps every
    3rd price): added / removed / changed / unchanged per key via one
    full-outer join on md5 row-hashes computed map-side
    (operators/cdc.py::snapshot_diff). The oracle classifies by direct
    column comparison — hash-vs-compare equivalence is the point."""
    from weather_api_automate_etl_spark.operators import cdc

    orders = t(spark, sf_dir, "orders")
    old = orders.filter(F.col("o_orderkey") % 7 != 0).select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    new = orders.filter(F.col("o_orderkey") % 5 != 0).select(
        "o_orderkey",
        "o_orderstatus",
        F.when(
            F.col("o_orderkey") % 3 == 0, F.round(F.col("o_totalprice") + 10, 2)
        )
        .otherwise(F.col("o_totalprice"))
        .alias("o_totalprice"),
    )
    return cdc.snapshot_diff(
        old, new, key="o_orderkey", compare_cols=["o_orderstatus", "o_totalprice"]
    )


# ---------------------------------------------------------------------------
# Group-wise standardization (z-score feature normalization)
# ---------------------------------------------------------------------------


@query(
    "q_zscore",
    oracle="""
    SELECT event_id, event_type,
           ROUND((value - AVG(value) OVER w)
                 / NULLIF(STDDEV_SAMP(value) OVER w, 0), 6) AS z
    FROM events
    WINDOW w AS (PARTITION BY event_type)
    """,
    tags=("windows", "agg"),
)
def q_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group feature standardization: z = (v - mean)/stddev within each
    event_type — the normalization step every training pipeline runs before
    modeling. One shuffle on the group key; mean and stddev share the same
    unordered window frame, so Spark computes both in a single pass. The
    NULLIF guard makes constant groups yield NULL, matching the oracle."""
    w = Window.partitionBy("event_type")
    std = F.stddev_samp("value").over(w)
    return t(spark, sf_dir, "events").select(
        "event_id",
        "event_type",
        F.round(
            (F.col("value") - F.avg("value").over(w))
            / F.when(std != 0, std),
            6,
        ).alias("z"),
    )


# ---------------------------------------------------------------------------
# Type-2 SCD (dbt snapshot semantics)
# ---------------------------------------------------------------------------


@query(
    "q_scd2",
    oracle="""
    WITH oldv AS (
      SELECT o_orderkey, o_orderstatus, o_totalprice
      FROM orders WHERE o_orderkey % 7 <> 0
    ),
    newv AS (
      SELECT o_orderkey, o_orderstatus,
             CASE WHEN o_orderkey % 3 = 0
                  THEN ROUND(o_totalprice + 10, 2)
                  ELSE o_totalprice END AS o_totalprice
      FROM orders WHERE o_orderkey % 5 <> 0
    ),
    j AS (
      SELECT o.o_orderkey AS ck, o.o_orderstatus AS cs, o.o_totalprice AS cp,
             n.o_orderkey AS uk, n.o_orderstatus AS us, n.o_totalprice AS up
      FROM oldv o FULL OUTER JOIN newv n ON o.o_orderkey = n.o_orderkey
    )
    SELECT o_orderkey, o_orderstatus, o_totalprice,
           TIMESTAMP '2023-01-01' AS valid_from,
           TIMESTAMP '2024-01-01' AS valid_to
    FROM oldv WHERE o_orderkey % 11 = 0
    UNION ALL
    SELECT ck, cs, cp, TIMESTAMP '2024-01-01', CAST(NULL AS TIMESTAMP)
    FROM j WHERE ck IS NOT NULL AND uk IS NOT NULL
      AND NOT (cs IS DISTINCT FROM us OR cp IS DISTINCT FROM up)
    UNION ALL
    SELECT ck, cs, cp, TIMESTAMP '2024-01-01', TIMESTAMP '2024-06-01'
    FROM j WHERE ck IS NOT NULL
      AND (uk IS NULL OR cs IS DISTINCT FROM us OR cp IS DISTINCT FROM up)
    UNION ALL
    SELECT uk, us, up, TIMESTAMP '2024-06-01', CAST(NULL AS TIMESTAMP)
    FROM j WHERE uk IS NOT NULL
      AND (ck IS NULL OR cs IS DISTINCT FROM us OR cp IS DISTINCT FROM up)
    """,
    tags=("cdc", "joins"),
)
def q_scd2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Type-2 SCD merge (dbt snapshot semantics, operators/cdc.py::
    scd2_apply): a seeded dimension (current slice = the q_snapshot_diff
    'old' version, plus closed history rows for every 11th key) folds in
    one update batch — changed keys close + reopen, vanished keys close,
    new keys open, history passes through untouched. The oracle derives
    the same four row classes with IS DISTINCT FROM comparisons."""
    from weather_api_automate_etl_spark.operators import cdc

    orders = t(spark, sf_dir, "orders")
    oldv = orders.filter(F.col("o_orderkey") % 7 != 0).select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    newv = orders.filter(F.col("o_orderkey") % 5 != 0).select(
        "o_orderkey",
        "o_orderstatus",
        F.when(
            F.col("o_orderkey") % 3 == 0, F.round(F.col("o_totalprice") + 10, 2)
        )
        .otherwise(F.col("o_totalprice"))
        .alias("o_totalprice"),
    )
    hist = oldv.filter(F.col("o_orderkey") % 11 == 0).select(
        "*",
        F.lit("2023-01-01").cast("timestamp_ntz").alias("valid_from"),
        F.lit("2024-01-01").cast("timestamp_ntz").alias("valid_to"),
    )
    cur = oldv.select(
        "*",
        F.lit("2024-01-01").cast("timestamp_ntz").alias("valid_from"),
        F.lit(None).cast("timestamp_ntz").alias("valid_to"),
    )
    return cdc.scd2_apply(
        hist.unionByName(cur),
        newv,
        key="o_orderkey",
        compare_cols=["o_orderstatus", "o_totalprice"],
        batch_ts="2024-06-01",
    )


# ---------------------------------------------------------------------------
# Robust-stats outlier handling + per-group embedding centroids (round 4)
# ---------------------------------------------------------------------------


@query(
    "q_winsorize",
    oracle="""
    WITH q AS (
      SELECT event_type,
             quantile_cont(value, 0.05) AS lo,
             quantile_cont(value, 0.95) AS hi
      FROM events GROUP BY event_type
    )
    SELECT e.event_type,
           CAST(COUNT(*) FILTER (WHERE value < lo) AS BIGINT) AS n_clamped_lo,
           CAST(COUNT(*) FILTER (WHERE value > hi) AS BIGINT) AS n_clamped_hi,
           ROUND(AVG(value), 6) AS mean_raw,
           ROUND(AVG(CASE WHEN value < lo THEN lo
                          WHEN value > hi THEN hi
                          ELSE value END), 6) AS mean_winsor
    FROM events e JOIN q USING (event_type)
    GROUP BY e.event_type
    """,
    tags=("agg",),
)
def q_winsorize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorized robust aggregation: clamp each group's values to its own
    exact [p05, p95] before averaging — the outlier-taming step quality
    filters apply before thresholding on corpus statistics. Two aggregate
    passes over the data (quantiles, then clamped stats) joined through a
    broadcast group-cardinality quantile table; Spark's exact
    ``percentile`` and DuckDB's ``quantile_cont`` share linear-interpolation
    semantics, so the twins agree to the rounded digit."""
    ev = t(spark, sf_dir, "events")
    q = ev.groupBy("event_type").agg(
        F.expr("percentile(value, 0.05)").alias("lo"),
        F.expr("percentile(value, 0.95)").alias("hi"),
    )
    clamped = F.when(F.col("value") < F.col("lo"), F.col("lo")).when(
        F.col("value") > F.col("hi"), F.col("hi")
    ).otherwise(F.col("value"))
    return (
        ev.join(F.broadcast(q), "event_type")
        .groupBy("event_type")
        .agg(
            F.count(F.when(F.col("value") < F.col("lo"), 1)).alias("n_clamped_lo"),
            F.count(F.when(F.col("value") > F.col("hi"), 1)).alias("n_clamped_hi"),
            F.round(F.avg("value"), 6).alias("mean_raw"),
            F.round(F.avg(clamped), 6).alias("mean_winsor"),
        )
    )


@query(
    "q_group_centroids",
    oracle="""
    SELECT label,
           pos - 1 AS dim,
           ROUND(AVG(CAST(v AS DOUBLE)), 6) AS centroid_val
    FROM (
      SELECT label,
             unnest(embedding) AS v,
             generate_subscripts(embedding, 1) AS pos
      FROM embeddings
    )
    WHERE pos <= 8
    GROUP BY label, pos
    """,
    tags=("similarity", "agg"),
)
def q_group_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label embedding centroids (operators/similarity.py::centroids_by
    — the k-means/IVF build step), exposed as scalar (label, dim, value)
    rows over the first 8 dimensions so the driver canonicalization stays
    array-free. One shuffle of (label, pos) partials; the assign step is
    driver-verified separately (q_centroid_assign)."""
    from weather_api_automate_etl_spark.operators import similarity

    emb = t(spark, sf_dir, "embeddings")
    cents = similarity.centroids_by(emb, "embedding", "label")
    return (
        cents.select(
            F.col("list_id").alias("label"),
            F.posexplode("centroid").alias("dim", "v"),
        )
        .filter(F.col("dim") < 8)
        .select(
            "label",
            F.col("dim").cast("long").alias("dim"),
            F.round("v", 6).alias("centroid_val"),
        )
    )
