"""Event-time and analytic window operators over the ``events`` stream table.

Extension surface (SURVEY.md §2.7 E4/E5). The reference's "stream" is a
daily scheduled micro-batch (dags/weatherstack_full_pipeline.py:124); these
operators give the real event-time story: tumbling windows (batch here,
watermarked streaming twin in streaming/events.py), ranking/lag analytics,
and gap-based sessionization.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.window import Window


def tumbling_window_agg(
    df: DataFrame, ts_col: str = "ts", duration: str = "1 hour"
) -> DataFrame:
    """Tumbling event-time windows: per (window, event_type) count + value sum.

    Uses Spark's native ``window()`` operator — identical code runs under
    Structured Streaming with a watermark (streaming/events.py)."""
    return (
        df.groupBy(F.window(F.col(ts_col), duration).alias("w"), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            F.col("w.start").cast("timestamp_ntz").alias("window_start"),
            "event_type",
            "n",
            "total_value",
        )
    )


def rank_and_lag(df: DataFrame) -> DataFrame:
    """Per-user ordered analytics: sequence number + microsecond gap to the
    previous event. One shuffle on user_id; ordering key (ts, event_id) is
    deterministic under ties."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    epoch = F.unix_micros(F.col("ts").cast("timestamp"))
    return df.select(
        "event_id",
        "user_id",
        F.row_number().over(w).alias("seq"),
        (epoch - F.lag(epoch).over(w)).alias("gap_us"),
    )


def sessionize(df: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Gap-based sessionization: a new session starts when a user is idle
    longer than ``gap_minutes``. Session id = running count of session
    starts (two window passes over the same user_id partitioning — Spark
    reuses the shuffle)."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    epoch = F.unix_micros(F.col("ts").cast("timestamp"))
    gap = epoch - F.lag(epoch).over(w)
    is_new = F.when(
        gap.isNull() | (gap > gap_minutes * 60 * 1_000_000), 1
    ).otherwise(0)
    with_sess = df.withColumn("__new", is_new).withColumn(
        "session_seq", F.sum("__new").over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    return (
        with_sess.groupBy("user_id", "session_seq")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.round(F.sum("value"), 2).alias("session_value"),
        )
    )


def path_ngrams(
    df: DataFrame,
    entity_col: str,
    order_cols: Sequence[str],
    step_col: str,
    n: int = 3,
    top_k: int = 20,
) -> DataFrame:
    """Top-k most common length-``n`` paths (consecutive step n-grams)
    across entities' ordered event sequences — the navigation-mining
    extension of pairwise transitions (q_event_transitions): "view >
    click > purchase" is invisible to a bigram matrix but is THE funnel
    a product team asks for.

    One window shuffle per entity forms the n-grams via (n−1) stacked
    ``lead``s — map-side once partitioned, no self-joins, no per-entity
    collect — then a plain count + global top-k (TakeOrdered, never a
    full sort). Ties break lexicographically on the path so top-k is
    deterministic. Returns (path, n_occurrences), path as
    ' > '-joined steps."""
    if n < 2:
        raise ValueError(f"path_ngrams needs n >= 2, got {n}")
    if top_k < 1:
        raise ValueError(f"path_ngrams needs top_k >= 1, got {top_k}")
    w = Window.partitionBy(entity_col).orderBy(
        *[F.col(c) for c in order_cols]
    )
    steps = [F.col(step_col)] + [
        F.lead(step_col, i).over(w) for i in range(1, n)
    ]
    # EVERY step must be non-null, not just the last lead: a NULL step
    # VALUE mid-sequence would otherwise be skipped by concat_ws,
    # gluing non-adjacent steps into a false (n-1)-length "n-gram"
    all_present = steps[0].isNotNull()
    for s in steps[1:]:
        all_present = all_present & s.isNotNull()
    grams = df.select(
        F.when(all_present, F.concat_ws(" > ", *steps)).alias("path")
    ).filter(F.col("path").isNotNull())
    return (
        grams.groupBy("path")
        .agg(F.count(F.lit(1)).alias("n_occurrences"))
        .orderBy(F.desc("n_occurrences"), F.asc("path"))
        .limit(top_k)
    )


def longest_streak(
    df: DataFrame,
    key_col: str,
    date_col,
) -> DataFrame:
    """Longest run of CONSECUTIVE calendar days with activity per key —
    the gaps-and-islands classic (user streaks, sensor uptime runs,
    SLA continuity) via the row_number subtraction trick: for distinct
    active days ordered per key, ``day − row_number`` is constant
    exactly within a consecutive run, so one date-arithmetic expression
    labels every island without a self-join or iteration.

    Scale shape: one distinct over (key, day) — collapsing raw events
    to at most days-per-key rows — one key-partitioned row_number
    window, one (key, island) count, one key-keyed argmax window. All
    shuffles on the key; per-key state is bounded by the calendar,
    never raw row count. Ties on equal streak length break to the
    EARLIEST streak start (deterministic cut keys).

    Returns ``(key, n_active_days, longest_streak, streak_start)``.
    """
    d = (
        date_col if not isinstance(date_col, str) else F.col(date_col)
    )
    days = df.select(
        F.col(key_col).alias("__k"), d.cast("date").alias("__d")
    ).distinct()
    w = Window.partitionBy("__k").orderBy("__d")
    islands = days.select(
        "__k",
        "__d",
        F.date_sub("__d", F.row_number().over(w)).alias("__island"),
    )
    runs = islands.groupBy("__k", "__island").agg(
        F.count(F.lit(1)).alias("__len"), F.min("__d").alias("__start")
    )
    pick = Window.partitionBy("__k").orderBy(
        F.desc("__len"), F.asc("__start")
    )
    totals = days.groupBy("__k").agg(
        F.count(F.lit(1)).alias("__n_days")
    )
    best = (
        runs.withColumn("__rn", F.row_number().over(pick))
        .filter(F.col("__rn") == 1)
        .select("__k", "__len", "__start")
    )
    return totals.join(best, "__k").select(
        F.col("__k").alias(key_col),
        F.col("__n_days").cast("long").alias("n_active_days"),
        F.col("__len").cast("long").alias("longest_streak"),
        F.col("__start").alias("streak_start"),
    )


def coalesce_intervals(
    df: DataFrame,
    key_col: str,
    start_col,
    end_col,
) -> DataFrame:
    """Merge overlapping/touching intervals per key (interval union —
    the other gaps-and-islands: ``longest_streak`` merges consecutive
    DAYS, this merges arbitrary [start, end] ranges): an interval opens
    a new island iff its start exceeds the running max end of everything
    before it in start order. Covered-time arithmetic runs on exact
    BIGINT epoch micros, so island membership and durations are
    order-independent and engine-reproducible.

    Shape: ONE shuffle on the key; both window passes (running-max end,
    running island count) and the final island aggregate share that
    partitioning, so Spark plans a single Exchange and the whole merge
    is map-side after it. Skewed keys ride AQE; nothing is ever
    collected. Returns one row per merged island:
    ``(key, island_seq, island_start_us, island_end_us, n_intervals,
    covered_us)`` — island_seq is 1-based in start order.
    """
    s = (
        start_col if isinstance(start_col, Column) else F.col(start_col)
    ).cast("long")
    e = (end_col if isinstance(end_col, Column) else F.col(end_col)).cast(
        "long"
    )
    base = df.select(
        F.col(key_col).alias("__k"), s.alias("__s"), e.alias("__e")
    )
    w = Window.partitionBy("__k").orderBy("__s", "__e")
    prev_max_end = F.max("__e").over(
        w.rowsBetween(Window.unboundedPreceding, -1)
    )
    opened = base.withColumn(
        "__new",
        F.when(
            prev_max_end.isNull() | (F.col("__s") > prev_max_end), 1
        ).otherwise(0),
    ).withColumn(
        "island_seq",
        F.sum("__new").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return (
        opened.groupBy("__k", "island_seq")
        .agg(
            F.min("__s").alias("island_start_us"),
            F.max("__e").alias("island_end_us"),
            F.count(F.lit(1)).cast("long").alias("n_intervals"),
        )
        .select(
            F.col("__k").alias(key_col),
            F.col("island_seq").cast("long").alias("island_seq"),
            "island_start_us",
            "island_end_us",
            "n_intervals",
            (F.col("island_end_us") - F.col("island_start_us")).alias(
                "covered_us"
            ),
        )
    )


def rolling_active_users(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    window_days: int = 7,
) -> DataFrame:
    """Trailing-window distinct active users per day (the WAU/rolling-
    actives engagement metric): for each event day d, the count of
    users with ≥ 1 event in [d−(w−1), d]. A sliding DISTINCT cannot be
    a window function (distinct state doesn't retract), so the scale
    shape is the standard contribute-forward rewrite: dedupe to
    (user, day) grain first — the ONLY row-scale shuffle — then each
    user-day contributes to its w target days (a bounded ×w map-side
    explode of the already-deduped grain), dedupe (user, target), and
    count per target day. Target days are clamped to days that exist
    in the data (tiny distinct-days broadcast), so the tail beyond the
    last event day is not reported.

    Returns ``(day, n_active)`` with exact counts.
    """
    if window_days < 1:
        raise ValueError(f"window_days must be >= 1, got {window_days}")
    user_days = df.select(
        F.col(user_col).alias("__u"),
        F.to_date(F.col(ts_col).cast("timestamp")).alias("__d"),
    ).distinct()
    days = user_days.select(F.col("__d").alias("day")).distinct()
    offsets = F.explode(
        F.array(*[F.lit(i) for i in range(window_days)])
    )
    contrib = (
        user_days.select("__u", "__d", offsets.alias("__i"))
        .select("__u", F.date_add(F.col("__d"), F.col("__i")).alias("day"))
        .distinct()
    )
    return (
        contrib.join(F.broadcast(days), "day")
        .groupBy("day")
        .agg(F.count(F.lit(1)).cast("long").alias("n_active"))
    )


def new_vs_returning(
    df: DataFrame,
    user_col: str,
    ts_col: str,
) -> DataFrame:
    """Daily new-vs-returning split (the acquisition-vs-retention lens
    every engagement dashboard opens with): a user is NEW on their
    first-ever event day, RETURNING on any later day. One dedupe to
    (user, day) grain, one per-user min-day aggregate joined back on
    the user key (co-partitioned with the grain shuffle), one day
    rollup. Exact counts; days with no users never appear.

    Returns ``(day, n_new, n_returning, n_active)``.
    """
    user_days = df.select(
        F.col(user_col).alias("__u"),
        F.to_date(F.col(ts_col).cast("timestamp")).alias("__d"),
    ).distinct()
    first_day = user_days.groupBy("__u").agg(F.min("__d").alias("__first"))
    tagged = user_days.join(first_day, "__u").select(
        F.col("__d").alias("day"),
        (F.col("__d") == F.col("__first")).cast("int").alias("__new"),
    )
    return tagged.groupBy("day").agg(
        F.sum("__new").cast("long").alias("n_new"),
        F.sum(F.lit(1) - F.col("__new")).cast("long").alias("n_returning"),
        F.count(F.lit(1)).cast("long").alias("n_active"),
    )
