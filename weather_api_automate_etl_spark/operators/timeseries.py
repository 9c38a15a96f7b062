"""Time-series detection operators: trailing rolling median, seasonal
(dow × hour) baseline residuals, sweep-line interval concurrency, CUSUM
change-point localization, and cumulative-distinct windows.

DataFrame-in → DataFrame-out so the contract queries, the pytest
differential tests, and the stress harness all exercise the SAME
expression tree. Per-series windows are always PARTITIONED — none of
these ever sorts a global timeline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from weather_api_automate_etl_spark.functions.core import pg_dow, pg_hour


def trailing_median(
    df: DataFrame,
    series_col: str,
    value_col: str,
    order_cols: tuple[str, ...],
    window_rows: int = 8,
    keep_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Trailing median of each series' last ``window_rows`` observations
    — the robust smoothing baseline (EWMA's outlier-immune sibling: one
    wild value shifts an EWMA for the whole decay tail but leaves the
    rolling median untouched). Spark has no percentile window over a
    moving frame, so the frame is collected per row (one window shuffle
    on the series key, frame bounded at ``window_rows``), sorted, and
    interpolated with the exact ``lo + (hi − lo)·0.5`` form
    quantile_cont uses — spelled identically so even the last-ulp
    arithmetic matches a windowed-quantile_cont oracle."""
    w = (
        Window.partitionBy(series_col)
        .orderBy(*[F.col(c) for c in order_cols])
        .rowsBetween(-(window_rows - 1), 0)
    )
    arr = F.array_sort(F.collect_list(value_col).over(w))
    n = F.size(arr)
    lo = F.element_at(arr, (n / 2).cast("int"))
    hi = F.element_at(arr, (n / 2).cast("int") + 1)
    # n > 0 guard: collect_list skips NULLs, so an all-null frame is
    # EMPTY — element_at(arr, 0) would raise INVALID_INDEX_OF_ZERO where
    # the windowed-quantile oracle returns NULL (third-review finding)
    med = F.when(
        n % 2 == 1, F.element_at(arr, ((n + 1) / 2).cast("int"))
    ).when(n > 0, lo + (hi - lo) * F.lit(0.5))
    return df.select(
        *keep_cols,
        series_col,
        value_col,
        F.round(med, 6).alias("trailing_median"),
    )


def seasonal_baseline(
    df: DataFrame,
    group_col: str,
    ts_col: str,
    value_col: str,
    keep_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Seasonal-naive baseline per (group, day-of-week, hour) with
    per-row residuals — the first-order seasonality model anomaly
    alerting diffs against before reaching for real forecasting. Uses
    the reference's Postgres calendar semantics (dow 0=Sunday). The
    baseline table is (groups × 7 × 24) rows — one map-side-combined
    aggregate broadcast back; baselines round BEFORE the residual
    subtraction so residuals can't flip on aggregation-order ulps."""
    base = df.select(
        *keep_cols,
        group_col,
        value_col,
        pg_dow(ts_col).alias("dow"),
        pg_hour(ts_col).alias("hr"),
    )
    b = base.groupBy(group_col, "dow", "hr").agg(
        F.round(F.avg(value_col), 6).alias("baseline")
    )
    return base.join(F.broadcast(b), [group_col, "dow", "hr"]).select(
        *keep_cols,
        group_col,
        value_col,
        "dow",
        "hr",
        "baseline",
        F.round(F.col(value_col) - F.col("baseline"), 6).alias("residual"),
    )


def concurrency_peak(
    df: DataFrame,
    group_col: str,
    start_col: str,
    duration_s_col: str,
) -> DataFrame:
    """Peak interval concurrency per group by the classic sweep line:
    each row spans [start, start + max(1, ⌊duration⌋) seconds); +1/−1
    boundary points, a running sum in time order, max of the running
    load. The running sum uses the DEFAULT window frame (RANGE …CURRENT
    ROW): all peers of a timestamp are included together, so the load at
    a tie is order-independent; starts sort before ends (delta DESC), so
    touching intervals count as overlapping. One window shuffle
    partitioned by the group — never a global timeline sort."""
    iv = df.select(
        group_col,
        F.col(start_col).alias("s"),
        (
            F.col(start_col)
            + F.expr(
                f"make_dt_interval(0, 0, 0, greatest(1.0, floor({duration_s_col})))"
            )
        ).alias("e"),
    )
    pts = iv.select(
        group_col, F.col("s").alias("t"), F.lit(1).alias("delta")
    ).unionAll(
        iv.select(group_col, F.col("e").alias("t"), F.lit(-1).alias("delta"))
    )
    w = Window.partitionBy(group_col).orderBy(
        F.col("t").asc(), F.col("delta").desc()
    )
    cum = pts.select(group_col, F.sum("delta").over(w).alias("load"))
    return cum.groupBy(group_col).agg(
        F.max("load").cast("int").alias("peak_concurrency"),
        (F.count(F.lit(1)) / 2).cast("long").alias("n_intervals"),
    )


def cusum_changepoint(
    df: DataFrame,
    group_col: str,
    value_col: str,
    order_cols: tuple[str, ...],
    id_col: str,
) -> DataFrame:
    """CUSUM mean-shift detection per group: running sum of standardized
    residuals in time order; the change point is the row where |CUSUM|
    peaks (ties → earliest). Group mean/stddev round to 6 BEFORE
    standardizing (aggregation-order ulps stop at the rounding), and the
    argmax reads the ROUNDED cusum with the order-column tie-break — the
    last-ulp-proof argmax recipe. One stats aggregate broadcast back +
    one per-group ordered running sum + one argmax window, all on the
    same key."""
    s = df.groupBy(group_col).agg(
        F.round(F.avg(value_col), 6).alias("mu"),
        F.round(F.stddev_samp(value_col), 6).alias("sd"),
    )
    order = [F.col(c) for c in order_cols]
    # order columns may include the id itself — don't select it twice
    extra_order = [c for c in order_cols if c not in (id_col, group_col)]
    wsum = (
        Window.partitionBy(group_col)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    c = df.join(F.broadcast(s), group_col).select(
        id_col,
        group_col,
        *extra_order,
        F.round(
            F.sum(
                (F.col(value_col) - F.col("mu"))
                / F.when(F.col("sd") != 0, F.col("sd"))
            ).over(wsum),
            6,
        ).alias("cusum"),
    )
    wpick = Window.partitionBy(group_col).orderBy(
        F.abs(F.col("cusum")).desc(), *order
    )
    picked = c.withColumn("rn", F.row_number().over(wpick))
    agg = c.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.max(F.abs(F.col("cusum"))).alias("max_abs_cusum"),
    )
    return agg.join(
        picked.filter(F.col("rn") == 1).select(
            group_col, F.col(id_col).alias("change_event_id")
        ),
        group_col,
    ).select(
        group_col,
        F.col("n_events").cast("long").alias("n_events"),
        "max_abs_cusum",
        "change_event_id",
    )


def cumulative_distinct(
    df: DataFrame,
    series_col: str,
    kind_col: str,
    order_cols: tuple[str, ...],
    id_col: str,
) -> DataFrame:
    """Running count of distinct kinds each series has seen — the
    exploration/breadth signal that a naive COUNT(DISTINCT) OVER would
    need full-history state for. The first-seen trick makes it two plain
    windows: flag each (series, kind)'s first occurrence (one window
    keyed by series+kind), then a running sum of flags per series —
    O(1) state per row, both windows partitioned, no distinct-set
    accumulation anywhere."""
    order = [F.col(c) for c in order_cols]
    extra_order = [c for c in order_cols if c not in (id_col, series_col)]
    wf = Window.partitionBy(series_col, kind_col).orderBy(*order)
    ws = (
        Window.partitionBy(series_col)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    f = df.select(
        id_col,
        series_col,
        *extra_order,
        F.when(F.row_number().over(wf) == 1, 1).otherwise(0).alias("first_seen"),
    )
    return f.select(
        id_col,
        series_col,
        F.sum("first_seen").over(ws).cast("long").alias("n_types_so_far"),
    )


def burstiness(
    df: DataFrame,
    series_col: str,
    ts_col: str,
    order_cols: tuple[str, ...],
) -> DataFrame:
    """Goh–Barabási burstiness of each series' inter-arrival times:
    B = (σ − μ)/(σ + μ) over the gaps between consecutive events —
    −1 for a perfectly periodic stream, ≈0 for Poisson arrivals, →1 for
    extreme bursts. The traffic-shape diagnostic behind rate-limit and
    capacity decisions. Gaps are wall-clock second-boundary counts
    (the quality.freshness recipe — DST-proof on TIMESTAMP_NTZ); one
    per-series lag window plus one moment aggregate. Series with fewer
    than 2 gaps, or with zero σ+μ, yield NULL."""
    w = Window.partitionBy(series_col).orderBy(*[F.col(c) for c in order_cols])
    gaps = (
        df.select(
            series_col,
            F.col(ts_col).alias("t"),
            F.lag(ts_col).over(w).alias("tp"),
        )
        .filter(F.col("tp").isNotNull())
        .select(
            series_col,
            F.expr(
                "timestampdiff(SECOND, date_trunc('second', tp),"
                " date_trunc('second', t))"
            ).cast("double").alias("gap"),
        )
    )
    m = gaps.groupBy(series_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_gaps"),
        F.round(F.avg("gap"), 6).alias("mu"),
        F.round(F.stddev_samp("gap"), 6).alias("sigma"),
    )
    from weather_api_automate_etl_spark.operators.stats import round0

    b = (F.col("sigma") - F.col("mu")) / F.when(
        F.col("sigma") + F.col("mu") != 0, F.col("sigma") + F.col("mu")
    )
    return m.select(
        series_col,
        "n_gaps",
        "mu",
        "sigma",
        # round0: σ−μ is an aggregated near-zero-able quantity (Poisson
        # streams sit at B ≈ 0) — the −0.0 hash hazard
        round0(b, 6).alias("burstiness"),
    )


def seasonal_decompose(
    df: DataFrame,
    series_col: str,
    date_col: str,
    value_col: str,
    period: int = 7,
) -> DataFrame:
    """Additive seasonal decomposition y = trend + seasonal + residual —
    the classical-decomposition core of STL, expressed entirely in
    windows and aggregates (no iteration, no loess):

    - TREND: centered ``period``-row moving average per series, defined
      only where the frame is FULL (edges get NULL trend — a half-window
      average is a different, biased statistic);
    - SEASONAL: mean of the detrended values per phase
      (``datediff mod period``), centered by subtracting the per-series
      grand mean of the phase effects so the seasonal component sums to
      ~0 and the trend keeps the level — the standard identifiability
      convention;
    - RESIDUAL: what remains; NULL wherever trend is (the decomposition
      is undefined there, and an explicit NULL beats a silent 0).

    Cross-engine exactness discipline: naive round-6 clamping at every
    interface FAILS here — the detrended values live on a decimal grid
    (integer y minus a 6-digit trend), so phase-mean sums land exactly ON
    .5e-6 rounding boundaries where engine summation order flips the last
    digit (measured on the events fixture). Instead the phase means are
    computed from EXACT scaled integers: each detrended value becomes a
    round-to-nearest ``×1e6`` BIGINT (row-local, deterministic), the
    per-phase SUM is exact integer arithmetic (order-free), and the mean
    is a single double division — bit-identical on any engine. Only the
    phase-count-sized grand-mean average stays a double sum, where the
    operands are generic (off-grid) doubles and the usual round-6
    boundary risk is measure-zero. Cost: one per-series window pass + one
    phase-cardinality aggregate joined back broadcast; phases are
    ROW-POSITION-free (calendar mod), so a gap in the series shifts
    nothing."""
    if period < 2:
        raise ValueError(f"period must be >= 2, got {period}")
    half = period // 2
    w = (
        Window.partitionBy(series_col)
        .orderBy(date_col)
        .rowsBetween(-half, period - 1 - half)
    )
    y = F.col(value_col)
    trend = F.when(
        F.count(value_col).over(w) == period,
        F.round(F.avg(value_col).over(w), 6),
    )
    phase = F.pmod(
        F.datediff(F.col(date_col), F.to_date(F.lit("1970-01-01"))),
        F.lit(period),
    ).cast("int")
    base = df.select(
        series_col,
        F.col(date_col),
        y.alias("y"),
        trend.alias("trend"),
        phase.alias("__phase"),
    )
    detr = base.filter(F.col("trend").isNotNull()).select(
        series_col,
        "__phase",
        # row-local exact scaled integer: both engines see the same double
        # and map it to the same BIGINT
        F.round((F.col("y") - F.col("trend")) * F.lit(1e6), 0)
        .cast("long")
        .alias("__d6"),
    )
    pm = detr.groupBy(series_col, "__phase").agg(
        # exact integer sum → ONE double division: order-free, engine-exact
        (
            (F.sum("__d6").cast("double") / F.count(F.lit(1)))
            / F.lit(1e6)
        ).alias("__pm")
    )
    gm = pm.groupBy(series_col).agg(F.avg("__pm").alias("__gm"))
    seasonal = F.round(F.col("__pm") - F.col("__gm"), 6)
    eff = pm.join(gm, series_col).select(
        series_col, "__phase", seasonal.alias("seasonal")
    )
    out = base.join(F.broadcast(eff), [series_col, "__phase"], "left")
    return out.select(
        series_col,
        date_col,
        "y",
        "trend",
        F.when(F.col("trend").isNotNull(), F.col("seasonal")).alias("seasonal"),
        F.when(
            F.col("trend").isNotNull(),
            F.round(F.col("y") - F.col("trend") - F.col("seasonal"), 6),
        ).alias("residual"),
    )


def holt_linear(
    df: DataFrame,
    series_col: str,
    order_col: str,
    value_col: str,
    alpha: float = 0.5,
    beta: float = 0.25,
) -> DataFrame:
    """Holt's linear (double exponential) smoothing per series — the
    level+trend forecaster one step up from EWMA (which this module's
    users already have) and the standard freshness/capacity projection
    for pipeline telemetry.

        l_t = α·y_t + (1−α)·(l_{t−1} + b_{t−1})
        b_t = β·(l_t − l_{t−1}) + (1−β)·b_{t−1}

    initialized textbook-style from the first two points (l₁ = y₁,
    b₁ = y₂ − y₁; recursion starts at t = 2). The recurrence is
    inherently sequential IN t but embarrassingly parallel ACROSS
    series, so the scale shape is: one hash aggregate collects each
    series (``sort_array(collect_list(struct(order, value)))`` — state
    per group is the series itself, bounded by the time range, never by
    row count at 100 TB because callers aggregate to their time grain
    first), then a single JVM-side ``F.aggregate`` fold carries the
    (level, trend) pair — O(1) state per step, zero Python, zero extra
    shuffles. Series shorter than 2 points are dropped (no trend is
    definable). Deterministic: the fold order is the sort order on both
    engines, so a recursive-CTE oracle reproduces it bit-for-bit.

    Returns (series, n_points, level, trend, forecast_1) with the float
    outputs rounded to 6 — forecast_1 = level + trend, the one-step-ahead
    projection."""
    pts = (
        df.groupBy(series_col)
        .agg(
            F.sort_array(
                F.collect_list(F.struct(F.col(order_col).alias("o"),
                                        F.col(value_col).alias("y")))
            ).alias("pts")
        )
        .filter(F.size("pts") >= 2)
    )
    ys = F.expr("transform(pts, p -> cast(p.y as double))")
    init = F.expr(
        "named_struct('lvl', cast(pts[0].y as double), "
        "'trd', cast(pts[1].y as double) - cast(pts[0].y as double))"
    )
    fold = F.aggregate(
        F.slice(ys, 2, F.size("pts") - 1),
        init,
        lambda acc, y: F.struct(
            (F.lit(alpha) * y
             + F.lit(1.0 - alpha) * (acc["lvl"] + acc["trd"])).alias("lvl"),
            (F.lit(beta) * (F.lit(alpha) * y
                            + F.lit(1.0 - alpha) * (acc["lvl"] + acc["trd"])
                            - acc["lvl"])
             + F.lit(1.0 - beta) * acc["trd"]).alias("trd"),
        ),
    )
    from weather_api_automate_etl_spark.operators.stats import round0

    return pts.withColumn("state", fold).select(
        series_col,
        F.size("pts").cast("long").alias("n_points"),
        round0(F.col("state.lvl"), 6).alias("level"),
        round0(F.col("state.trd"), 6).alias("trend"),
        round0(F.col("state.lvl") + F.col("state.trd"), 6).alias("forecast_1"),
    )


def holt_winters_additive(
    df: DataFrame,
    series_col: str,
    order_col: str,
    value_col: str,
    season: int = 7,
    alpha: float = 0.5,
    beta: float = 0.25,
    gamma: float = 0.25,
) -> DataFrame:
    """Holt-Winters additive seasonal smoothing per series (Winters,
    Mgmt Sci 1960) — the seasonal completion of :func:`holt_linear`:
    level + trend + an m-period additive seasonal state, the standard
    forecaster for daily/weekly-patterned telemetry.

        l_t = α·(y_t − s_{t−m}) + (1−α)·(l_{t−1} + b_{t−1})
        b_t = β·(l_t − l_{t−1}) + (1−β)·b_{t−1}
        s_t = γ·(y_t − l_t) + (1−γ)·s_{t−m}

    initialized textbook-style from the first two seasons (l₀ = mean of
    season 1, b₀ = (mean₂ − mean₁)/m, s_i = y_i − l₀ for i ≤ m); the
    recursion runs t = m+1..n. Series shorter than 2m points are
    dropped (the init needs two full seasons).

    Scale shape identical to ``holt_linear``: one hash aggregate
    collects each series sorted (state bounded by the TIME RANGE, not
    row count — aggregate to your grain first), then a single JVM-side
    ``F.aggregate`` fold whose state is (level, trend, m-slot seasonal
    ring) — O(m) per series, zero Python, zero extra shuffles, strictly
    left-to-right so a recursive-CTE oracle carrying a LIST seasonal
    state replays it bit-for-bit.

    Returns ``(series, n_points, level, trend, season_next,
    forecast_1)`` rounded to 6 — forecast_1 = level + trend +
    season_next, the one-step-ahead projection.
    """
    if season < 2:
        raise ValueError(f"holt-winters needs season >= 2, got {season}")
    m = int(season)
    pts = (
        df.groupBy(series_col)
        .agg(
            F.sort_array(
                F.collect_list(
                    F.struct(
                        F.col(order_col).alias("o"),
                        F.col(value_col).alias("y"),
                    )
                )
            ).alias("pts")
        )
        .filter(F.size("pts") >= 2 * m)
    )
    ys = F.expr("transform(pts, p -> cast(p.y as double))")
    with_ys = pts.withColumn("ys", ys)
    mean1 = F.aggregate(
        F.slice("ys", 1, m), F.lit(0.0), lambda a, x: a + x
    ) / float(m)
    mean2 = F.aggregate(
        F.slice("ys", m + 1, m), F.lit(0.0), lambda a, x: a + x
    ) / float(m)
    prepared = with_ys.select(
        series_col,
        "ys",
        F.size("ys").alias("n"),
        mean1.alias("l0"),
        ((mean2 - mean1) / float(m)).alias("b0"),
    ).withColumn(
        "s0", F.expr("transform(slice(ys, 1, {m}), x -> x - l0)".format(m=m))
    )
    a_, b_, g_ = float(alpha), float(beta), float(gamma)
    lnew = lambda acc, y: (  # noqa: E731
        F.lit(a_) * (y - F.element_at(acc["ssn"], 1))
        + F.lit(1.0 - a_) * (acc["lvl"] + acc["trd"])
    )
    fold = F.aggregate(
        F.slice(F.col("ys"), m + 1, F.col("n") - m),
        F.struct(
            F.col("l0").alias("lvl"),
            F.col("b0").alias("trd"),
            F.col("s0").alias("ssn"),
        ),
        lambda acc, y: F.struct(
            lnew(acc, y).alias("lvl"),
            (
                F.lit(b_) * (lnew(acc, y) - acc["lvl"])
                + F.lit(1.0 - b_) * acc["trd"]
            ).alias("trd"),
            F.concat(
                F.slice(acc["ssn"], 2, m - 1),
                F.array(
                    F.lit(g_) * (y - lnew(acc, y))
                    + F.lit(1.0 - g_) * F.element_at(acc["ssn"], 1)
                ),
            ).alias("ssn"),
        ),
    )
    from weather_api_automate_etl_spark.operators.stats import round0

    out = prepared.withColumn("state", fold)
    s_next = F.element_at(F.col("state.ssn"), 1)
    return out.select(
        series_col,
        F.col("n").cast("long").alias("n_points"),
        round0(F.col("state.lvl"), 6).alias("level"),
        round0(F.col("state.trd"), 6).alias("trend"),
        round0(s_next, 6).alias("season_next"),
        round0(
            F.col("state.lvl") + F.col("state.trd") + s_next, 6
        ).alias("forecast_1"),
    )


def backtest_seasonal_naive(
    df: DataFrame,
    series_col: str,
    period_col: str,
    season: int = 7,
    horizon: int = 5,
) -> DataFrame:
    """Rolling-origin backtest of the seasonal-naive forecaster
    (ŷ_t = y_{t−m}) against the plain-naive baseline (ŷ_t = y_{t−1})
    on per-period row counts — the evaluation harness that should gate
    any fancier forecaster (Holt, Holt-Winters): if seasonal-naive
    doesn't beat last-value on the holdout, the series has no usable
    seasonality and the seasonal model is fitting noise. Scores the
    LAST ``horizon`` periods of each series; a skill ratio < 1 means
    seasonality is real.

    The per-period statistic is the ROW COUNT, so every error
    |y_t − ŷ_t| is an exact integer and the MAEs divide exact sums.
    Scale shape: one collapsing (series, period) aggregate, two lag
    windows per series (state = one row), one final rollup — scan-rate,
    no self-join.

    Returns ``(series, n_test, mae_seasonal, mae_naive, skill)`` with
    floats rounded to 6; series without enough history for a full
    horizon of both forecasts are dropped.
    """
    if season < 1 or horizon < 1:
        raise ValueError(
            f"backtest needs season/horizon >= 1, got {season}/{horizon}"
        )
    ser = df.groupBy(
        F.col(series_col).alias("g"), F.col(period_col).alias("p")
    ).agg(F.count(F.lit(1)).alias("y"))
    w = Window.partitionBy("g").orderBy("p")
    tot = Window.partitionBy("g")
    lagged = ser.select(
        "g",
        "p",
        "y",
        F.lag("y", season).over(w).alias("ys"),
        F.lag("y", 1).over(w).alias("y1"),
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(tot).alias("n"),
    )
    test = lagged.filter(
        (F.col("rn") > F.col("n") - horizon)
        & F.col("ys").isNotNull()
        & F.col("y1").isNotNull()
    )
    agg = test.groupBy("g").agg(
        F.count(F.lit(1)).alias("n_test"),
        F.sum(F.abs(F.col("y") - F.col("ys"))).alias("es"),
        F.sum(F.abs(F.col("y") - F.col("y1"))).alias("e1"),
    ).filter(F.col("n_test") == horizon)
    mae_s = F.col("es").cast("double") / F.col("n_test").cast("double")
    mae_1 = F.col("e1").cast("double") / F.col("n_test").cast("double")
    return agg.select(
        F.col("g").alias(series_col),
        F.col("n_test").cast("long").alias("n_test"),
        F.round(mae_s, 6).alias("mae_seasonal"),
        F.round(mae_1, 6).alias("mae_naive"),
        F.round(
            F.when(F.col("e1") > 0, mae_s / mae_1), 6
        ).alias("skill"),
    )


def control_chart(
    df: DataFrame,
    series_col: str,
    period_col: str,
    n_sigma: float = 3.0,
) -> DataFrame:
    """Shewhart individuals control chart over per-period row counts
    (Shewhart, 1931 — the SPC gate behind every "is today's volume
    normal?" ops dashboard): centerline = series mean, control limits
    = mean ± ``n_sigma``·s (sample standard deviation), each period
    flagged in/out of control. The counts are integers, so the mean
    and s assemble from EXACT Σy/Σy² in a single expression — both
    engines flag identical periods, and the limit columns hash at 6
    decimals.

    Scale shape: one collapsing (series, period) aggregate, one
    series-keyed stats aggregate joined back on the series key —
    scan-rate, no windows, no collect. Self-inclusion caveat stated
    plainly: limits are computed FROM the charted periods (the
    retrospective phase-I chart); a production phase-II chart would
    freeze limits from a reference window.

    Returns ``(series, period, y, center, lcl, ucl, out_of_control)``
    with float columns rounded to 6.
    """
    if n_sigma <= 0:
        raise ValueError(f"control chart needs n_sigma > 0, got {n_sigma}")
    ser = df.groupBy(
        F.col(series_col).alias("__g"), F.col(period_col).alias("__p")
    ).agg(F.count(F.lit(1)).alias("__y"))
    st = ser.groupBy("__g").agg(
        F.count(F.lit(1)).alias("__n"),
        F.sum("__y").alias("__s"),
        # Σcount² as decimal(38,0): periods of ~1e9 events push the
        # long-accumulated square sum past 2^63 (the cuped/roc_auc
        # overflow discipline)
        F.sum(
            F.col("__y").cast("decimal(38,0)") * F.col("__y")
        ).alias("__q"),
    )
    n = F.col("__n").cast("double")
    mean = F.col("__s").cast("double") / n
    sd = F.sqrt(
        (
            F.col("__q").cast("double")
            - F.col("__s").cast("double") * F.col("__s").cast("double") / n
        )
        / (n - 1)
    )
    limits = st.select(
        "__g",
        mean.alias("__c"),
        (mean - F.lit(float(n_sigma)) * sd).alias("__lcl"),
        (mean + F.lit(float(n_sigma)) * sd).alias("__ucl"),
    )
    return ser.join(limits, "__g").select(
        F.col("__g").alias(series_col),
        F.col("__p").alias(period_col),
        F.col("__y").cast("long").alias("y"),
        F.round("__c", 6).alias("center"),
        F.round("__lcl", 6).alias("lcl"),
        F.round("__ucl", 6).alias("ucl"),
        (
            (F.col("__y") < F.col("__lcl")) | (F.col("__y") > F.col("__ucl"))
        ).alias("out_of_control"),
    )


def lag_features(
    df: DataFrame,
    series_col: str,
    period_col: str,
    lags: Sequence[int] = (1, 7),
    ma_window: int = 7,
) -> DataFrame:
    """Supervised-learning feature matrix from a per-period count
    series — the standard forecasting feature engineering (lags,
    trailing moving average, first difference) done ONCE in the engine
    instead of per-notebook: each output row is a training example
    ``(series, period, y, lag_<k>..., ma_<w>, delta_1)``. Rows missing
    any lag (the warm-up prefix) are dropped so the matrix is dense —
    the contract a downstream fit expects.

    Integer counts keep every lag and difference exact; the trailing
    mean divides an exact integer window sum. One collapsing
    (series, period) aggregate plus one window pass per series —
    scan-rate, state O(max lag).
    """
    if not lags or min(lags) < 1 or ma_window < 1:
        raise ValueError("lag_features needs lags >= 1 and ma_window >= 1")
    ser = df.groupBy(
        F.col(series_col).alias("__g"), F.col(period_col).alias("__p")
    ).agg(F.count(F.lit(1)).alias("y"))
    w = Window.partitionBy("__g").orderBy("__p")
    out = ser
    for k in sorted(set(int(x) for x in lags)):
        out = out.withColumn(f"lag_{k}", F.lag("y", k).over(w))
    ma = Window.partitionBy("__g").orderBy("__p").rowsBetween(
        -(ma_window - 1), 0
    )
    cnt = F.count(F.lit(1)).over(ma)
    out = out.withColumn(
        f"ma_{ma_window}",
        F.when(
            cnt == ma_window,
            F.round(
                F.sum("y").over(ma).cast("double") / float(ma_window), 6
            ),
        ),
    ).withColumn("delta_1", F.col("y") - F.lag("y", 1).over(w))
    feature_cols = [f"lag_{k}" for k in sorted(set(int(x) for x in lags))]
    feature_cols += [f"ma_{ma_window}", "delta_1"]
    dense = out.na.drop(subset=feature_cols)
    return dense.select(
        F.col("__g").alias(series_col),
        F.col("__p").alias(period_col),
        F.col("y").cast("long").alias("y"),
        *[F.col(c).cast("long").alias(c) for c in feature_cols
          if c.startswith(("lag_", "delta"))],
        F.col(f"ma_{ma_window}"),
    )


def cross_correlation(
    df: DataFrame,
    ts_col: str,
    x_val,
    y_val,
    max_lag: int = 7,
) -> DataFrame:
    """Lagged cross-correlation function (CCF) between two daily series
    derived from one event stream: r(ℓ) = corr(x_t, y_{t+ℓ}) for
    ℓ ∈ [−max_lag, max_lag] — the does-X-lead-Y screen (marketing spend
    vs signups, errors vs churn) that ``autocorr_lag1`` is the
    single-series special case of.

    Shape: the stream collapses to ONE daily aggregate (exact integer
    sums — the caller passes 0/1 indicator expressions, so every moment
    input is exact), then a 15-row lag explode and a self-join of the
    days-sized table with itself — at any input scale the join operands
    are |days| rows, so AQE broadcasts them; the event stream is
    touched exactly once. Pearson r per lag comes from the five
    mergeable moment sums with the shared relative variance floor
    (stats.ols_from_moments), so degenerate series yield NULL, never
    NaN. Returns ``(lag, n_days, r_xy)`` rounded to 6.
    """
    from weather_api_automate_etl_spark.operators.stats import (
        _pearson_from_moments,
        round0,
    )

    if max_lag < 1:
        raise ValueError(f"cross_correlation needs max_lag >= 1, got {max_lag}")
    daily = (
        df.groupBy(
            F.to_date(F.col(ts_col).cast("timestamp")).alias("__d")
        )
        .agg(
            F.sum(x_val).cast("double").alias("__x"),
            F.sum(y_val).cast("double").alias("__y"),
        )
    )
    lags = F.explode(
        F.array(*[F.lit(l) for l in range(-max_lag, max_lag + 1)])
    )
    left = daily.select("__d", "__x", lags.alias("lag")).withColumn(
        "__dt", F.date_add(F.col("__d"), F.col("lag"))
    )
    right = daily.select(
        F.col("__d").alias("__dt"), F.col("__y").alias("__y2")
    )
    p = left.join(right, "__dt").select("lag", "__x", "__y2")
    m = p.groupBy("lag").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum("__x").alias("sx"),
        F.sum("__y2").alias("sy"),
        F.sum(F.col("__x") * F.col("__y2")).alias("sxy"),
        F.sum(F.col("__x") * F.col("__x")).alias("sxx"),
        F.sum(F.col("__y2") * F.col("__y2")).alias("syy"),
    )
    r = _pearson_from_moments(
        F.col("n"), F.col("sx"), F.col("sy"),
        F.col("sxy"), F.col("sxx"), F.col("syy"),
    )
    return m.select(
        F.col("lag").cast("int").alias("lag"),
        F.col("n").cast("long").alias("n_days"),
        round0(r, 6).alias("r_xy"),
    )
