"""Round-5 fourth-wave queries: label-propagation communities over the
near-dup graph, trailing rolling median, seasonal (dow × hour) baseline
residuals, sweep-line interval concurrency, and CUSUM change-point
detection.

Per-query rationale lives in each function docstring; registry/oracle
conventions in queries.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from weather_api_automate_etl_spark.operators import dedup, graph, timeseries
from weather_api_automate_etl_spark.queries import query, t
from weather_api_automate_etl_spark.queries_ext import _MINHASH_SIG_SQL

# ---------------------------------------------------------------------------
# label propagation communities (fixed synchronous rounds)
# ---------------------------------------------------------------------------

_LPA_ROUNDS = 2


def _lpa_round_sql(prev: str, this: str) -> str:
    """One synchronous LPA round as SQL CTEs (neighbour-label count +
    per-node argmax with the (cnt desc, label asc) tie rule)."""
    return f"""
    n_{this} AS (
      SELECT s.u, l.label, count(*) AS cnt
      FROM sym s JOIN {prev} l ON l.u = s.v
      GROUP BY s.u, l.label
    ),
    {this} AS (
      SELECT u, label FROM (
        SELECT u, label,
               row_number() OVER (PARTITION BY u
                                  ORDER BY cnt DESC, label ASC) AS rn
        FROM n_{this}
      ) WHERE rn = 1
    )"""


@query(
    "q_label_propagation",
    oracle=_MINHASH_SIG_SQL
    + """
    , pairs AS (
      SELECT DISTINCT a.doc_id AS u, b.doc_id AS v
      FROM sig a JOIN sig b
        ON a.band_id = b.band_id AND a.bucket = b.bucket
       AND a.doc_id < b.doc_id
    ),
    sym AS (SELECT u, v FROM pairs UNION ALL SELECT v AS u, u AS v FROM pairs),
    l0 AS (SELECT DISTINCT u, u AS label FROM sym),
    """
    + _lpa_round_sql("l0", "l1")
    + ","
    + _lpa_round_sql("l1", "l2")
    + """
    SELECT u AS doc_id, label FROM l2
    """,
    tags=("graph", "dedup"),
)
def q_label_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Community labels on the MinHash+LSH near-dup pair graph via two
    synchronous label-propagation rounds
    (operators/graph.py::label_propagation) — the community-detection
    sibling of q_dedup_clusters: connected components only answers
    reachability, LPA separates densely-knit template families that
    share a bridge edge. Fixed rounds + the (count desc, label asc) tie
    rule make it engine-portable (the kmeans_fixed discipline); per
    round it's one node-keyed label join, one (node, label) count, one
    argmax window — the checkpointed-loop shape, no all-pairs."""
    docs = t(spark, sf_dir, "documents")
    sig = dedup.minhash_signatures(
        docs, "doc_id", "text", num_hashes=8, band_size=2
    )
    pairs = dedup.minhash_candidate_pairs(sig, "doc_id")
    return graph.label_propagation(pairs, rounds=_LPA_ROUNDS, node_id="doc_id")


# ---------------------------------------------------------------------------
# trailing rolling median (robust smoothing — the q_ewma sibling)
# ---------------------------------------------------------------------------

_MED_W = 8


@query(
    "q_trailing_median",
    oracle=f"""
    SELECT event_id, user_id, value,
           ROUND(quantile_cont(value, 0.5)
                   OVER (PARTITION BY user_id
                         ORDER BY CAST(ts AS TIMESTAMP), event_id
                         ROWS BETWEEN {_MED_W - 1} PRECEDING AND CURRENT ROW),
                 6) AS trailing_median
    FROM events
    """,
    tags=("timeseries", "windows"),
)
def q_trailing_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing median of each user's last 8 observations — the robust
    smoothing baseline (q_ewma's outlier-immune sibling: one wild value
    shifts an EWMA for the whole decay tail but leaves the rolling
    median untouched). Spark has no percentile window over a moving
    frame, so the frame is collected per row (one window shuffle on
    user_id, frame bounded at 8), sorted, and interpolated with the
    exact ``lo + (hi − lo)·0.5`` form quantile_cont uses — spelled
    identically so even the last-ulp arithmetic matches the oracle's
    windowed quantile_cont. Frames are per-user — never a global
    sort."""
    return timeseries.trailing_median(
        t(spark, sf_dir, "events"),
        "user_id",
        "value",
        ("ts", "event_id"),
        window_rows=_MED_W,
        keep_cols=("event_id",),
    )


# ---------------------------------------------------------------------------
# seasonal (dow × hour) baseline + residuals
# ---------------------------------------------------------------------------


@query(
    "q_seasonal_baseline",
    oracle="""
    WITH b AS (
      SELECT event_type,
             CAST(date_part('dow', CAST(ts AS TIMESTAMP)) AS INTEGER) AS dow,
             CAST(date_part('hour', CAST(ts AS TIMESTAMP)) AS INTEGER) AS hr,
             ROUND(avg(value), 6) AS baseline
      FROM events GROUP BY 1, 2, 3
    )
    SELECT e.event_id, e.event_type, e.value,
           CAST(date_part('dow', CAST(e.ts AS TIMESTAMP)) AS INTEGER) AS dow,
           CAST(date_part('hour', CAST(e.ts AS TIMESTAMP)) AS INTEGER) AS hr,
           b.baseline,
           ROUND(e.value - b.baseline, 6) AS residual
    FROM events e
    JOIN b ON b.event_type = e.event_type
          AND b.dow = CAST(date_part('dow', CAST(e.ts AS TIMESTAMP)) AS INTEGER)
          AND b.hr = CAST(date_part('hour', CAST(e.ts AS TIMESTAMP)) AS INTEGER)
    """,
    tags=("timeseries", "agg"),
)
def q_seasonal_baseline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal-naive baseline per (event_type, day-of-week, hour) with
    per-event residuals — the first-order seasonality model anomaly
    alerting diffs against before reaching for real forecasting. Uses
    the reference's Postgres calendar semantics (dow 0=Sunday —
    functions/core.py::pg_dow, the §2 op-18 trap). The baseline table is
    (types × 7 × 24) rows — one map-side-combined aggregate broadcast
    back onto the stream; baselines round before the residual subtraction
    so residuals can't flip on aggregation-order ulps."""
    return timeseries.seasonal_baseline(
        t(spark, sf_dir, "events"),
        "event_type",
        "ts",
        "value",
        keep_cols=("event_id",),
    )


# ---------------------------------------------------------------------------
# sweep-line interval concurrency (peak overlap per event_type)
# ---------------------------------------------------------------------------


@query(
    "q_concurrency",
    oracle="""
    WITH iv AS (
      SELECT event_id, event_type, CAST(ts AS TIMESTAMP) AS s,
             CAST(ts AS TIMESTAMP)
               + to_seconds(CAST(greatest(1, floor(value)) AS BIGINT)) AS e
      FROM events
    ),
    pts AS (
      SELECT event_type, s AS t, 1 AS delta FROM iv
      UNION ALL
      SELECT event_type, e AS t, -1 AS delta FROM iv
    ),
    cum AS (
      SELECT event_type,
             SUM(delta) OVER (PARTITION BY event_type
                              ORDER BY t ASC, delta DESC) AS load
      FROM pts
    )
    SELECT event_type, CAST(max(load) AS INTEGER) AS peak_concurrency,
           CAST(count(*) / 2 AS BIGINT) AS n_intervals
    FROM cum GROUP BY event_type
    """,
    tags=("timeseries", "windows", "agg"),
)
def q_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peak interval concurrency per event_type by the classic sweep
    line: each event spans [ts, ts + max(1, ⌊value⌋) seconds); +1/−1
    boundary points, a running sum in time order, max of the running
    load — how many sessions/jobs/calls were simultaneously open at the
    worst moment. The running sum uses the DEFAULT window frame (RANGE
    …CURRENT ROW): all peers of a timestamp are included together, so
    the load at a tie is order-independent on both engines; starts sort
    before ends (delta DESC), so touching intervals count as
    overlapping. One window shuffle partitioned by event_type — never a
    global timeline sort."""
    return timeseries.concurrency_peak(
        t(spark, sf_dir, "events"), "event_type", "ts", "value"
    )


# ---------------------------------------------------------------------------
# CUSUM change-point detection (mean-shift localization)
# ---------------------------------------------------------------------------


@query(
    "q_cusum_changepoint",
    oracle="""
    WITH s AS (
      SELECT event_type, ROUND(avg(value), 6) AS mu,
             ROUND(stddev_samp(value), 6) AS sd
      FROM events GROUP BY event_type
    ),
    c AS (
      SELECT e.event_id, e.event_type,
             ROUND(SUM((e.value - s.mu) / NULLIF(s.sd, 0))
                     OVER (PARTITION BY e.event_type
                           ORDER BY CAST(e.ts AS TIMESTAMP), e.event_id
                           ROWS UNBOUNDED PRECEDING),
                   6) AS cusum,
             CAST(e.ts AS TIMESTAMP) AS tss
      FROM events e JOIN s USING (event_type)
    ),
    p AS (
      SELECT event_type, event_id,
             row_number() OVER (PARTITION BY event_type
                                ORDER BY abs(cusum) DESC, tss ASC,
                                         event_id ASC) AS rn
      FROM c
    ),
    agg AS (
      SELECT event_type, CAST(count(*) AS BIGINT) AS n_events,
             max(abs(cusum)) AS max_abs_cusum
      FROM c GROUP BY event_type
    )
    SELECT agg.event_type, agg.n_events, agg.max_abs_cusum,
           p.event_id AS change_event_id
    FROM agg JOIN p USING (event_type)
    WHERE p.rn = 1
    """,
    tags=("timeseries", "windows", "agg"),
)
def q_cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM mean-shift detection per event_type: running sum of
    standardized residuals in time order; the change point is the event
    where |CUSUM| peaks (ties → earliest). Group mean/stddev round to 6
    BEFORE standardizing (aggregation-order ulps stop at the rounding),
    and the argmax reads the ROUNDED cusum with a (time, id) tie-break —
    the last-ulp-proof argmax recipe. One stats aggregate broadcast back
    + one per-type ordered running sum (partitioned — never global).
    Spark takes the argmax via a row_number window on the same keys the
    oracle's arg_min tuple encodes."""
    return timeseries.cusum_changepoint(
        t(spark, sf_dir, "events"),
        "event_type",
        "value",
        ("ts", "event_id"),
        "event_id",
    )
