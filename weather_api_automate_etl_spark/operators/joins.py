"""Temporal and non-equi join operators Spark lacks as built-ins.

Extension surface beyond the reference (whose only join is the implied
star equi-join, SURVEY.md §2.4): the as-of join and the range/interval
join every time-series analytics engine ships. Both are implemented the
way they must be at 100 TB:

- ``asof_join`` uses the union-merge algorithm: tag both inputs, union,
  one window pass per key with a last-non-null carry-forward. Exactly ONE
  shuffle (on the join key), no range-predicate cartesian blowup, no
  per-key driver loop. This is the textbook distributed as-of strategy
  (equivalent plans in Flink temporal joins and kdb/QuestDB asof).
- ``range_join_small`` broadcasts the (small) range dimension and lets
  Spark pick BroadcastNestedLoopJoin — the correct physical plan when one
  side is a handful of interval rows: zero shuffle of the fact table.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    payload_cols: Sequence[str],
    inclusive: bool = True,
) -> DataFrame:
    """For every left row, attach the payload of the latest right row with
    ``right.ts <= left.ts`` (``<`` when ``inclusive=False``) and the same key.

    Left-join semantics: left rows with no prior right row keep NULL payloads.
    Right rows should be unique per (key, ts) — pre-aggregate otherwise —
    so the match is deterministic.

    Implementation: union-merge. Right rows sort before (inclusive) or after
    (exclusive) left rows at equal timestamps; ``last(payload, ignorenulls)``
    over an unbounded-preceding window carries the most recent right payload
    onto each left row. One Exchange on ``key`` total.
    """
    # Side tag orders right rows relative to left rows at equal ts.
    right_side = 0 if inclusive else 2
    ts = F.col(left_ts)
    lefts = left.select(
        F.col(key).alias("__k"),
        ts.alias("__ts"),
        F.lit(1).alias("__side"),
        F.struct(*left.columns).alias("__row"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"__p_{c}") for c in payload_cols],
    )
    rights = right.select(
        F.col(key).alias("__k"),
        F.col(right_ts).alias("__ts"),
        F.lit(right_side).alias("__side"),
        F.lit(None).cast(lefts.schema["__row"].dataType).alias("__row"),
        *[F.col(c).alias(f"__p_{c}") for c in payload_cols],
    )
    w = (
        Window.partitionBy("__k")
        .orderBy("__ts", "__side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    merged = lefts.unionByName(rights)
    carried = merged.select(
        "__side",
        "__row",
        *[
            F.last(f"__p_{c}", ignorenulls=True).over(w).alias(f"__c_{c}")
            for c in payload_cols
        ],
    )
    out = carried.filter(F.col("__side") == 1)
    return out.select(
        *[F.col(f"__row.{c}").alias(c) for c in left.columns],
        *[F.col(f"__c_{c}").alias(c) for c in payload_cols],
    )


def interval_join_binned(
    points: DataFrame,
    intervals: DataFrame,
    key: str,
    ts_col: str,
    lo_col: str,
    hi_col: str,
    bin_seconds: int = 3600,
) -> DataFrame:
    """Big-big point-in-interval join without a cartesian blowup.

    Joining N points to M intervals on ``lo <= ts <= hi`` naively forces a
    per-key nested loop (O(N·M) within each key). Instead, both sides are
    bucketized to coarse time bins: each interval explodes to the bins it
    covers (``sequence()`` — cheap, intervals are the small cardinality
    side), each point maps to exactly one bin, and the join becomes an
    EQUI-join on (key, bin) + a residual filter. Catalyst runs it as a
    sort-merge/shuffled-hash join — shuffle is linear in the data, and a
    point matches in exactly one bin so no dedup pass is needed. This is
    the standard binned-range-join strategy (Databricks range-join hints,
    GeoSpark/Sedona grid joins use the same shape).

    ``bin_seconds`` trades explode factor (long intervals → more bin rows)
    against residual-filter selectivity; pick ~the median interval length.
    """
    bin_of = lambda c: (F.unix_timestamp(c.cast("timestamp")) / bin_seconds).cast("long")  # noqa: E731
    # explicit aliases: both sides often derive from the same scan (e.g.
    # events ⋈ sessionize(events)) and unqualified keys would be ambiguous
    binned_points = points.withColumn("__bin", bin_of(F.col(ts_col))).alias("__pts")
    binned_intervals = (
        intervals.withColumn(
            "__bin",
            F.explode(F.sequence(bin_of(F.col(lo_col)), bin_of(F.col(hi_col)))),
        )
        .withColumnRenamed(key, "__iv_key")
        .alias("__iv")
    )
    cond = (
        (F.col(f"__pts.{key}") == F.col("__iv.__iv_key"))
        & (F.col("__pts.__bin") == F.col("__iv.__bin"))
        & (F.col(f"__pts.{ts_col}") >= F.col(f"__iv.{lo_col}"))
        & (F.col(f"__pts.{ts_col}") <= F.col(f"__iv.{hi_col}"))
    )
    return (
        binned_points.join(binned_intervals, cond, "inner")
        .drop("__iv_key")
        .drop("__bin")
    )


def range_join_small(
    facts: DataFrame,
    ranges: DataFrame,
    value_col: str,
    lo_col: str = "lo",
    hi_col: str = "hi",
    how: str = "inner",
) -> DataFrame:
    """Join each fact row to the interval row(s) with ``lo <= value < hi``.

    ``ranges`` must be small (a rate card / tier table / histogram spec):
    it is broadcast, so the fact side never shuffles and the physical plan
    is a BroadcastNestedLoopJoin — the right choice for non-equi predicates
    against a dimension of a few hundred rows. For big-big interval joins,
    bucketize both sides to coarse bins first and equi-join on the bin.
    """
    v = facts[value_col]
    cond = (v >= ranges[lo_col]) & (v < ranges[hi_col])
    return facts.join(F.broadcast(ranges), cond, how)
