"""Skew mitigation: salting for hot keys in aggregates and joins.

AQE's skew-join handling (enabled in session.py) covers sort-merge joins at
runtime; these operators cover the two cases AQE doesn't:

- **salted_agg** — a hot *grouping* key (one city producing 30% of all
  rows) makes one reduce task the straggler. Two-phase aggregation over a
  salted key bounds any task's share to 1/n_salts of the hot key. Works for
  decomposable aggregates (sum/count/min/max — avg as sum+count).
- **salted_broadcast_join** is unnecessary by construction (broadcast joins
  don't shuffle the big side); for the shuffled-join case, **replicate_small**
  explodes the small side n_salts× and salts the big side, so a hot join key
  spreads over n_salts reducers.

Salt derivation is deterministic (md5 of the row's id column mod n_salts,
or random-free round-robin via a provided column) so results are
reproducible and engine-portable.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, functions as F


def _salt_col(salt_from: Column | str, n_salts: int) -> Column:
    """Deterministic salt in [0, n_salts): md5-derived from a column."""
    c = F.col(salt_from) if isinstance(salt_from, str) else salt_from
    return (
        F.conv(F.substring(F.md5(c.cast("string")), 1, 8), 16, 10)
        .cast("long") % n_salts
    ).cast("int")


def salted_agg(
    df: DataFrame,
    keys: Sequence[str],
    aggs: dict[str, tuple[str, str]],
    salt_from: str,
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase skew-safe aggregation.

    ``aggs`` maps output column → (input column, fn) with fn ∈
    {sum, count, min, max}. Phase 1 aggregates by (keys + salt) — the hot
    key's rows split across ``n_salts`` reduce tasks; phase 2 merges the
    per-salt partials (sum→sum, count→sum, min→min, max→max) over the tiny
    phase-1 output.
    """
    merge_fn = {"sum": F.sum, "count": F.sum, "min": F.min, "max": F.max}
    phase1_fn = {"sum": F.sum, "count": F.count, "min": F.min, "max": F.max}
    for _, (_, fn) in aggs.items():
        if fn not in phase1_fn:
            raise ValueError(f"non-decomposable aggregate {fn!r}")
    salted = df.withColumn("__salt", _salt_col(salt_from, n_salts))
    phase1 = salted.groupBy(*keys, "__salt").agg(
        *[phase1_fn[fn](col).alias(out) for out, (col, fn) in aggs.items()]
    )
    return phase1.groupBy(*keys).agg(
        *[merge_fn[fn](out).alias(out) for out, (_, fn) in aggs.items()]
    )


def replicate_small(
    small: DataFrame, n_salts: int = 16, salt_name: str = "__salt"
) -> DataFrame:
    """Replicate the small side of a shuffled join n_salts× with an explicit
    salt column; join keys become (key, salt) against a salted big side."""
    return small.withColumn(
        salt_name, F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)).cast("array<int>"))
    )


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    salt_from: str,
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-safe shuffled equi-join: salt the big side deterministically,
    replicate the small side across all salts, join on (key, salt).

    Use when the small side is too large to broadcast AND the big side has
    hot join keys; otherwise prefer ``broadcast()`` (no shuffle at all).

    Only join types that preserve the BIG side's row semantics are valid:
    the small side is replicated n_salts×, so right/full outer joins would
    emit up to n_salts−1 spurious null-extended rows per unmatched replica.
    """
    allowed = {"inner", "left", "left_outer", "leftouter", "left_semi", "leftsemi", "left_anti", "leftanti"}
    if how.lower() not in allowed:
        raise ValueError(
            f"salted_join supports {sorted(allowed)} only; {how!r} would "
            "produce spurious rows from the replicated small side"
        )
    b = big.withColumn("__salt", _salt_col(salt_from, n_salts))
    s = replicate_small(small, n_salts)
    return b.join(s, [on, "__salt"], how).drop("__salt")
