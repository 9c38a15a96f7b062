"""Snapshot diff / change-data-capture operators.

The reference's dbt ecosystem ships snapshots (type-2 change tracking) even
though its project never declares one (/root/reference/dbt — no snapshots/
dir); an engine replacing it needs the primitive. ``snapshot_diff``
classifies rows between two table versions; composed with
``plans/incremental.py`` it gives incremental CDC materialization.

Scale shape: one full-outer equi-join on the key (single shuffle each
side, or zero when both snapshots are bucket-written on the key via
marts.write_bucketed); change detection compares md5 over the tracked
columns, computed map-side before the join.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, functions as F


def _row_hash(cols: Sequence[str]):
    """md5 of per-column md5 digests — engine-portable (never Spark hash())
    and free of separator/sentinel ambiguity: hashing each column FIRST
    means no value can fabricate a column boundary (a raw concat_ws with a
    separator char misclassifies values containing that char), and the NULL
    sentinel lives in digest space ('NULL' is not hex, so it cannot collide
    with any real digest). NULL therefore compares distinct from every
    value, matching IS DISTINCT FROM semantics."""
    digests = [
        F.coalesce(F.md5(F.col(c).cast("string")), F.lit("NULL")) for c in cols
    ]
    return F.md5(F.concat_ws("|", *digests))


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key: str,
    compare_cols: Sequence[str],
) -> DataFrame:
    """Classify every key across two snapshots: 'added' (new only),
    'removed' (old only), 'changed' (both, tracked columns differ),
    'unchanged'. Returns (key, change_type) plus the new-side tracked
    columns for added/changed rows (null for removed)."""
    o = old.select(
        F.col(key).alias("__k"), _row_hash(compare_cols).alias("__old_h")
    )
    n = new.select(
        F.col(key), _row_hash(compare_cols).alias("__new_h"), *compare_cols
    )
    joined = o.join(n, o["__k"] == n[key], "full_outer")
    change = (
        F.when(F.col("__old_h").isNull(), F.lit("added"))
        .when(F.col("__new_h").isNull(), F.lit("removed"))
        .when(F.col("__old_h") != F.col("__new_h"), F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    return joined.select(
        F.coalesce(F.col(key), F.col("__k")).alias(key),
        change.alias("change_type"),
        *compare_cols,
    )
