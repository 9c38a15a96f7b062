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


def bloom_filter_build(
    keys: DataFrame,
    key_col: str,
    num_bits: int = 1 << 16,
    num_hashes: int = 5,
) -> list[int]:
    """Build a Bloom filter over a key column as a driver-side bitmap of
    64-bit words — the compact semi-join-reduction side of
    ``bloom_prune_join``.

    Bit positions are ``xxhash64(key, seed) mod m`` for ``num_hashes``
    seeds, computed DISTRIBUTED (posexplode over the seed array, distinct,
    one word-index aggregate of OR-ed word masks); the driver only ever
    receives ≤ m/64 (word, bits) rows — filter metadata, the same payload
    class as a broadcast-join hash table but bitwise-compact (m=2^16 →
    8 KiB regardless of key count). This is the pattern Spark's own
    runtime row-level Bloom pruning uses internally; building it as an
    operator makes it available where the optimizer can't inject it (a
    pre-filtered build side, cross-job reuse, or a sink-side manifest).

    False-positive rate ≈ (1 - e^(-k·n/m))^k; with the defaults and
    n=1000 keys ≈ 2e-5. False negatives are impossible — the contract
    ``bloom_prune_join`` relies on."""
    if num_bits % 64:
        raise ValueError(f"num_bits must be a multiple of 64, got {num_bits}")
    if not 1 <= num_hashes <= 16:
        raise ValueError(f"num_hashes must be in 1..16, got {num_hashes}")
    seeds = F.array(*[F.lit(s) for s in range(num_hashes)])
    words = (
        keys.select(F.col(key_col).alias("__k"))
        .filter(F.col("__k").isNotNull())
        .select(
            F.explode(
                F.transform(
                    seeds,
                    lambda s: F.pmod(F.xxhash64(F.col("__k"), s), F.lit(num_bits)),
                )
            ).alias("__bit")
        )
        .distinct()
        .groupBy((F.col("__bit") / 64).cast("long").alias("__word"))
        .agg(
            F.bit_or(
                F.call_function(
                    "shiftleft",
                    F.lit(1).cast("long"),
                    (F.col("__bit") % 64).cast("int"),
                )
            ).alias("__bits")
        )
        .collect()
    )
    bitmap = [0] * (num_bits // 64)
    for r in words:
        bitmap[r["__word"]] = r["__bits"]
    return bitmap


def bloom_prune_join(
    facts: DataFrame,
    keys: DataFrame,
    key_col: str,
    num_bits: int = 1 << 16,
    num_hashes: int = 5,
) -> DataFrame:
    """Semi-join ``facts`` to the ``keys`` set with a Bloom pre-filter:
    the 100 TB join-reduction pattern when the key set is too large to
    broadcast exactly but its BITMAP is metadata-sized.

    Phase 1 prunes the fact scan with a pure column expression — all
    ``num_hashes`` probe bits tested against the literal bitmap inside
    whole-stage codegen (F.forall over the seed array; no shuffle, no
    Python) — eliminating the overwhelming majority of non-matching rows
    before any join machinery runs. Phase 2 is the EXACT left-semi join
    on the survivors, so Bloom false positives are removed and the result
    is bit-identical to the plain semi join (the property q_bloom_prune's
    DuckDB oracle checks); false negatives cannot occur by construction.
    At scale phase 2's shuffle moves only the pruned survivor set —
    fp-rate · |facts| excess rows instead of |facts|.

    The probe hashes the fact key CAST TO THE BUILD SIDE'S dtype:
    xxhash64 hashes int/long/string representations of the same value
    differently, so a dtype-mismatched probe would compute different bit
    positions than the build and prune MATCHING rows as false negatives
    — breaking the bit-identical contract silently (the round-7 advice
    finding). The cast makes mixed-width joins (int facts vs bigint
    keys) correct; the exact phase-2 join applies Spark's usual implicit
    cast semantics either way.

    Bitmap attachment scales in two measured regimes (tools/
    stress_bloom.py, table in SCALING.md). Tiny bitmaps (≤128 words =
    1 KiB) are inlined as a constant-folded literal array — zero extra
    plan nodes; past that, per-literal Catalyst planning cost alone
    (~1.5 s at 1024 words × 5 probe references) exceeds the whole probe,
    so larger bitmaps ride a ONE-ROW broadcast join instead: the word
    array is a column of a single-row DataFrame cross-joined with a
    broadcast hint, and each task reads the array by reference from the
    broadcast row. Probe cost measured flat to 2^24 bits (2 MiB) and
    degrading steeply past 2^25, so ``num_bits`` is CAPPED at 2^24 —
    ~1.7 M keys at 1% fp. Beyond that key count a Bloom prefilter is the
    wrong plan here anyway: the plain shuffled semi join measures flat
    (1.4 s over 20 M facts at 10 M keys, where forced broadcast has
    degraded 10×), and Spark's default-on runtime row-level Bloom
    pruning already injects the within-query filter this operator would
    hand-build. This operator's regime is the PRECOMPUTED/cross-job
    filter (a sink-side manifest, a reused gate) at takedown-list scale."""
    if num_bits > 1 << 24:
        raise ValueError(
            f"num_bits={num_bits} exceeds the 2^24 probe cap; key sets "
            "needing a larger filter should use a plain semi join (AQE + "
            "runtime Bloom pruning handle that regime)"
        )
    bitmap = bloom_filter_build(keys, key_col, num_bits, num_hashes)
    build_dtype = keys.schema[key_col].dataType.simpleString()
    seeds = F.array(*[F.lit(s) for s in range(num_hashes)])
    max_literal_words = 128

    if len(bitmap) <= max_literal_words:
        bitmap_col = F.array(*[F.lit(w).cast("long") for w in bitmap])
        probe_in = facts
    else:
        import pandas as pd  # one-row Arrow transfer of the word array

        bm_df = facts.sparkSession.createDataFrame(
            pd.DataFrame({"__bloom_words": [bitmap]}),
            schema="__bloom_words array<long>",
        )
        bitmap_col = F.col("__bloom_words")
        probe_in = facts.crossJoin(F.broadcast(bm_df))

    def bit_set(s: F.Column) -> F.Column:
        pos = F.pmod(
            F.xxhash64(F.col(key_col).cast(build_dtype), s), F.lit(num_bits)
        )
        word = F.get(bitmap_col, (pos / 64).cast("int"))
        mask = F.call_function(
            "shiftleft", F.lit(1).cast("long"), (pos % 64).cast("int")
        )
        return word.bitwiseAND(mask) != 0

    pruned = probe_in.filter(
        F.col(key_col).isNotNull() & F.forall(seeds, bit_set)
    )
    if probe_in is not facts:
        pruned = pruned.drop("__bloom_words")
    return pruned.join(
        keys.select(F.col(key_col)).distinct(), key_col, "left_semi"
    )


def write_bucketed(
    df: DataFrame,
    key: str,
    n_buckets: int,
    table_name: str,
    path: str,
    sort: bool = True,
) -> None:
    """Persist ``df`` as an EXTERNAL parquet table hash-bucketed (and
    per-bucket sorted) on ``key`` — the co-location primitive behind
    shuffle-free sort-merge joins. Writing pays the shuffle ONCE; every
    subsequent equi-join or aggregation on ``key`` between tables that
    share the bucket count reads each bucket pre-partitioned and
    pre-sorted, so Catalyst drops both Exchange nodes from the join
    (outputPartitioning already satisfies the join's distribution
    requirement). This is the batch analogue of co-partitioned Kafka
    topics and THE standard layout for fact-to-fact joins too big to
    broadcast at 100 TB — bucket counts just need to be chosen once,
    corpus-wide, and honored by every producer."""
    if n_buckets < 1:
        raise ValueError(f"write_bucketed needs n_buckets >= 1, got {n_buckets}")
    w = df.write.mode("overwrite").option("path", path).bucketBy(n_buckets, key)
    if sort:
        w = w.sortBy(key)
    w.saveAsTable(table_name)


def bucketed_equi_join(
    spark,
    left_table: str,
    right_table: str,
    left_key: str,
    right_key: str,
) -> DataFrame:
    """Join two bucketed tables (written by ``write_bucketed`` with the
    SAME bucket count) on their bucket keys as a sort-merge join that
    needs NO Exchange on either side — the plan shape
    tests/test_wave16.py pins. The explicit ``merge`` hint keeps the
    optimizer from electing a broadcast join when one side happens to be
    small locally (which would hide the co-location property this
    operator exists to demonstrate); at production scale neither side
    fits a broadcast anyway."""
    left = spark.table(left_table)
    right = spark.table(right_table)
    return left.hint("merge").join(
        right, left[left_key] == right[right_key]
    )


#: mean-Earth radius, km (IUGG) — fixed so both engines hash identically.
EARTH_RADIUS_KM = 6371.0

#: km per degree of latitude (and of longitude at the equator).
KM_PER_DEG = 111.0


def haversine_km(lat1, lon1, lat2, lon2) -> Column:
    """Great-circle distance in km (haversine form — numerically stable
    for the small angles a radius join cares about, unlike the
    spherical-law-of-cosines form)."""
    p1, p2 = F.radians(lat1), F.radians(lat2)
    dp = F.radians(lat2 - lat1) / 2.0
    dl = F.radians(lon2 - lon1) / 2.0
    a = (
        F.sin(dp) * F.sin(dp)
        + F.cos(p1) * F.cos(p2) * F.sin(dl) * F.sin(dl)
    )
    return 2.0 * EARTH_RADIUS_KM * F.asin(F.sqrt(a))


def geo_radius_join(
    left: DataFrame,
    right: DataFrame,
    radius_km: float,
    cell_deg: float,
    lat_l: str = "lat",
    lon_l: str = "lon",
    lat_r: str = "lat",
    lon_r: str = "lon",
) -> DataFrame:
    """Spatial radius join via grid-cell blocking — the standard way to
    make "all pairs within r km" a SHUFFLE-KEYED equi-join instead of a
    cross join: snap both sides to a (floor(lat/cell), floor(lon/cell))
    grid, replicate the LEFT side onto its 3x3 cell neighborhood (a
    bounded 9x explode — the space-filling-curve trick Sedona/Magellan
    and every geo engine use), equi-join on the cell, and confirm with
    the exact haversine predicate. Cost: one 9x map-side replication +
    one hash join keyed on cells; candidate density is bounded by cell
    area, never by table size — the same blocking discipline as every
    dedup operator in this repo (never all-pairs).

    CONTRACT: ``cell_deg`` must cover ``radius_km`` in BOTH axes at
    every latitude present — lat needs cell_deg >= radius_km/111 (this
    function enforces that much), lon needs
    cell_deg >= radius_km/(111*cos(lat)), which grows toward the poles:
    the caller picks cell_deg for its data's latitude band (or bands by
    |lat|, the production refinement). Longitudes must live in
    (-180+cell, 180-cell) — antimeridian wrap is not blocked for.

    Returns left + right columns plus ``dist_km``. Column names must be
    disjoint across the two inputs (alias before joining)."""
    if radius_km <= 0:
        raise ValueError(f"geo_radius_join needs radius_km > 0, got {radius_km}")
    if cell_deg * KM_PER_DEG < radius_km:
        raise ValueError(
            f"cell_deg {cell_deg} cannot cover radius_km {radius_km}: "
            f"needs >= {radius_km / KM_PER_DEG:.4f} deg (and more at high "
            "latitude for the longitude axis)"
        )
    offs = F.explode(
        F.array(*[F.struct(F.lit(dy).alias("dy"), F.lit(dx).alias("dx"))
                  for dy in (-1, 0, 1) for dx in (-1, 0, 1)])
    ).alias("_o")
    lhs = left.select(
        "*",
        F.floor(F.col(lat_l) / cell_deg).alias("_cy0"),
        F.floor(F.col(lon_l) / cell_deg).alias("_cx0"),
    ).select("*", offs).select(
        "*",
        (F.col("_cy0") + F.col("_o.dy")).alias("_cy"),
        (F.col("_cx0") + F.col("_o.dx")).alias("_cx"),
    ).drop("_cy0", "_cx0", "_o")
    rhs = right.select(
        "*",
        F.floor(F.col(lat_r) / cell_deg).alias("_cy"),
        F.floor(F.col(lon_r) / cell_deg).alias("_cx"),
    )
    d = haversine_km(F.col(lat_l), F.col(lon_l), F.col(lat_r), F.col(lon_r))
    return (
        lhs.join(rhs, ["_cy", "_cx"])
        .withColumn("dist_km", d)
        .filter(F.col("dist_km") < F.lit(radius_km))
        .drop("_cy", "_cx")
    )
