"""Embedding-column transforms for training-data pipelines: int8
quantization (storage/ANN compression) and per-dimension standardization
(feature normalization before clustering / linear probes).

Scale notes:
- ``quantize_int8`` is a pure projection (higher-order array functions,
  JVM-side, codegen'd) — zero shuffle, scan-speed at any corpus size.
- ``standardize_dims`` needs per-dimension corpus statistics: one
  posexplode → groupBy(pos) aggregation (dim × N rows in, dim rows out,
  map-side partial aggregation does the heavy lifting) and a broadcast
  join of the dim-row stats table back onto the vectors. No row×row
  shuffle anywhere.

Engine parity: the quantize step uses ``floor(x/scale + 0.5)`` (round half
toward +inf) instead of ``round()`` so Spark and the DuckDB oracle agree
bit-for-bit on .5 boundaries; per-vector folds run in double in array
order on both engines. Per-dimension AVG/VAR are aggregation-order
sensitive in the last ulp, so standardized outputs are compared rounded
(same convention as the IVF centroid probe, queries_ext.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def quantize_int8(df: DataFrame, id_col: str, vec_col: str) -> DataFrame:
    """Symmetric per-vector int8 quantization: scale = absmax/127,
    qᵢ = clamp(floor(vᵢ/scale + 0.5), -127, 127).

    Returns ``id_col, scale, q`` (array<int>) plus the reconstruction MSE —
    the quality signal a pipeline monitors before switching ANN search to
    the quantized representation. Zero vectors get scale 0 and an all-zero
    code (guarded division)."""
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    absmax = F.aggregate(
        v, F.lit(0.0), lambda acc, x: F.greatest(acc, F.abs(x))
    )
    scale = absmax / F.lit(127.0)
    q = F.when(scale > 0, F.transform(
        v,
        lambda x: F.greatest(
            F.lit(-127), F.least(F.lit(127), F.floor(x / scale + 0.5))
        ).cast("int"),
    )).otherwise(F.transform(v, lambda x: F.lit(0)))
    recon_sq = F.zip_with(
        v, q, lambda x, c: (x - c.cast("double") * scale) * (x - c.cast("double") * scale)
    )
    # greatest(size, 1) guards the empty-vector row: [] quantizes to
    # scale 0 / code [] / mse 0.0, never a 0/0 NULL
    mse = F.aggregate(recon_sq, F.lit(0.0), lambda acc, x: acc + x) / F.greatest(
        F.size(F.col(vec_col)), F.lit(1)
    )
    return df.select(
        id_col,
        scale.alias("scale"),
        q.alias("q"),
        mse.alias("mse"),
    )


def dim_stats(df: DataFrame, vec_col: str) -> DataFrame:
    """Per-dimension corpus mean / population stddev: posexplode →
    groupBy(pos). dim × N rows collapse to dim rows; partial aggregation
    keeps the shuffle tiny."""
    exploded = df.select(
        F.posexplode(F.transform(F.col(vec_col), lambda x: x.cast("double"))).alias(
            "pos", "val"
        )
    )
    return exploded.groupBy("pos").agg(
        F.avg("val").alias("mu"),
        F.stddev_pop("val").alias("sigma"),
    )


def standardize_dims(df: DataFrame, id_col: str, vec_col: str) -> DataFrame:
    """Per-dimension z-score ((vᵢ − μᵢ)/σᵢ) over the whole corpus —
    feature standardization before k-means / linear probing.

    The dim-row stats table broadcasts back onto the exploded vectors;
    reassembly is a per-row groupBy on ``id_col`` (one shuffle keyed by the
    id — at scale this is the same key the table is already laid out on).
    Zero-variance dimensions standardize to 0.0 (guarded division)."""
    stats = dim_stats(df, vec_col)
    exploded = df.select(
        F.col(id_col),
        F.posexplode(F.transform(F.col(vec_col), lambda x: x.cast("double"))).alias(
            "pos", "val"
        ),
    )
    z = exploded.join(F.broadcast(stats), "pos").select(
        id_col,
        "pos",
        F.when(F.col("sigma") > 0, (F.col("val") - F.col("mu")) / F.col("sigma"))
        .otherwise(F.lit(0.0))
        .alias("z"),
    )
    return (
        z.groupBy(id_col)
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "z"))),
                lambda s: s["z"],
            ).alias("z_vec")
        )
    )
