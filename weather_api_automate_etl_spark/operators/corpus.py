"""Corpus-composition operators: mixture tables and packing planning.

The bookkeeping layer of a training-data pipeline: what is the corpus made
of (per-language/per-source shares — the table a data-mixing config is
written against), and how many packed context windows does each slice
yield. Both are plain aggregates — one shuffle of map-side-combined
partials regardless of corpus size; the output tables are
strata-cardinality-small.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window, functions as F


def source_mix(
    docs: DataFrame,
    strata: Sequence[str] = ("lang", "source"),
    weight_col: str = "n_chars",
) -> DataFrame:
    """Mixture table per stratum: document count, weight mass (chars or
    tokens), and the stratum's share of corpus docs and of corpus weight.

    Shares come from unpartitioned window sums OVER THE AGGREGATED table —
    the windows run on strata-cardinality rows (thousands at most), never
    on the corpus, so the single-partition window is not a scale hazard.
    """
    agg = docs.groupBy(*strata).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.col(weight_col)).cast("long").alias("weight"),
    )
    w = Window.partitionBy()
    return agg.select(
        *strata,
        "n_docs",
        "weight",
        F.round(F.col("n_docs") / F.sum("n_docs").over(w), 6).alias("doc_share"),
        F.round(F.col("weight") / F.sum("weight").over(w), 6).alias("weight_share"),
    )


def pack_estimate(
    docs: DataFrame,
    tokens_col,
    strata: Sequence[str] = ("source",),
    ctx_len: int = 512,
) -> DataFrame:
    """Per-stratum packed-sequence planning for a context length: total
    tokens, the lower-bound number of packed sequences (⌈Σtokens/ctx⌉ —
    what concat-and-chunk packing achieves), the packing efficiency of
    emitting one padded sequence per document instead, and how many
    documents overflow the context (need splitting or truncation).

    ``tokens_col`` may be a column name or an expression (e.g. a BPE-ish
    token count computed on the fly).
    """
    t = F.col(tokens_col) if isinstance(tokens_col, str) else tokens_col
    return (
        docs.groupBy(*strata)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum(t).cast("long").alias("total_tokens"),
            F.sum(F.when(t > ctx_len, 1).otherwise(0)).cast("long").alias(
                "n_overflow_docs"
            ),
            F.sum(F.ceil(t.cast("double") / ctx_len)).cast("long").alias(
                "padded_seqs"
            ),
        )
        .select(
            *strata,
            "n_docs",
            "total_tokens",
            F.ceil(F.col("total_tokens").cast("double") / ctx_len)
            .cast("long")
            .alias("packed_seqs"),
            F.round(
                F.col("total_tokens")
                / (F.col("padded_seqs") * F.lit(float(ctx_len))),
                6,
            ).alias("padded_efficiency"),
            "n_overflow_docs",
        )
    )
