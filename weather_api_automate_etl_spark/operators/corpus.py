"""Corpus-composition operators: mixture tables, packing planning,
benchmark decontamination, and length profiling.

The bookkeeping layer of a training-data pipeline: what is the corpus made
of (per-language/per-source shares — the table a data-mixing config is
written against), how many packed context windows each slice yields,
which training documents leak benchmark n-grams, and how document lengths
distribute. All are plain aggregates/joins — one shuffle of map-side-
combined partials regardless of corpus size; the output tables are
strata- or benchmark-cardinality-small.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window, functions as F

from weather_api_automate_etl_spark.functions.text import tokens, word_shingles


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


def pack_assign(
    docs: DataFrame,
    tokens_col,
    strata: Sequence[str] = ("source",),
    id_col: str = "doc_id",
    ctx_len: int = 512,
) -> DataFrame:
    """Concat-and-chunk sequence ASSIGNMENT (the step after
    :func:`pack_estimate` counts): within each stratum, documents are laid
    head-to-tail in ``id_col`` order and cut into ``ctx_len``-token
    sequences; each doc gets the sequence id and offset where it STARTS
    (a doc may straddle into the next sequence — that is the
    concat-and-chunk contract; the trainer's loader handles the split).

    Deterministic (pure function of the data + ordering) and
    SQL-expressible: one cumulative-sum window per stratum — a single
    shuffle on the strata key at any corpus size, no iterative passes.
    """
    t = F.col(tokens_col) if isinstance(tokens_col, str) else tokens_col
    w = (
        Window.partitionBy(*strata)
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    start = F.sum(t).over(w) - t  # tokens laid down before this doc
    # seq_id via INTEGER division (`div`), not floor(double) — a per-stratum
    # cumulative token count above 2^53 would silently mis-bucket through a
    # double; same integer-div discipline as the ns-epoch path in tables.py
    return docs.select(
        id_col,
        *strata,
        t.alias("n_tokens"),
        F.sum(t).over(w).alias("__cum"),
    ).select(
        id_col,
        *strata,
        "n_tokens",
        F.expr(f"(__cum - n_tokens) div {int(ctx_len)}")
        .cast("long")
        .alias("seq_id"),
        ((F.col("__cum") - F.col("n_tokens")) % F.lit(ctx_len))
        .cast("long")
        .alias("seq_offset"),
    )


def decontaminate(
    train: DataFrame,
    bench: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 13,
    broadcast_bench: bool = True,
) -> DataFrame:
    """Benchmark decontamination report: training documents that share at
    least one k-word shingle with any benchmark document (the standard
    n-gram test-set-leakage check; real pipelines use k≈13).

    Shape: both sides explode to DISTINCT (id, gram) pairs — map-side
    array math + one distinct — then the benchmark grams collapse to a
    (gram → first benchmark doc) table and equi-join against the training
    grams. The benchmark suite is tiny next to a training corpus, so its
    gram table is broadcast by default (``broadcast_bench=False`` for a
    benchmark too big to broadcast — the join then buckets on gram).
    Returns one row per CONTAMINATED training doc: (id, n_grams_hit,
    first_bench_id); clean docs are absent (anti-join against this table
    to get the decontaminated corpus).
    """
    def grams(df: DataFrame) -> DataFrame:
        g = word_shingles(tokens(text_col), k)
        return (
            df.select(F.col(id_col), F.explode(F.array_distinct(g)).alias("gram"))
            .distinct()
        )

    bench_grams = grams(bench).groupBy("gram").agg(
        F.min(id_col).alias("first_bench_id")
    )
    if broadcast_bench:
        bench_grams = F.broadcast(bench_grams)
    return (
        grams(train)
        .join(bench_grams, "gram")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_grams_hit"),
            F.min("first_bench_id").alias("first_bench_id"),
        )
    )


def length_histogram(
    docs: DataFrame,
    value_col: str = "n_chars",
    bin_width: int = 50,
    n_bins: int = 12,
) -> DataFrame:
    """Fixed-width histogram of a length-ish column with a clamped top
    bucket (everything ≥ (n_bins-1)·width lands in the last bin, so the
    output is always exactly ≤ n_bins rows no matter the outliers).

    One map-side-combined aggregate over n_bins groups; the share column
    comes from a window sum over the n_bins-row aggregate, not the corpus.
    Out-of-domain values cannot break the row-count contract: negatives
    clamp into bin 0 (like the outlier clamp at the top) and NULLs are
    excluded (no length → no histogram mass).
    """
    bucket = F.greatest(
        F.least(F.floor(F.col(value_col) / F.lit(bin_width)), F.lit(n_bins - 1)),
        F.lit(0),
    ).cast("int")
    agg = (
        docs.filter(F.col(value_col).isNotNull())
        .groupBy(bucket.alias("bucket"))
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )
    w = Window.partitionBy()
    return agg.select(
        (F.col("bucket") * bin_width).alias("bin_lo"),
        F.when(F.col("bucket") < n_bins - 1, (F.col("bucket") + 1) * bin_width)
        .alias("bin_hi"),
        "n_docs",
        F.round(F.col("n_docs") / F.sum("n_docs").over(w), 6).alias("share"),
    )


def train_shuffle(
    df: DataFrame,
    id_col: str = "doc_id",
    n_shards: int = 8,
    seed: str = "epoch0",
    keep_cols: Sequence[str] = (),
) -> DataFrame:
    """Deterministic global training shuffle + shard assignment: every
    document gets a content-hash sort key (md5 of seed:id — change the
    seed string to get an independent permutation per epoch), a shard in
    [0, n_shards) from the key's top 32 bits, and its 0-based position
    within the shard's key order. The writer that follows partitions by
    ``shard`` and sorts by ``pos`` — a reproducible, engine-portable
    epoch order with no RNG state (the sampling.py hash discipline).

    Scale: the shard assignment is map-only; the in-shard position is a
    row_number window partitioned BY SHARD — each shard sorts
    independently (corpus_size/n_shards rows per task, the same layout
    the downstream writer needs), never a single global sort.
    """
    key = F.md5(
        F.concat_ws(":", F.lit(seed), F.col(id_col).cast("string"))
    )
    keyed = df.select(
        F.col(id_col),
        *[F.col(c) for c in keep_cols],  # carried through, not re-joined —
        # a caller joining this output back on id_col would re-execute the
        # whole upstream lineage a second time (q_corpus_pipeline lesson)
        key.alias("sort_key"),
        (F.conv(F.substring(key, 1, 8), 16, 10).cast("long") % n_shards)
        .cast("int")
        .alias("shard"),
    )
    w = Window.partitionBy("shard").orderBy("sort_key", id_col)
    return keyed.withColumn(
        "pos", (F.row_number().over(w) - 1).cast("int")
    ).select(id_col, *keep_cols, "shard", "pos", "sort_key")


def curriculum_order(
    df: DataFrame,
    id_col: str = "doc_id",
    score_col: str = "n_chars",
    n_buckets: int = 4,
    seed: str = "cur0",
) -> DataFrame:
    """Curriculum ordering: bucket documents into ``n_buckets`` difficulty
    quantiles of ``score_col`` (exact interpolated percentiles — the
    winsorize discipline), then give each document a deterministic
    content-hash position within its bucket. A trainer walks buckets
    easy → hard, reading each in ``pos`` order — a reproducible
    curriculum with no RNG state.

    Scale: quantile boundaries are ONE corpus aggregate broadcast back
    as a 1-row table (n_buckets−1 doubles); bucket assignment is a
    map-only comparison fold; the in-bucket position is a row_number
    window partitioned BY BUCKET (n_buckets independent sorts — the
    train_shuffle shape, never a single global sort).
    """
    fracs = [i / n_buckets for i in range(1, n_buckets)]
    bounds = df.agg(
        *[
            F.expr(f"percentile({score_col}, {f!r})").alias(f"__b{i}")
            for i, f in enumerate(fracs)
        ]
    )
    key = F.md5(F.concat_ws(":", F.lit(seed), F.col(id_col).cast("string")))
    bucket = sum(
        (F.col(score_col) > F.col(f"__b{i}")).cast("int")
        for i in range(len(fracs))
    )
    assigned = (
        df.select(id_col, score_col)
        .crossJoin(F.broadcast(bounds))
        .select(
            F.col(id_col),
            F.col(score_col),
            bucket.cast("int").alias("bucket"),
            key.alias("__key"),
        )
    )
    w = Window.partitionBy("bucket").orderBy("__key", id_col)
    return assigned.withColumn(
        "pos", (F.row_number().over(w) - 1).cast("int")
    ).select(id_col, score_col, "bucket", "pos")


def pack_sequences(
    docs: DataFrame,
    strata: Sequence[str] = ("source",),
    id_col: str = "doc_id",
    text_col: str = "text",
    ctx_len: int = 512,
    vocab_size: int = 32768,
) -> DataFrame:
    """MATERIALIZED concat-and-chunk packing — the step after
    :func:`pack_assign` decides where each document starts: emit the
    actual fixed-length training sequences as ``input_ids`` arrays, token
    ids from the same vocabulary-free md5 hash the hashing vectorizer
    uses (engine-portable; a real deployment swaps in its BPE id map as
    a broadcast join without changing the dataflow shape).

    Within each stratum, documents are laid head-to-tail in ``id_col``
    order; token global position = doc start offset (one cumulative-sum
    window over per-doc token counts) + position in doc (posexplode).
    ``seq_id = gpos div ctx_len`` (integer div — the pack_assign
    discipline), ``pos = gpos % ctx_len``; sequences rebuild by grouping
    on (strata, seq_id) and sorting the (pos, id) pairs. The final
    sequence of a stratum may be short — ``n_tokens < ctx_len`` marks it
    for the loader to drop or pad.

    Scale: one window shuffle on the strata key (doc-count rows, not
    token rows), one explode (map-side), one groupBy shuffle keyed by
    (strata, seq_id) whose groups are ctx_len-bounded — no skew regardless
    of document length distribution, because long documents straddle
    MANY sequences instead of landing in one group. Returns
    ``(*strata, seq_id, input_ids, n_tokens, n_docs)``.
    """
    toks = F.filter(tokens(text_col), lambda x: x != "")
    counted = docs.select(
        F.col(id_col), *[F.col(c) for c in strata], toks.alias("__toks")
    ).withColumn("__n", F.size("__toks").cast("long"))
    w = (
        Window.partitionBy(*strata)
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    started = counted.withColumn("__start", F.sum("__n").over(w) - F.col("__n"))
    tok_rows = started.select(
        F.col(id_col),
        *[F.col(c) for c in strata],
        F.col("__start"),
        F.posexplode("__toks").alias("__p", "__term"),
    ).select(
        F.col(id_col),
        *[F.col(c) for c in strata],
        (F.col("__start") + F.col("__p")).alias("__gpos"),
        (
            F.conv(F.substring(F.md5("__term"), 1, 8), 16, 10).cast("long")
            % vocab_size
        )
        .cast("int")
        .alias("__tid"),
    )
    placed = tok_rows.select(
        F.col(id_col),
        *[F.col(c) for c in strata],
        F.expr(f"__gpos div {int(ctx_len)}").cast("long").alias("seq_id"),
        (F.col("__gpos") % F.lit(ctx_len)).cast("int").alias("__pos"),
        "__tid",
    )
    return (
        placed.groupBy(*strata, "seq_id")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("__pos", "__tid"))),
                lambda s: s["__tid"],
            ).alias("input_ids"),
            F.count(F.lit(1)).cast("int").alias("n_tokens"),
            F.countDistinct(id_col).cast("int").alias("n_docs"),
        )
    )


def blocklist_filter(
    df: DataFrame,
    terms: Sequence[str],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Term-blocklist screen with attribution: for every document, how
    many token occurrences hit the blocklist, the FIRST offending token
    (reading order — the quality_gate first-failing-rule discipline), and
    the block verdict. Returns every input row so the caller chooses
    filter vs. quarantine-with-reason.

    Shape at scale: the blocklist is a literal in-expression array
    (blocklists are curated, thousands of terms at most — metadata), so
    the whole screen is ONE codegen'd HOF filter per row: map-only,
    scan-speed, no join, no shuffle. For a blocklist too large to inline,
    swap the array literal for a broadcast-join on token — same semantics,
    one broadcast.
    """
    if not terms:
        raise ValueError("empty blocklist: pass at least one term")
    bl = F.array(*[F.lit(t) for t in terms])
    ts = F.filter(tokens(text_col), lambda t: t != "")
    # used three times below — codegen subexpression elimination dedups
    # the filter within the single projection
    hits = F.filter(ts, lambda t: F.array_contains(bl, t))
    return df.select(
        F.col(id_col),
        F.size(hits).cast("int").alias("n_hits"),
        F.get(hits, 0).alias("first_hit"),
        (F.size(hits) > 0).alias("is_blocked"),
    )


def dsir_importance(
    docs: DataFrame,
    is_target,
    dim: int = 64,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """DSIR importance weights (Xie et al., NeurIPS 2023: Data Selection
    via Importance Resampling): score every raw document by how much it
    looks like a TARGET distribution (a trusted high-quality slice),
    using hashed n-gram features instead of a model — the standard cheap
    data-selection signal before pretraining. ``is_target`` is a boolean
    Column over ``docs`` marking the target slice (e.g. a curated
    source); the weight of doc d is the log-likelihood ratio

        w(d) = sum_t [ ln p_target(f(t)) - ln p_raw(f(t)) ]

    over its tokens t, with features f(t) = hashed unigram buckets
    (``conv(md5(t)[:8], 16) % dim`` — hashing_vectorizer's bucket, so
    the whole text→feature bridge shares one definition) and Laplace
    add-one smoothing on both distributions. Resample raw data with
    probability proportional to exp(w) — or, as here, rank by w.

    Scale shape: one token explode (scan-rate), one map-side-combined
    aggregate to the dim-row feature table (word-count shape — tiny
    result, partials absorb the key skew), one broadcast join of that
    dim-row weight table back onto the token stream, one per-doc sum.
    The feature table is O(dim) — never a vocabulary — so nothing here
    grows with corpus size except the scans. Documents with no real
    tokens are absent from the output (no features, no evidence, no
    weight). Returns (id_col, n_tokens, dsir_weight) rounded to 6."""
    if dim < 2:
        raise ValueError(f"dsir_importance needs dim >= 2, got {dim}")
    toks = F.filter(tokens(text_col), lambda t: t != "")
    feat = (
        docs.select(
            F.col(id_col),
            is_target.alias("_is_t"),
            F.explode(toks).alias("_term"),
        )
        .withColumn(
            "_f",
            F.conv(F.substring(F.md5("_term"), 1, 8), 16, 10).cast("long")
            % dim,
        )
    )
    counts = feat.groupBy("_f").agg(
        F.sum(F.when(F.col("_is_t"), 1).otherwise(0)).alias("_tc"),
        F.count(F.lit(1)).alias("_rc"),
    )
    totals = counts.agg(
        F.sum("_tc").alias("_tt"), F.sum("_rc").alias("_rt")
    )
    weights = counts.crossJoin(F.broadcast(totals)).select(
        "_f",
        (
            F.log((F.col("_tc") + 1.0) / (F.col("_tt") + float(dim)))
            - F.log((F.col("_rc") + 1.0) / (F.col("_rt") + float(dim)))
        ).alias("_lw"),
    )
    return (
        feat.join(F.broadcast(weights), "_f")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.round(F.sum("_lw"), 6).alias("dsir_weight"),
        )
    )


def dup_rate_by_source(
    df: DataFrame,
    id_col: str,
    text_col: str,
    source_col: str,
) -> DataFrame:
    """Exact-duplicate rate per source — the which-feed-sends-copies
    corpus-health readout that decides crawler dedupe placement: a
    document is a duplicate iff its content hash occurs more than once
    CORPUS-WIDE (cross-source copies count against every source holding
    one), and additionally a non-survivor iff it is not the
    lowest-id holder (the dedup_exact keep rule). One hash-keyed
    aggregate over md5(text), one co-partitioned join-back, one source
    rollup — the same shuffle class as dedup_exact itself.

    Returns ``(source, n_docs, n_in_dup_groups, n_would_drop,
    dup_rate, drop_rate)`` with rates rounded to 6.
    """
    h = F.md5(F.col(text_col))
    base = df.select(
        F.col(id_col).alias("__id"),
        F.col(source_col).alias("__src"),
        h.alias("__h"),
    )
    groups = base.groupBy("__h").agg(
        F.count(F.lit(1)).alias("__n"),
        F.min("__id").alias("__keep"),
    )
    tagged = base.join(groups, "__h").select(
        "__src",
        (F.col("__n") > 1).cast("int").alias("__dup"),
        ((F.col("__n") > 1) & (F.col("__id") != F.col("__keep")))
        .cast("int")
        .alias("__drop"),
    )
    agg = tagged.groupBy("__src").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("__dup").cast("long").alias("n_in_dup_groups"),
        F.sum("__drop").cast("long").alias("n_would_drop"),
    )
    return agg.select(
        F.col("__src").alias(source_col),
        "n_docs",
        "n_in_dup_groups",
        "n_would_drop",
        F.round(
            F.col("n_in_dup_groups") / F.col("n_docs").cast("double"), 6
        ).alias("dup_rate"),
        F.round(
            F.col("n_would_drop") / F.col("n_docs").cast("double"), 6
        ).alias("drop_rate"),
    )
