"""Text-analysis operators over the ``documents`` table.

Extension surface (SURVEY.md §2.7 E3): language-ID, quality scoring, token
counting, fingerprinting — all pure column expressions from functions/text.py,
so each is a single narrow projection (scan-speed at any scale) unless it
aggregates, in which case it's one map-side-combined hash aggregate.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

from weather_api_automate_etl_spark.functions.core import round_half_up_via_double
from weather_api_automate_etl_spark.functions.text import (
    STOPWORDS,
    bpe_ish_token_count,
    document_fingerprint,
    quality_score,
    tokens,
)


def _stopword_hits(toks: Column, lang: str) -> Column:
    return F.size(F.filter(toks, lambda t: t.isin(*STOPWORDS[lang])))


def lang_id(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Stopword-profile language ID: score each language by stopword
    occurrences; highest score wins (ties broken in en>es>fr>de order),
    zero evidence → 'und'. A deterministic n-gram-heuristic classifier."""
    toks = tokens(text_col)
    scores = {lang: _stopword_hits(toks, lang) for lang in STOPWORDS}
    best = F.greatest(*scores.values())
    pred = F.lit("und")
    for lang in reversed(list(STOPWORDS)):  # build CASE so earlier langs win ties
        pred = F.when((scores[lang] > 0) & (scores[lang] == best), F.lit(lang)).otherwise(pred)
    return df.select(
        F.col(id_col),
        pred.alias("predicted_lang"),
        *[scores[lang].alias(f"score_{lang}") for lang in STOPWORDS],
    )


def text_profile(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Per-document token statistics: whitespace tokens, BPE-ish pre-tokens,
    character length — the token-accounting primitive of a data pipeline."""
    # drop the '' pseudo-token of empty docs so ws_tokens reports 0
    toks = F.filter(tokens(text_col), lambda t: t != "")
    return df.select(
        F.col(id_col),
        F.size(toks).cast("long").alias("ws_tokens"),
        bpe_ish_token_count(text_col).alias("bpe_tokens"),
        F.length(F.trim(F.col(text_col))).cast("long").alias("n_chars_trimmed"),
    )


def quality_scores(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Per-document quality score plus a keep/drop verdict at 0.5."""
    q = quality_score(text_col)
    return df.select(
        F.col(id_col),
        # C-style rounding so the score ties agree with the DuckDB oracle
        round_half_up_via_double(q, 6).alias("quality"),
        F.when(q >= 0.5, F.lit("keep")).otherwise(F.lit("drop")).alias("verdict"),
    )


def quality_gate(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_chars: int = 200,
    max_top_word_frac: float = 0.12,
    min_quality: float = 0.7,
    passthrough: bool = False,
) -> DataFrame:
    """The composed C4/Gopher-style filter chain as ONE verdict operator:
    rules evaluate in a fixed order and the FIRST failing rule names the
    violation (length floor → repetition ceiling → composite-quality
    floor), so downstream loss accounting can attribute every dropped doc
    to exactly one cause. Returns (id, violation, keep); violation is NULL
    for keepers. ``passthrough=True`` returns the INPUT columns plus the
    verdict instead — a consumer filtering on ``keep`` then stays on one
    scan lineage (joining the verdict back on the id would scan + shuffle
    twice; the q_corpus_pipeline composition uses this).

    Everything is per-row JVM expression work (length, HOF mode-of-array,
    the quality_score arithmetic) in one codegen stage — zero shuffles at
    any corpus size, and Catalyst dedups the shared token-array
    subexpressions across rules."""

    t = F.col(text_col)
    n_chars = F.length(F.trim(t))
    toks = tokens(text_col)
    n = F.size(toks)
    wcounts = F.transform(
        F.array_distinct(toks), lambda d: F.size(F.filter(toks, lambda x: x == d))
    )
    top_frac = F.when(
        n > 0, F.array_max(wcounts).cast("double") / n
    ).otherwise(F.lit(0.0))
    violation = (
        F.when(n_chars < min_chars, F.lit("too_short"))
        .when(top_frac > max_top_word_frac, F.lit("repetitive"))
        .when(quality_score(text_col) < min_quality, F.lit("low_quality"))
    )
    if passthrough:
        return df.select(
            "*",
            violation.alias("violation"),
            violation.isNull().alias("keep"),
        )
    return df.select(
        F.col(id_col),
        violation.alias("violation"),
        violation.isNull().alias("keep"),
    )


def repetition_profile(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Gopher-style repetition metrics per document: the fraction of tokens
    claimed by the most frequent word and by the most frequent word-bigram
    (boilerplate / degenerate-generation filters in every LLM data
    pipeline; cf. Rae et al. 2021 §A1.1's repetition thresholds).

    Pure higher-order-function arithmetic — mode-of-array via
    distinct→count-occurrences — so the whole profile is ONE map-only
    projection: zero shuffle at any corpus size. O(u·n) per doc in the
    distinct-token count u; for book-length docs switch to the
    explode+groupBy formulation instead.
    """
    from weather_api_automate_etl_spark.functions.text import word_shingles

    def profile(t):
        n = F.size(t)
        wcounts = F.transform(
            F.array_distinct(t), lambda d: F.size(F.filter(t, lambda x: x == d))
        )
        bi = word_shingles(t, 2)
        nb = F.size(bi)
        bcounts = F.transform(
            F.array_distinct(bi), lambda d: F.size(F.filter(bi, lambda x: x == d))
        )
        return F.struct(
            n.cast("long").alias("n_words"),
            F.when(
                n > 0, F.round(F.array_max(wcounts).cast("double") / n, 6)
            ).alias("top_word_frac"),
            F.when(
                nb > 0, F.round(F.array_max(bcounts).cast("double") / nb, 6)
            ).alias("top_bigram_frac"),
        )

    # The single-element-array wrapper binds the token array once (the
    # projection-collapse recompute trap), and inline() expands the struct
    # to columns as ONE expression — getField per column would re-evaluate
    # the whole profile per field.
    return df.select(
        F.col(id_col),
        F.inline(
            F.transform(
                # the '' pseudo-token of empty docs must not count as a
                # word (n_words 0, fractions NULL — not 1/1.0)
                F.array(F.filter(tokens(text_col), lambda t: t != "")),
                profile,
            )
        ),
    )


def chunk_text(
    df: DataFrame,
    chunk_tokens: int = 16,
    stride: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Sliding-window chunking: overlapping ``chunk_tokens``-token windows
    every ``stride`` tokens — the standard preprocessing for embedding /
    context-window pipelines. The final partial window is kept iff it adds
    tokens beyond the previous full window (so short docs yield exactly one
    chunk and nothing is silently dropped).

    Map-only: chunk starts come from a sequence() over the token count,
    chunk text from array slices — explode multiplies rows but no shuffle
    is introduced; downstream repartition is the consumer's choice.
    Returns (id, chunk_idx, chunk_text, n_tokens).
    """
    if chunk_tokens < 1 or stride < 1:
        raise ValueError(
            f"chunk_tokens and stride must be >= 1, got "
            f"{chunk_tokens}/{stride} (stride <= 0 would count DOWN)"
        )

    def build(t):
        n = F.size(t)
        # chunk-start count: ceil((n − chunk)/stride) extra windows past the
        # first, clamped at 0 — the last window is partial but never fully
        # contained in the previous one
        last = (
            F.when(
                n > chunk_tokens,
                F.ceil((n - F.lit(chunk_tokens)) / F.lit(float(stride))),
            )
            .otherwise(F.lit(0))
            .cast("int")
        )
        starts = F.sequence(F.lit(0), last)
        return F.transform(
            starts,
            lambda i: F.struct(
                i.alias("chunk_idx"),
                F.concat_ws(
                    " ", F.slice(t, i * stride + 1, chunk_tokens)
                ).alias("chunk_text"),
                F.least(n - i * stride, F.lit(chunk_tokens)).alias("n_tokens"),
            ),
        )

    # the '' pseudo-token of empty docs must not count (module-wide
    # convention): an empty doc yields ONE empty chunk with n_tokens 0
    chunks = F.transform(
        F.array(F.filter(tokens(text_col), lambda t: t != "")), build
    )[0]
    return df.select(F.col(id_col), F.explode(chunks).alias("c")).select(
        id_col,
        F.col("c.chunk_idx").cast("int").alias("chunk_idx"),
        F.col("c.chunk_text").alias("chunk_text"),
        F.col("c.n_tokens").cast("int").alias("n_tokens"),
    )


def unigram_logprob(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-document average negative log-probability under the corpus's
    own add-one-smoothed unigram model — the CCNet/KenLM-style statistical
    quality signal (documents whose token distribution diverges from the
    corpus score high and get filtered or down-weighted).

    avg_neg_logprob(D) = mean over tokens t of −ln((c(t)+1)/(N+V)), with
    c(t) the corpus token count, N total tokens, V vocabulary size.

    Shape: one explode + one token-keyed aggregate builds the frequency
    table (vocabulary-sized — deliberately NOT broadcast; the scoring
    join buckets on the token), corpus stats are a 1-row broadcast (the
    bm25 pattern), and the per-doc reduction is one map-side-combined
    aggregate. Two shuffles total regardless of corpus size.
    """
    tok = docs.select(
        F.col(id_col), F.explode(tokens(text_col)).alias("t")
    ).filter(F.col("t") != "")  # the '' pseudo-token of empty docs must
    # not enter the vocabulary (the hashing_vectorizer invariant)
    freq = tok.groupBy("t").agg(F.count(F.lit(1)).alias("c"))
    stats = freq.agg(
        F.sum("c").alias("n_total"), F.count(F.lit(1)).alias("v")
    )
    neg_lp = -F.log(
        (F.col("c") + F.lit(1.0)) / (F.col("n_total") + F.col("v"))
    )
    return (
        tok.join(freq, "t")
        .crossJoin(F.broadcast(stats))
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.round(F.avg(neg_lp), 6).alias("avg_neg_logprob"),
        )
    )


def bm25_scores(
    df: DataFrame,
    terms: list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """BM25 relevance of every document against a bag of query terms — the
    lexical-retrieval complement to the embedding similarity family.

    score(D) = Σ_t idf(t) · tf(t,D)·(k1+1) / (tf(t,D) + k1·(1−b+b·|D|/avgdl))
    with idf(t) = ln((N − df(t) + 0.5)/(df(t) + 0.5) + 1) (the standard
    non-negative variant).

    Shape: per-doc term frequencies are map-only HOF counts (no explode of
    the corpus); df comes from one aggregate over those counts; the
    (term, df) and (N, avgdl) tables are tiny and broadcast. One shuffle
    total (the df aggregate) — the corpus is scanned twice (df pass, score
    pass), never joined to itself. Returns (id, score) for docs with
    score > 0.
    """
    if not terms:
        raise ValueError("bm25_scores requires at least one query term")
    toks = tokens(text_col)

    def _eq(term: str):
        # closure factory, NOT a defaulted lambda param: a 2-arg lambda makes
        # F.filter bind the second param to the element INDEX (silent
        # corruption / cast errors). Terms lowercase to match tokens()'s
        # normalization — a raw 'Spark' would silently score 0 everywhere.
        return lambda x: x == F.lit(term.lower())

    tf_cols = [
        F.size(F.filter(toks, _eq(term))).alias(f"__tf_{i}")
        for i, term in enumerate(terms)
    ]
    base = df.select(F.col(id_col), F.size(toks).alias("__dl"), *tf_cols)
    stats = base.agg(
        F.count(F.lit(1)).alias("__n"),
        F.avg("__dl").alias("__avgdl"),
        *[
            F.sum(F.when(F.col(f"__tf_{i}") > 0, 1).otherwise(0)).alias(f"__df_{i}")
            for i in range(len(terms))
        ],
    )
    scored = base.crossJoin(F.broadcast(stats))
    score = None
    for i in range(len(terms)):
        tf = F.col(f"__tf_{i}").cast("double")
        idf = F.log(
            (F.col("__n") - F.col(f"__df_{i}") + 0.5) / (F.col(f"__df_{i}") + 0.5)
            + 1.0
        )
        part = (
            idf
            * tf
            * (k1 + 1.0)
            / (tf + k1 * (1.0 - b + b * F.col("__dl") / F.col("__avgdl")))
        )
        score = part if score is None else score + part
    return (
        # composite non-negative score vs a C-engine oracle: use the
        # double-product rounding (F.round's exact-BigDecimal HALF_UP
        # disagrees on 1e-6 ties — functions/core.py:23)
        scored.select(
            F.col(id_col), round_half_up_via_double(score, 6).alias("score")
        )
        .filter(F.col("score") > 0)
    )


def fingerprints(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", k: int = 4
) -> DataFrame:
    """Rolling-hash content fingerprints (min-md5 over k-word shingles)."""
    return df.select(
        F.col(id_col), document_fingerprint(text_col, k).alias("fingerprint")
    )


def tfidf_top_terms(
    df: DataFrame,
    k: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Top-``k`` TF-IDF terms per document (smooth idf:
    ln((N+1)/(df+1)) + 1) — the classic keyword/topic signal a corpus
    pipeline materializes for search, clustering seeds and near-dup
    explanation.

    Shape at scale: one explode + (doc, term)-keyed count aggregate (tf),
    a term-keyed count-distinct (df — vocabulary-sized, joined on the
    term key like unigram_logprob's freq table, deliberately NOT
    broadcast), the corpus doc count as a 1-row broadcast, and a per-doc
    window top-k that Spark runs as WindowGroupLimit (per-partition
    top-k, no full sort). No step is quadratic; no driver collect."""

    tok = df.select(
        F.col(id_col), F.explode(tokens(text_col)).alias("term")
    ).filter(F.col("term") != "")
    tf = tok.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n_docs = df.agg(F.count(F.lit(1)).alias("n_docs"))
    scored = (
        tf.join(dfreq, "term")
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "tfidf",
            F.round(
                F.col("tf")
                * (
                    F.log((F.col("n_docs") + 1.0) / (F.col("df") + 1.0))
                    + F.lit(1.0)
                ),
                6,
            ),
        )
    )
    w = Window.partitionBy(id_col).orderBy(F.desc("tfidf"), F.asc("term"))
    return (
        scored.withColumn("rk", F.row_number().over(w).cast("int"))
        .filter(F.col("rk") <= k)
        .select(id_col, "term", F.col("tf").cast("long").alias("tf"), "tfidf", "rk")
    )


def token_entropy(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-document Shannon entropy of the token distribution (nats):
    H = ln(n) − Σ c·ln(c) / n — a repetition/diversity quality signal
    (low entropy ⇒ templated or repetitive text; pairs with
    repetition_profile's duplicate-line fractions).

    One explode + (doc, term) count + per-doc aggregate — two shuffles,
    both map-side combined; the entropy identity avoids materializing
    per-term probabilities."""
    counts = (
        df.select(F.col(id_col), F.explode(tokens(text_col)).alias("term"))
        .filter(F.col("term") != "")
        .groupBy(id_col, "term")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    return (
        counts.groupBy(id_col)
        .agg(
            F.sum("c").cast("long").alias("n_tokens"),
            F.count(F.lit(1)).cast("long").alias("n_distinct"),
            F.round(
                F.log(F.sum("c"))
                - F.sum(F.col("c") * F.log("c")) / F.sum("c"),
                6,
            ).alias("entropy"),
        )
    )


def compression_ratio(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-document zlib compression ratio (compressed/raw bytes) — the
    Gopher-style redundancy signal: templated or looping text compresses
    far below natural prose, and near-random text sits near (or just
    above) 1.0. Deterministic for a fixed zlib level, but NOT
    SQL-expressible, so its registry entry is rows-only with invariant
    tests (the q_kmeans discipline).

    Null text propagates as a null ratio (the sibling-operator contract,
    never a Python-worker crash); empty text gets raw_bytes 0 and a null
    ratio (a 0-byte doc has no meaningful compressibility).

    Alongside the raw ratio, ``ratio_bucket`` = floor(ratio·10)/10 — the
    version-robust readout a filtering config should threshold on: madler
    zlib's level-6 deflate output has been byte-stable for decades, but
    the CONTRACT only promises the decile (tests pin bucket agreement
    across compression levels and the regime anchors: repeated text ≪ 1,
    incompressible text ≈ 1).

    Arrow-batched ``mapInPandas`` — the bytes never leave the executor,
    each batch is one vectorized pass; zero shuffle, scan-speed."""
    import pandas as pd  # noqa: F401

    id_type = df.schema[id_col].dataType.simpleString()  # not hardcoded
    out_schema = (
        f"{id_col} {id_type}, raw_bytes long, ratio double, "
        "ratio_bucket double"
    )

    def fn(batches):
        import math
        import zlib

        import pandas as pd

        for pdf in batches:
            enc = [
                t.encode("utf-8") if t is not None else None
                for t in pdf[text_col]
            ]
            raw = [len(b) if b is not None else 0 for b in enc]
            ratio = [
                round(len(zlib.compress(b, 6)) / r, 6)
                if b is not None and r
                else None
                for b, r in zip(enc, raw)
            ]
            bucket = [
                math.floor(x * 10) / 10 if x is not None else None
                for x in ratio
            ]
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "raw_bytes": raw,
                    "ratio": ratio,
                    "ratio_bucket": bucket,
                }
            )

    return df.select(id_col, text_col).mapInPandas(fn, out_schema)


def hashing_vectorizer(
    df: DataFrame,
    dim: int = 16,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Feature-hashing (hashing-trick) term-frequency vectorizer: token t
    lands in bucket ``conv(md5(t)[:8], 16) % dim``; the document's vector
    is the per-bucket token count. No vocabulary table, no fit step, no
    OOV problem — the standard way to get fixed-width text features at
    corpus scale (and the cheap text→vector bridge into the similarity /
    ANN operators).

    Map-only: ONE pass binding the hashed-bucket array, then a dim-wide
    count-per-bucket fold (O(dim·n_tokens) per doc — fine for feature
    dims; for dim ≥ ~256 switch to explode + groupBy pivot). md5-derived
    buckets keep it engine-portable (sampling.py's discipline).
    Content-free documents (empty/whitespace text tokenizes to the ''
    pseudo-token) get the zero vector and n_tokens 0 — they must not
    share a feature coordinate with real one-token docs."""
    toks = F.filter(tokens(text_col), lambda t: t != "")
    buckets = F.transform(
        toks,
        lambda t: F.conv(F.substring(F.md5(t), 1, 8), 16, 10)
        .cast("long")
        % dim,
    )
    # bind the bucket array once (projection-collapse trap — see
    # minhash_signatures), then count per feature index
    vec = F.transform(
        F.array(buckets),
        lambda bs: F.transform(
            F.sequence(F.lit(0), F.lit(dim - 1)),
            lambda i: F.size(F.filter(bs, lambda b: b == i.cast("long"))),
        ),
    )[0]
    return df.select(
        F.col(id_col),
        vec.alias("tf_vec"),
        F.size(toks).cast("long").alias("n_tokens"),
    )


def heavy_hitters(
    df: DataFrame,
    m: int = 100,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Corpus heavy hitters by the classic TWO-PASS Misra-Gries recipe:

    1. candidate pass — each partition keeps a bounded Misra-Gries
       summary of ≤ ``m`` tokens (batched variant: merge exact batch
       counts, then subtract the (m+1)-th largest count from all and
       drop non-positives). Pigeonhole guarantees the UNION of
       per-partition candidates is a superset of every token with global
       frequency > N/m — the state is m entries per partition no matter
       the corpus size, the mergeable-sketch property;
    2. exact pass — count ONLY the candidates (tiny set → broadcast
       semi-join) and keep those with count > N/m.

    The output is therefore EXACT (all tokens with freq > N/m, true
    counts) while pass 1 never holds more than m counters — the shape
    that finds corpus boilerplate/stop tokens at 100 TB without a full
    vocabulary aggregate. Returns (term, cnt, n_total) sorted-free.

    GENUINELY two passes over the corpus: the candidate partials also
    carry each partition's token total (one NULL-term row), and the tiny
    summary (≤ partitions·(m+1) rows) is localCheckpointed so deriving
    candidates AND N from it never re-runs the scan.
    """
    import pandas as pd  # noqa: F401

    if m < 1:
        raise ValueError(f"invalid capacity m={m}: need m >= 1")
    tok = df.select(F.explode(tokens(text_col)).alias("term")).filter(
        F.col("term") != ""
    )

    def mg_partial(batches):
        import pandas as pd

        counters = pd.Series(dtype="int64")
        total = 0
        for pdf in batches:
            batch = pdf["term"].value_counts()
            total += int(batch.sum())
            counters = counters.add(batch, fill_value=0)
            if len(counters) > m:
                # batched Misra-Gries decrement: subtracting the
                # (m+1)-th largest count from every counter is a stack
                # of standard decrement steps — the superset guarantee
                # (est >= true − N/m) is preserved
                kth = counters.nlargest(m + 1).iloc[-1]
                counters = counters - kth
                counters = counters[counters > 0]
        yield pd.DataFrame(
            {
                "term": list(counters.index.astype(str)) + [None],
                "n": [0] * len(counters) + [total],
            }
        )

    summary = tok.mapInPandas(
        mg_partial, "term string, n long"
    ).localCheckpoint(eager=True)
    candidates = summary.filter(F.col("term").isNotNull()).select(
        "term"
    ).distinct()
    n_total = summary.agg(F.sum("n").alias("n_total"))
    return (
        tok.join(F.broadcast(candidates), "term")
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .crossJoin(F.broadcast(n_total))
        .filter(F.col("cnt") > F.col("n_total") / m)
        .select("term", "cnt", "n_total")
    )


def pmi_pairs(
    df: DataFrame,
    window: int = 2,
    min_count: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Pointwise mutual information over token co-occurrence within a
    ±``window`` span: pmi(a,b) = ln(N·c(a,b) / (c(a)·c(b))) for ORDERED
    pairs (a before b, gap ≤ window), filtered to pairs seen at least
    ``min_count`` times — the collocation/phrase-mining statistic.

    Shape at scale: pair GENERATION is map-only (a nested HOF flatten
    over each doc's token array — no self-join on positions); then one
    (a,b)-keyed count aggregate, one token-keyed marginal aggregate
    joined back on each side (vocabulary-sized, NOT broadcast — the
    unigram_logprob discipline), and a 1-row total broadcast. N is the
    number of co-occurrence SLOTS (Σ pair counts), so Σ p(a,b) = 1.
    """
    toks = tokens(text_col)
    # all ordered within-window pairs of one doc, as one bound HOF
    # expression (array wrapper against projection collapse)
    pair_arrays = F.transform(
        F.array(F.filter(toks, lambda t: t != "")),
        lambda ts: F.flatten(
            F.transform(
                F.sequence(F.lit(0), F.greatest(F.size(ts) - 2, F.lit(0))),
                lambda i: F.transform(
                    F.slice(ts, i + 2, window),
                    lambda b: F.struct(
                        F.element_at(ts, i + 1).alias("a"), b.alias("b")
                    ),
                ),
            )
        ),
    )[0]
    pairs = df.select(F.explode(pair_arrays).alias("p")).select("p.a", "p.b")
    co = pairs.groupBy("a", "b").agg(F.count(F.lit(1)).alias("c_ab"))
    # marginals and the slot total re-aggregate the vocabulary-sized co —
    # the expensive HOF pair-generation map stage runs ONCE, not four
    # times (c(a) = Σ_b c(a,b) etc. over the same slot distribution)
    left = co.groupBy("a").agg(F.sum("c_ab").alias("c_a"))
    right = co.groupBy("b").agg(F.sum("c_ab").alias("c_b"))
    n = co.agg(F.sum("c_ab").alias("n_slots"))
    # double BEFORE multiplying: n_slots·c_ab as long·long wraps past
    # 2^63 at real corpus scale (silently, in non-ANSI mode)
    ratio = (
        F.col("n_slots").cast("double")
        * F.col("c_ab")
        / (F.col("c_a").cast("double") * F.col("c_b"))
    )
    return (
        co.filter(F.col("c_ab") >= min_count)
        .join(left, "a")
        .join(right, "b")
        .crossJoin(F.broadcast(n))
        .select(
            "a",
            "b",
            F.col("c_ab").cast("long").alias("c_ab"),
            F.round(F.log(ratio), 6).alias("pmi"),
        )
    )


def count_min_frequencies(
    df: DataFrame,
    depth: int = 4,
    width: int = 256,
    min_count: int = 50,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Count-min sketch over the corpus token stream, probed for every
    token whose TRUE frequency is >= ``min_count``: returns
    ``(term, cnt, est_cnt)`` where ``est_cnt`` is the CMS estimate
    (min over ``depth`` salted-md5 hash rows of the bucket counts) and
    ``cnt`` the exact count. The one-sided error guarantee —
    ``est_cnt >= cnt`` always, ``est_cnt <= cnt + εN`` w.h.p. — is what a
    pipeline monitors when swapping exact vocabulary counts for the
    sketch at corpus scale.

    Shape at 100 TB: the sketch is FIXED-SIZE mergeable state — the
    (h, bucket) count table is depth·width rows no matter the corpus
    (map-side partial aggregation does the collapse), so it broadcasts
    back onto the probe set for free. Salted md5 keeps the hash family
    engine-portable (the hashing_vectorizer discipline). The exact-count
    probe pass exists for the paired oracle/monitoring contract; a pure
    production estimate path skips it and reads the sketch alone.
    """
    if depth < 1 or width < 1:
        raise ValueError(f"invalid sketch shape depth={depth} width={width}")
    tok = df.select(F.explode(tokens(text_col)).alias("term")).filter(
        F.col("term") != ""
    )

    from weather_api_automate_etl_spark.functions.core import salted_hash64

    def bucket_structs(term: Column) -> Column:
        return F.array(
            *[
                F.struct(
                    F.lit(i).alias("h"),
                    (salted_hash64(term, f"{i}:") % width).cast("int").alias("b"),
                )
                for i in range(depth)
            ]
        )

    cms = (
        tok.select(F.explode(bucket_structs(F.col("term"))).alias("hb"))
        .select("hb.h", "hb.b")
        .groupBy("h", "b")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    probes = (
        tok.groupBy("term")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .filter(F.col("cnt") >= min_count)
    )
    return (
        probes.select(
            "term", "cnt", F.explode(bucket_structs(F.col("term"))).alias("hb")
        )
        .select("term", "cnt", "hb.h", "hb.b")
        .join(F.broadcast(cms), ["h", "b"])
        .groupBy("term", "cnt")
        .agg(F.min("c").alias("est_cnt"))
        .select("term", "cnt", "est_cnt")
    )


def bigram_logprob(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document average bigram log-probability under an add-one-
    smoothed corpus-self-trained bigram LM:
    ``avg over doc bigrams of ln((c(a,b)+1)/(c(a)+V))`` with ``c(a)`` the
    corpus unigram count and ``V`` the vocabulary size — the
    second-order fluency signal (unigram_logprob's conditional sibling):
    documents whose CONSECUTIVE-token patterns are corpus-typical score
    high even when their unigram mix is unusual, and shuffled-token spam
    scores low even when its unigrams are common.

    Returns every input row: ``(id_col, n_bigrams, avg_logprob)`` with a
    NULL score for docs with fewer than two tokens.

    Shape at scale: bigram formation is a map-only zip_with of two
    shifted token-array slices (no position self-join); the bigram and
    unigram count tables are vocabulary²-/vocabulary-sized and joined
    KEYED (never broadcast — the unigram_logprob discipline); V is a
    1-row broadcast. Two scans of the corpus total (model pass + score
    pass), the irreducible cost of self-training.
    """
    ts = F.filter(tokens(text_col), lambda t: t != "")
    m = F.greatest(F.size(ts) - F.lit(1), F.lit(0))
    bigrams = F.zip_with(
        F.slice(ts, 1, m),
        F.slice(ts, 2, m),
        lambda a, b: F.struct(a.alias("a"), b.alias("b")),
    )
    doc_bg = df.select(
        F.col(id_col), F.explode(bigrams).alias("p")
    ).select(id_col, "p.a", "p.b")
    cab = doc_bg.groupBy("a", "b").agg(F.count(F.lit(1)).alias("c_ab"))
    ug = (
        df.select(F.explode(ts).alias("a"))
        .groupBy("a")
        .agg(F.count(F.lit(1)).alias("c_a"))
    )
    v = ug.agg(F.count(F.lit(1)).alias("v"))
    per = (
        doc_bg.join(cab, ["a", "b"])
        .join(ug, "a")
        .crossJoin(F.broadcast(v))
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.round(
                F.avg(
                    F.log(
                        (F.col("c_ab") + F.lit(1.0))
                        / (F.col("c_a") + F.col("v"))
                    )
                ),
                6,
            ).alias("avg_logprob"),
        )
    )
    return (
        df.select(id_col)
        .join(per, id_col, "left")
        .select(
            id_col,
            F.coalesce(F.col("n_bigrams"), F.lit(0)).cast("long").alias(
                "n_bigrams"
            ),
            "avg_logprob",
        )
    )


def zipf_fit(
    df: DataFrame,
    group_col: str,
    text_col: str = "text",
) -> DataFrame:
    """Zipf-law fit of each group's token frequency spectrum: OLS of
    ln(freq) on ln(rank) over the group's vocabulary — natural language
    sits near slope −1; templated/boilerplate strata flatten (few
    dominant tokens) and random-token spam steepens toward 0 from a
    near-uniform spectrum. The corpus-health screen run per source
    before mixing. One token-count aggregate (vocabulary-sized), a
    group-partitioned rank window over the COUNT table (never the token
    stream), then stats.ols_from_moments (relative variance floor —
    degenerate spectra yield NULL; round0 on the aggregated near-zero-able
    outputs kills the −0.0 hash hazard). Groups with a single distinct
    token yield NULL slope."""
    from weather_api_automate_etl_spark.operators.stats import (
        ols_from_moments,
        round0,
    )

    tok = df.select(
        F.col(group_col), F.explode(tokens(text_col)).alias("term")
    ).filter(F.col("term") != "")
    counts = tok.groupBy(group_col, "term").agg(
        F.count(F.lit(1)).alias("freq")
    )
    w = Window.partitionBy(group_col).orderBy(
        F.col("freq").desc(), F.col("term").asc()
    )
    pts = counts.select(
        group_col,
        F.log(F.row_number().over(w).cast("double")).alias("x"),
        F.log(F.col("freq").cast("double")).alias("y"),
    )
    m = pts.groupBy(group_col).agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    slope, intercept, _, r2 = ols_from_moments(
        F.col("n"), F.col("sx"), F.col("sy"),
        F.col("sxy"), F.col("sxx"), F.col("syy"),
    )
    return m.select(
        group_col,
        F.col("n").cast("long").alias("n_vocab"),
        round0(slope, 6).alias("slope"),
        round0(intercept, 6).alias("intercept"),
        F.round(r2, 6).alias("r2"),
    )


def bpe_pair_counts(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Adjacent-character pair frequencies over whitespace tokens — the
    inner statistic of BPE tokenizer training (each training round merges
    the most frequent pair). Pure array expressions: token split, per-token
    2-char windows via substring-transform, ONE explode, one count
    aggregate — corpus-linear, no joins."""
    toks = F.explode(tokens(text_col)).alias("tok")
    pairs = F.expr(
        "transform(sequence(1, greatest(length(tok) - 1, 0)), i -> substring(tok, i, 2))"
    )
    return (
        df.select(F.col(id_col), toks)
        .filter(F.length("tok") >= 2)
        .select(F.explode(pairs).alias("pair"))
        .groupBy("pair")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def bpe_merge_once(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    placeholder: str = "",
    top_n: int = 10,
) -> DataFrame:
    """ONE BPE training round, end to end: count adjacent-char pairs, pick
    the most frequent (ties to the lexicographically smallest pair — the
    deterministic rule), apply the merge by substituting a fresh symbol,
    then return the top-``top_n`` pair counts of the MERGED corpus with
    the round-1 winner attached.

    The winning pair is a 1-row broadcast joined onto the token stream
    (never a driver constant baked into the plan, so the lineage is fully
    declarative and the merge loop can be unrolled without recompiling);
    ``replace`` applies it corpus-wide in one map pass. The sequential
    left-to-right merge order of reference BPE and this simultaneous
    non-overlapping substitution agree except on self-overlapping pairs
    ('aa' in 'aaa') — the documented, deterministic difference."""
    if not placeholder:
        raise ValueError(
            "placeholder must be non-empty: replacing the winning pair "
            "with '' DELETES it, splicing its neighbors into pairs that "
            "never existed in the corpus"
        )
    top = (
        bpe_pair_counts(df, id_col, text_col)
        .orderBy(F.desc("n"), F.asc("pair"))
        .limit(1)
        .select(F.col("pair").alias("merge_pair"))
    )
    toks = F.explode(tokens(text_col)).alias("tok")
    merged = (
        df.select(toks)
        .crossJoin(F.broadcast(top))
        .select(
            F.replace(
                F.col("tok"), F.col("merge_pair"), F.lit(placeholder)
            ).alias("tok"),
            "merge_pair",
        )
    )
    pairs = F.expr(
        "transform(sequence(1, greatest(length(tok) - 1, 0)), i -> substring(tok, i, 2))"
    )
    counted = (
        merged.filter(F.length("tok") >= 2)
        .select(F.explode(pairs).alias("pair"), "merge_pair")
        .groupBy("pair", "merge_pair")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w = Window.orderBy(F.desc("n"), F.asc("pair"))
    return (
        counted.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= top_n)
        .select("merge_pair", "pair", "n", F.col("rk").cast("int").alias("rk"))
    )


def bpe_merge_rounds(
    df: DataFrame,
    n_rounds: int,
    placeholders: str,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """The BPE tokenizer-training LOOP: ``n_rounds`` merge rounds, each
    picking the corpus's most frequent adjacent pair (ties to the
    lexicographically smallest) and substituting the round's fresh symbol
    (``placeholders[r]``) corpus-wide before the next count. Returns the
    learned merge table ``(round, merge_pair)`` — the artifact a tokenizer
    trainer actually persists.

    Declarative unrolling (the bpe_merge_once discipline at depth): each
    round is one count aggregate plus a 1-row broadcast of the winner
    joined back onto the token stream — n_rounds aggregates total, no
    driver-side corpus state, every winner stays a column until the end
    so Catalyst sees ONE lineage."""
    if n_rounds < 1:
        raise ValueError(f"bpe_merge_rounds needs n_rounds >= 1, got {n_rounds}")
    if len(placeholders) < n_rounds or (
        len(set(placeholders[:n_rounds])) != n_rounds
    ):
        raise ValueError("need one DISTINCT placeholder symbol per round")
    pairs_of = (
        "transform(sequence(1, greatest(length(tok) - 1, 0)), i -> substring(tok, i, 2))"
    )
    toks = df.select(F.explode(tokens(text_col)).alias("tok"))
    winners = []
    for r in range(n_rounds):
        counted = (
            toks.filter(F.length("tok") >= 2)
            .select(F.explode(F.expr(pairs_of)).alias("pair"))
            .groupBy("pair")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        top = (
            counted.orderBy(F.desc("n"), F.asc("pair"))
            .limit(1)
            .select(F.col("pair").alias(f"__w{r}"))
        )
        winners.append(top)
        toks = toks.crossJoin(F.broadcast(top)).select(
            F.replace(
                F.col("tok"), F.col(f"__w{r}"), F.lit(placeholders[r])
            ).alias("tok")
        )
    table = winners[0].select(
        F.lit(0).cast("int").alias("round"),
        F.col("__w0").alias("merge_pair"),
    )
    for r in range(1, n_rounds):
        table = table.unionByName(
            winners[r].select(
                F.lit(r).cast("int").alias("round"),
                F.col(f"__w{r}").alias("merge_pair"),
            )
        )
    return table


def bpe_encode(
    df: DataFrame,
    merges: DataFrame,
    placeholders: str,
    n_rounds: int | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """The INFERENCE side of BPE: apply a learned merge table
    (``bpe_merge_rounds``' artifact) to encode every document, emitting
    the per-doc tokenizer accounting a data pipeline actually consumes —
    token count, raw character count, encoded symbol count, and the
    compression ratio that length-based cost models and packing
    estimators run on.

    The merge table stays a DATAFRAME end to end: it pivots to a single
    broadcast row (one column per round) and the per-token substitution
    chain applies inside one array-transform expression — corpus-linear,
    no joins beyond the 1-row broadcast, no Python, and the lineage is
    fully declarative so training and encoding compose into one plan.
    Merges apply in round order, exactly as learned (round r's pair may
    contain round <r placeholders)."""
    n = len(placeholders) if n_rounds is None else n_rounds
    if n < 1:
        raise ValueError("bpe_encode needs at least one merge round")
    if len(placeholders) < n:
        raise ValueError("need one placeholder symbol per round")
    row = merges.groupBy().agg(
        *[
            F.max(
                F.when(F.col("round") == r, F.col("merge_pair"))
            ).alias(f"__w{r}")
            for r in range(n)
        ]
    )

    def encode(tok: F.Column) -> F.Column:
        out = tok
        for r in range(n):
            # a round the table never learned pivots to NULL, and
            # F.replace(out, NULL) would NULL every document's
            # accounting silently — raise IN-PLAN instead (an eager
            # head() here would re-execute the training aggregates
            # when composed with bpe_merge_rounds)
            w = F.when(F.col(f"__w{r}").isNotNull(), F.col(f"__w{r}")).otherwise(
                F.raise_error(
                    F.lit(
                        f"merge table carries no round {r}: pass "
                        "n_rounds=<table size>"
                    )
                ).cast("string")
            )
            out = F.replace(out, w, F.lit(placeholders[r]))
        return out

    clen = lambda arr: F.aggregate(  # noqa: E731
        F.transform(arr, F.length), F.lit(0).cast("long"), lambda a, x: a + x
    )
    return (
        # drop the '' pseudo-token of empty docs — an empty doc is 0
        # tokens in the accounting, not 1 (the text_profile convention)
        df.select(
            F.col(id_col),
            F.filter(tokens(text_col), lambda t: t != "").alias("__t"),
        )
        .crossJoin(F.broadcast(row))
        .select(
            F.col(id_col),
            F.size("__t").cast("long").alias("n_tokens"),
            clen(F.col("__t")).alias("n_chars"),
            clen(F.transform(F.col("__t"), encode)).alias("n_symbols"),
        )
        .withColumn(
            "ratio",
            F.when(
                F.col("n_chars") > 0,
                F.round(F.col("n_symbols") / F.col("n_chars"), 6),
            ).otherwise(F.lit(1.0)),
        )
    )


def readability_scores(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Flesch reading-ease per document — the classic complexity screen a
    quality-gating pipeline runs beside length/stopword heuristics
    (Flesch 1948: 206.835 − 1.015·(words/sentences) −
    84.6·(syllables/words)). Sentences = non-blank segments after
    splitting on [.!?]+ runs, floored at 1 (a fragment with no terminal
    punctuation is one sentence, not a division by zero); syllables =
    vowel-group count per token ([aeiouy]+ runs — the standard cheap
    approximation; hyphenation dictionaries are a library problem, the
    ~converging heuristic is the pipeline one).

    Pure codegen expression work — tokenize, two regexes, one array
    fold — zero shuffles, zero Python; the regex subset ([aeiouy]+,
    [.!?]+) has identical semantics in Java regex and RE2, the
    engine-parity discipline from privacy.py. Empty/whitespace docs get
    NULL flesch (no words to score). Returns (id, n_words, n_sents,
    n_syllables, flesch) with flesch rounded to 4."""
    toks = F.filter(tokens(text_col), lambda t: t != "")
    n_words = F.size(toks)
    n_sents = F.greatest(
        F.size(
            F.filter(
                F.split(F.col(text_col), r"[.!?]+"),
                lambda s: F.trim(s) != "",
            )
        ),
        F.lit(1),
    )
    n_syll = F.aggregate(
        F.transform(toks, lambda t: F.regexp_count(t, F.lit("[aeiouy]+"))),
        F.lit(0),
        lambda acc, c: acc + c,
    )
    flesch = F.when(
        n_words > 0,
        F.lit(206.835)
        - F.lit(1.015) * (n_words.cast("double") / n_sents.cast("double"))
        - F.lit(84.6) * (n_syll.cast("double") / n_words.cast("double")),
    )
    return df.select(
        F.col(id_col),
        n_words.cast("long").alias("n_words"),
        n_sents.cast("long").alias("n_sents"),
        n_syll.cast("long").alias("n_syllables"),
        F.round(flesch, 4).alias("flesch"),
    )


def stupid_backoff_logprob(
    df: DataFrame,
    train_filter: Column,
    id_col: str = "doc_id",
    text_col: str = "text",
    alpha: float = 0.4,
) -> DataFrame:
    """Held-out bigram scoring under Stupid Backoff (Brants et al.,
    EMNLP 2007 — the web-scale LM smoothing that skips normalization):
    train the count tables on the ``train_filter`` slice, score the
    REST, and when a scored bigram was never seen in training, back off:

        S(b|a) = c(a,b)/c(a)        if c(a,b) > 0
               = α · c(b)/N          else, if c(b) > 0
               = α² / N              else (OOV continuation)

    The backoff branch is the point — ``bigram_logprob`` self-trains, so
    every scored bigram trivially exists; a held-out split is the shape
    that actually measures generalization (train/validation perplexity,
    the data-quality signal mixture tuning reads). Per scored doc:
    average ln S over its bigrams, NULL when it has fewer than two
    tokens.

    Scale shape identical to bigram_logprob: map-only zip_with bigrams,
    vocabulary-keyed LEFT joins against the train count tables (absence
    IS the backoff signal — never broadcast), N as a 1-row broadcast.
    Returns (id_col, n_bigrams, n_backoff, avg_logprob) — n_backoff
    counts how often the bigram branch missed, the held-out-coverage
    diagnostic."""
    ts = F.filter(tokens(text_col), lambda t: t != "")
    m = F.greatest(F.size(ts) - F.lit(1), F.lit(0))
    bigrams = F.zip_with(
        F.slice(ts, 1, m),
        F.slice(ts, 2, m),
        lambda a, b: F.struct(a.alias("a"), b.alias("b")),
    )
    train = df.filter(train_filter)
    held = df.filter(~train_filter)
    cab = (
        train.select(F.explode(bigrams).alias("p"))
        .select("p.a", "p.b")
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("c_ab"))
    )
    ug = (
        train.select(F.explode(ts).alias("a"))
        .groupBy("a")
        .agg(F.count(F.lit(1)).alias("c_a"))
    )
    n_tok = ug.agg(F.sum("c_a").cast("double").alias("n_train"))
    doc_bg = held.select(F.col(id_col), F.explode(bigrams).alias("p")).select(
        id_col, "p.a", "p.b"
    )
    ub = ug.select(F.col("a").alias("b"), F.col("c_a").alias("c_b"))
    s = F.when(
        F.col("c_ab").isNotNull(),
        F.col("c_ab") / F.col("c_a"),
    ).otherwise(
        F.when(
            F.col("c_b").isNotNull(),
            F.lit(alpha) * F.col("c_b") / F.col("n_train"),
        ).otherwise(F.lit(alpha * alpha) / F.col("n_train"))
    )
    per = (
        doc_bg.join(cab, ["a", "b"], "left")
        .join(ug, "a", "left")
        .join(ub, "b", "left")
        .crossJoin(F.broadcast(n_tok))
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.sum(
                F.when(F.col("c_ab").isNull(), 1).otherwise(0)
            ).alias("n_backoff"),
            F.round(F.avg(F.log(s)), 6).alias("avg_logprob"),
        )
    )
    return (
        held.select(id_col)
        .join(per, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_bigrams", F.lit(0)).cast("long").alias("n_bigrams"),
            F.coalesce("n_backoff", F.lit(0)).cast("long").alias("n_backoff"),
            "avg_logprob",
        )
    )


def kneser_ney_bigram(
    df: DataFrame,
    text_col: str = "text",
    discount: float = 0.75,
) -> DataFrame:
    """Interpolated Kneser-Ney bigram probabilities (Kneser & Ney, ICASSP
    1995; the Chen & Goodman 1998 interpolated form) for every bigram
    type observed in the corpus:

        P_KN(b|a) = (c(a,b) - D) / c(a)  +  λ(a) · P_cont(b)
        λ(a)      = D · N1+(a,·) / c(a)
        P_cont(b) = N1+(·,b) / N1+(·,·)

    where ``N1+(a,·)`` is the number of distinct continuations of history
    ``a``, ``N1+(·,b)`` the number of distinct histories preceding ``b``
    (the "how many contexts has this word completed" count that makes KN
    beat raw-frequency backoff on collocation-locked words like
    "Francisco"), and ``N1+(·,·)`` the total bigram-type count. For
    observed bigrams ``c(a,b) ≥ 1 > D`` so the max(·,0) clamp is inert —
    the emitted table IS the textbook smoothed model, no OOV floor needed
    (held-out scoring with a backoff floor is ``stupid_backoff_logprob``'s
    job; this is its normalized, discount-mass-conserving sibling:
    Σ_b P_KN(b|a) = 1 over the FULL vocabulary — the emitted table holds
    only OBSERVED bigrams, whose rows sum to 1 minus the interpolated
    mass assigned to unobserved continuations, λ(a)·Σ_{unseen b}
    P_cont(b)).

    Scale shape: map-only ``zip_with`` bigram extraction (no explode of
    token positions), one (a,b)-keyed count shuffle, two O(|bigram
    types|) rollups re-joined on their token keys, and a single 1-row
    broadcast for the global type count. Count tables are never
    collected or broadcast — vocabulary size does not bound this.

    Returns ``(a, b, c_ab, p_kn)`` with ``p_kn`` rounded to 6 places.
    """
    if not (0.0 < discount < 1.0):
        raise ValueError(f"discount must be in (0, 1), got {discount}")
    ts = F.filter(tokens(text_col), lambda t: t != "")
    m = F.greatest(F.size(ts) - F.lit(1), F.lit(0))
    bigrams = F.zip_with(
        F.slice(ts, 1, m),
        F.slice(ts, 2, m),
        lambda a, b: F.struct(a.alias("a"), b.alias("b")),
    )
    cab = (
        df.select(F.explode(bigrams).alias("p"))
        .select("p.a", "p.b")
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("c_ab"))
    )
    # history totals and distinct-continuation counts, one rollup of cab
    hist = cab.groupBy("a").agg(
        F.sum("c_ab").cast("double").alias("c_a"),
        F.count(F.lit(1)).cast("double").alias("n1p_fwd"),
    )
    # continuation counts: in how many distinct contexts does b complete?
    cont = cab.groupBy("b").agg(
        F.count(F.lit(1)).cast("double").alias("n1p_rev")
    )
    total = cab.agg(F.count(F.lit(1)).cast("double").alias("n_types"))
    d = F.lit(float(discount))
    p_kn = (F.col("c_ab") - d) / F.col("c_a") + (
        d * F.col("n1p_fwd") / F.col("c_a")
    ) * (F.col("n1p_rev") / F.col("n_types"))
    return (
        cab.join(hist, "a")
        .join(cont, "b")
        .crossJoin(F.broadcast(total))
        .select(
            "a",
            "b",
            F.col("c_ab").cast("long").alias("c_ab"),
            F.round(p_kn, 6).alias("p_kn"),
        )
    )


def textrank_keywords(
    df: DataFrame,
    text_col: str = "text",
    min_len: int = 4,
    iterations: int = 2,
    damping: float = 0.85,
    top: int = 20,
) -> DataFrame:
    """TextRank keyword extraction (Mihalcea & Tarau, EMNLP 2004):
    build the word co-occurrence graph — an undirected edge per DISTINCT
    adjacent pair of surviving words (length ≥ ``min_len``, purely
    alphabetic: the paper's syntactic-filter stand-in) — and score
    words with :func:`graph.pagerank`'s fixed-round power iteration.
    The corpus-level keyword signal a pipeline materializes for topic
    labeling, dedup explanation and retrieval boosting, built entirely
    from operators this engine already has: tokenization → pair
    extraction → PageRank.

    Scale shape: pair extraction is the map-only ``zip_with`` bigram
    shape plus a distinct (one shuffle on the pair key); the graph is
    VOCABULARY-sized, so the power iteration's per-round join+agg runs
    on |V| + |E| rows regardless of corpus row count — the whole corpus
    is only ever touched by the one tokenizing scan. Top-``top`` is a
    TakeOrdered cut on the ROUNDED, N-normalized rank with a word
    tie-break (engine-exact cut keys).

    Returns ``(word, rank_n)`` — ``top`` rows, rank × |V| rounded to 6.
    """
    from weather_api_automate_etl_spark.operators import graph

    ts = F.filter(
        tokens(text_col),
        lambda w: (F.length(w) >= min_len) & w.rlike("^[a-z]+$"),
    )
    m = F.greatest(F.size(ts) - F.lit(1), F.lit(0))
    adj = F.zip_with(
        F.slice(ts, 1, m),
        F.slice(ts, 2, m),
        lambda a, b: F.struct(
            F.least(a, b).alias("w1"), F.greatest(a, b).alias("w2")
        ),
    )
    pairs = (
        df.select(F.explode(adj).alias("p"))
        .select("p.w1", "p.w2")
        .filter(F.col("w1") != F.col("w2"))
        .distinct()
    )
    nodes = (
        df.select(F.explode(ts).alias("word")).distinct()
    )
    # count ONCE and pass n: pagerank would otherwise run its own
    # nodes.count(), tokenizing the corpus a second time
    n = nodes.count()
    ranked = graph.pagerank(
        nodes,
        pairs,
        id_a="w1",
        id_b="w2",
        node_id="word",
        iterations=iterations,
        damping=damping,
        n=n,
    )
    return (
        ranked.select(
            "word", F.round(F.col("rank") * float(n), 6).alias("rank_n")
        )
        .orderBy(F.desc("rank_n"), F.asc("word"))
        .limit(top)
    )


def good_turing_counts(
    df: DataFrame,
    text_col: str,
    max_r: int = 10,
    shingle_k: int = 1,
) -> DataFrame:
    """Good-Turing frequency re-estimation (Good 1953; the smoothing
    behind Katz backoff, and the classical complement to this module's
    Kneser-Ney): from the frequency-of-frequencies table S(r) = number
    of word types seen exactly r times, the adjusted count is
    r* = (r+1)·S(r+1)/S(r), and the probability mass reserved for
    UNSEEN types is S(1)/N — the leave-one-out estimate every
    vocabulary-coverage plan (tokenizer sizing, OOV budgeting) starts
    from.

    Shape: token counts (one term-keyed aggregate, map-side combine) →
    frequency-of-frequencies (an aggregate over the vocabulary-sized
    count table) → a self-join of the tiny S(r) table on r+1 and one
    window total. Everything after the first aggregate is
    vocabulary-of-counts-sized (≪ vocabulary ≪ corpus). All counts are
    exact BIGINTs; only r* and the masses are divisions (rounded
    to 6). Returns one row per r ∈ [1, max_r] present in the corpus:
    ``(r, s_r, s_r_next, r_star, unseen_mass)`` — r* is NULL where
    S(r+1) = 0 (the classical estimator is undefined there; smoothed
    variants regress S, out of scope), unseen_mass rides every row.
    """
    if max_r < 1:
        raise ValueError(f"max_r must be >= 1, got {max_r}")
    if shingle_k < 1:
        raise ValueError(f"shingle_k must be >= 1, got {shingle_k}")
    # the "type" is a word for shingle_k=1, else a k-word shingle —
    # shingles are what give a synthetic-vocabulary fixture a realistic
    # Zipf tail (S(1) ≫ S(2) ≫ ...); docs shorter than k contribute none
    from weather_api_automate_etl_spark.functions.text import word_shingles

    unit = (
        tokens(text_col)
        if shingle_k == 1
        else word_shingles(tokens(text_col), shingle_k)
    )
    tok = df.select(F.explode(unit).alias("__t")).filter(F.col("__t") != "")
    counts = tok.groupBy("__t").agg(F.count(F.lit(1)).alias("__r"))
    fof = counts.groupBy("__r").agg(
        F.count(F.lit(1)).cast("long").alias("__s")
    )
    tw = Window.partitionBy()
    with_tot = fof.select(
        "__r",
        "__s",
        F.sum(F.col("__r") * F.col("__s")).over(tw).alias("__N"),
        F.sum(F.when(F.col("__r") == 1, F.col("__s"))).over(tw).alias("__s1"),
    )
    nxt = fof.select(
        (F.col("__r") - 1).alias("__r"), F.col("__s").alias("__s_next")
    )
    out = (
        with_tot.filter(F.col("__r") <= max_r)
        .join(nxt, "__r", "left")
    )
    return out.select(
        F.col("__r").cast("long").alias("r"),
        F.col("__s").alias("s_r"),
        F.coalesce(F.col("__s_next"), F.lit(0)).cast("long").alias("s_r_next"),
        F.round(
            (F.col("__r") + 1)
            * F.col("__s_next").cast("double")
            / F.col("__s"),
            6,
        ).alias("r_star"),
        F.round(
            F.coalesce(F.col("__s1"), F.lit(0))
            / F.col("__N").cast("double"),
            6,
        ).alias("unseen_mass"),
    )


def heaps_law(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n_buckets: int = 10,
) -> DataFrame:
    """Heaps'-law vocabulary-growth curve V(n) ≈ K·n^β over ordered
    corpus prefixes — the tokenizer-sizing / OOV-budget companion to
    ``good_turing_counts``: how fast does the vocabulary keep growing
    as the corpus grows (β ≈ 0.4-0.6 for natural text; a flat curve
    means a closed synthetic vocabulary, a β near 1 means noise).

    Docs split into ``n_buckets`` ordered prefixes by RANGE over the id
    domain — bucket = (id − min)·k div (max − min + 1), exact BIGINT
    arithmetic off two broadcast scalar aggregates — so there is NO
    global sort/ntile over the doc relation (the round-9 finding); the
    only windows left run over the ≤ k-row curve. (Skewed id domain:
    swap the span for approx-quantile boundaries.) Each token's FIRST
    bucket is a min-aggregate; β comes from the shared moment-OLS over
    the bucket points, with degenerate points (cum_tokens or vocab = 0)
    filtered before the fit so ln() NULLs can't skew the moments
    (round-9 advice). Returns one row per non-degenerate bucket
    ``(bucket, cum_tokens, vocab, beta, k_factor)``, rounded to 6.
    """
    if n_buckets < 2:
        raise ValueError(f"heaps_law needs n_buckets >= 2, got {n_buckets}")
    bounds = df.agg(
        F.min(F.col(id_col)).cast("long").alias("__lo"),
        F.max(F.col(id_col)).cast("long").alias("__hi"),
    )
    bucketed = df.join(F.broadcast(bounds)).select(
        (
            F.least(
                # SQL `div`: exact BIGINT division (a float floor() would
                # wobble once (id − lo)·k crosses 2^53)
                F.expr(
                    f"(cast({id_col} as bigint) - __lo) * {n_buckets}"
                    " div (__hi - __lo + 1)"
                ),
                F.lit(n_buckets - 1).cast("long"),
            ).cast("int")
            + 1
        ).alias("__b"),
        F.col(text_col).alias("__txt"),
    )
    toks = bucketed.select(
        "__b", F.explode(tokens("__txt")).alias("__t")
    ).filter(F.col("__t") != "")
    per_bucket = toks.groupBy("__b").agg(
        F.count(F.lit(1)).alias("__ntok")
    )
    first_seen = toks.groupBy("__t").agg(F.min("__b").alias("__fb"))
    new_types = first_seen.groupBy("__fb").agg(
        F.count(F.lit(1)).alias("__nnew")
    )
    cw = Window.orderBy("__b").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    curve = (
        per_bucket.join(
            new_types.withColumnRenamed("__fb", "__b"), "__b", "left"
        )
        .select(
            "__b",
            F.sum("__ntok").over(cw).alias("cum_tokens"),
            F.sum(F.coalesce(F.col("__nnew"), F.lit(0)))
            .over(cw)
            .alias("vocab"),
        )
        # degenerate prefixes (all-empty leading docs) would feed NULL
        # ln() terms that F.sum skips while n counts them — drop them
        # from the fit AND the output (round-9 advice)
        .filter((F.col("cum_tokens") > 0) & (F.col("vocab") > 0))
    )
    tw = Window.partitionBy()
    lx = F.log(F.col("cum_tokens").cast("double"))
    ly = F.log(F.col("vocab").cast("double"))
    n = F.count(F.lit(1)).over(tw).cast("double")
    # the SHARED guarded moment-OLS (stats.ols_from_moments): a curve of
    # numerically near-identical ln(cum_tokens) yields NULL beta via the
    # relative variance floor, never cancellation garbage, and round0
    # kills the aggregated -0.0 hash hazard (round-10 review; zipf_fit
    # already followed this discipline)
    from weather_api_automate_etl_spark.operators.stats import (
        ols_from_moments,
        round0,
    )

    beta, intercept, _, _ = ols_from_moments(
        n,
        F.sum(lx).over(tw),
        F.sum(ly).over(tw),
        F.sum(lx * ly).over(tw),
        F.sum(lx * lx).over(tw),
        F.sum(ly * ly).over(tw),
    )
    return curve.select(
        F.col("__b").cast("int").alias("bucket"),
        F.col("cum_tokens").cast("long").alias("cum_tokens"),
        F.col("vocab").cast("long").alias("vocab"),
        round0(beta, 6).alias("beta"),
        round0(F.exp(intercept), 6).alias("k_factor"),
    )
