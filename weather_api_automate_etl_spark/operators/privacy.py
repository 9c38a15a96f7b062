"""PII detection and redaction for training-corpus preparation.

Before text reaches a training corpus, contact strings (emails, phone
numbers, IP addresses, card-shaped numbers) must be found and masked.
This is pure per-row regex work — JVM-side ``regexp_replace`` /
``regexp_count`` expressions inside whole-stage codegen, zero shuffles,
embarrassingly parallel at any corpus size — exactly the shape that stays
cheap at 100 TB.

The patterns deliberately stick to the regex subset with identical
semantics in Java regex (Spark) and RE2 (DuckDB, used by the oracle):
character classes, bounded repetition, ``\\b`` word boundaries,
non-capturing groups; no backreferences or lookaround. Rule ORDER is
load-bearing: card-shaped 16-digit runs must be masked before the phone
rule can eat a 7-digit suffix of them.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

#: (kind, pattern, replacement) — applied in order.
PII_RULES: tuple[tuple[str, str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    # 16-digit 4-4-4-4 (Visa/MC shape) OR 15-digit 4-6-5 (Amex shape),
    # separators optional — so CONTIGUOUS 15/16-digit runs are card-shaped
    # too. Leftmost-first alternation (same in Java regex and RE2) tries
    # the 16-digit branch first, so a 16-digit run is never half-eaten by
    # the Amex branch.
    (
        "card",
        r"\b(?:\d{4}[ -]?\d{4}[ -]?\d{4}[ -]?\d{4}|\d{4}[ -]?\d{6}[ -]?\d{5})\b",
        "<CARD>",
    ),
    # country code OPTIONAL: domestic forms (555-123-4567, (555) 123-4567)
    # are the common case and must not slip through unmasked. Boundaries
    # via the (\(...\)|\b...) alternation + trailing \b, NOT lookaround —
    # RE2 (the oracle engine) has none — so digit substrings of longer
    # separated numbers ('serial 9555-123-4567', '...-45678') don't match.
    (
        "phone",
        r"(?:\+?\d{1,2}[-. ])?(?:\(\d{3}\)|\b\d{3})[-. ]\d{3}[-. ]\d{4}\b",
        "<PHONE>",
    ),
    # CONTIGUOUS 10-digit runs (5551234567), optionally +1/1-prefixed —
    # the most common raw phone form; \b…\b keeps this off substrings of
    # longer digit runs (an 11-digit run not starting with 1, or 12+, has
    # no interior word boundary to anchor on). Runs AFTER the card rule
    # in mask order so 15/16-digit runs are already <CARD>; deliberate
    # over-redaction tradeoff: any bare 10-digit run is phone-shaped.
    # (the separator is only legal after an explicit 1-prefix — a bare
    # optional separator would let the match swallow the char before the
    # digit run)
    ("phone_contig", r"\+?\b1[-. ]?\d{10}\b|\b\d{10}\b", "<PHONE>"),
    ("ip", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
)


def redact_pii(df: DataFrame, text_col: str, keep: list[str] | None = None) -> DataFrame:
    """Mask every PII match in ``text_col`` and count matches per kind.

    Returns ``keep`` columns (default: all input columns except the text)
    plus ``redacted`` and one ``n_<kind>`` count per rule, and ``has_pii``.
    Counts are taken BEFORE masking (on the raw text) so an earlier rule's
    replacement token can never hide a later rule's match count; masking
    itself applies the rules in ``PII_RULES`` order.
    """
    kept = keep if keep is not None else [c for c in df.columns if c != text_col]
    raw: Column = F.col(text_col)
    masked = raw
    counts: list[Column] = []
    total: Column = F.lit(0)
    for kind, pattern, repl in PII_RULES:
        n = F.regexp_count(raw, F.lit(pattern)).cast("long")
        counts.append(n.alias(f"n_{kind}"))
        total = total + n
        masked = F.regexp_replace(masked, pattern, repl)
    return df.select(
        *kept,
        masked.alias("redacted"),
        *counts,
        (total > 0).alias("has_pii"),
    )


def k_anonymity_violations(
    df: DataFrame, quasi_cols: list[str], k: int
) -> DataFrame:
    """k-anonymity audit (Sweeney 2002): a released dataset is
    k-anonymous when every combination of quasi-identifier values is
    shared by at least ``k`` rows — smaller equivalence classes
    re-identify individuals by joining on the quasi-identifiers alone,
    which is exactly how training corpora leak PII without any direct
    identifier present. Returns the VIOLATING equivalence classes
    (quasi values + their class size), i.e. the groups a release must
    suppress or generalize; an empty result certifies the dataset at
    level k. NULL quasi values form their own class (they generalize
    together). One hash aggregate on the quasi columns — scan-rate at
    any size, the same shape as the reference's accepted_values test
    but keyed on the combination."""
    if k < 2:
        raise ValueError(f"k-anonymity needs k >= 2, got {k}")
    return (
        df.groupBy(*quasi_cols)
        .agg(F.count(F.lit(1)).alias("class_size"))
        .filter(F.col("class_size") < k)
    )
