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


def l_diversity_violations(
    df: DataFrame, quasi_cols: list[str], sensitive_col: str, l: int
) -> DataFrame:
    """l-diversity audit (Machanavajjhala et al., ICDE 2006) — the
    companion gate to ``k_anonymity_violations`` above: a k-anonymous
    class is still a leak when everyone in it SHARES the sensitive value
    (the "homogeneity attack" — the attacker needs no row, only the
    class). A release is (distinct) l-diverse when every
    quasi-identifier equivalence class contains at least ``l`` distinct
    sensitive values. Returns the VIOLATING classes with their size and
    distinct-sensitive count; empty certifies the release at level l.

    One hash aggregate with an exact ``count(distinct)`` per class —
    planned as partial-distinct on (quasi, sensitive) then (quasi), both
    shuffles keyed on the quasi columns, scan-rate at 100 TB. NULL
    sensitive values count as one value (a class of all-NULL sensitive
    is exactly as homogeneous as a class of all-'cancer')."""
    if l < 2:
        raise ValueError(f"l-diversity needs l >= 2, got {l}")
    return (
        df.groupBy(*quasi_cols)
        .agg(
            F.count(F.lit(1)).alias("class_size"),
            F.count_distinct(F.col(sensitive_col)).alias("n_sensitive"),
        )
        .filter(F.col("n_sensitive") < l)
    )


def dp_noisy_counts(
    df: DataFrame,
    group_cols: list[str],
    epsilon: float,
    seed: str = "dp",
) -> DataFrame:
    """epsilon-differentially-private release of group counts via the
    Laplace mechanism (Dwork et al., TCC 2006): count + Lap(1/eps), the
    count query's sensitivity being 1. The standard private-statistics
    release for corpus composition tables (per-source/per-language
    counts) whose exact values would expose individual membership.

    The noise is DETERMINISTIC given (group value, seed) — a keyed-hash
    PRNG, not ``rand()``: u in (0,1) comes from the top 52 bits of
    ``md5(group || seed)`` (a uniform already reproducible on any engine
    and any partitioning — the property the whole oracle framework rides
    on), and inverse-CDF sampling maps it to Laplace:

        u' = u - 1/2;  noise = -(1/eps) * sign(u') * ln(1 - 2*|u'|)

    Determinism is a FEATURE for a release pipeline: re-running the job
    republishes identical numbers instead of spending fresh budget per
    run (the "sticky noise" discipline of RAPPOR-style systems). The md5
    expression is codegen'd JVM work on the already-aggregated group
    rows — one hash aggregate, then metadata-scale scalar math. Returns
    (groups..., noisy_count) and deliberately NOT the exact count —
    a release that also keeps the true count has no DP guarantee left.
    """
    if epsilon <= 0:
        raise ValueError(f"dp_noisy_counts needs epsilon > 0, got {epsilon}")
    key = F.concat_ws(
        "", *[F.col(c).cast("string") for c in group_cols], F.lit(seed)
    )
    # top 13 hex chars = 52 bits -> exact in a double; u=0 would send
    # ln to -inf only at u' = +1/2, excluded because u < 1
    u = (
        F.conv(F.substring(F.md5(key), 1, 13), 16, 10).cast("double")
        / F.lit(float(1 << 52))
    )
    centered = u - F.lit(0.5)
    noise = (
        -F.lit(1.0 / epsilon)
        * F.signum(centered)
        * F.log(F.lit(1.0) - 2.0 * F.abs(centered))
    )
    return (
        df.groupBy(*group_cols)
        .agg(F.count(F.lit(1)).cast("double").alias("_n"))
        .select(
            *group_cols,
            F.round(F.col("_n") + noise, 6).alias("noisy_count"),
        )
    )


def t_closeness_violations(
    df: DataFrame,
    quasi_cols: list[str],
    sensitive_col: str,
    t: float,
) -> DataFrame:
    """t-closeness audit (Li, Li & Venkatasubramanian, ICDE 2007) — the
    third rung of the release-gate ladder after
    ``k_anonymity_violations`` and ``l_diversity_violations``: an
    l-diverse class still leaks when its sensitive-value DISTRIBUTION is
    skewed far from the global one (the "skewness attack" — 49 of 50
    values benign vs a global 1% rate is a 20× posterior update even
    though the class is 2-diverse). For a categorical sensitive
    attribute the distance is total variation:

        tvd(class) = ½ · Σ_s | p_class(s) − p_global(s) |

    and the release satisfies t-closeness when every quasi-identifier
    equivalence class has ``tvd ≤ t``. Returns the VIOLATING classes
    with size and rounded tvd; empty certifies the release at level t.

    Scale shape: one (quasi, sensitive) count aggregate, a quasi-keyed
    rollup for class totals, a sensitive-keyed rollup for the global
    distribution (|sensitive domain| rows — joined back on the sensitive
    key, broadcast by the planner when tiny, never collected), then one
    final quasi-keyed sum. Absent (class, value) cells are handled
    WITHOUT densifying the class × domain grid: because both p_class and
    p_global sum to 1, ½ Σ_s |p_c(s) − p_g(s)| = Σ_s max(p_c(s) − p_g(s),
    0), and absent cells (p_c = 0) can never win that max — so summing
    the positive excess over PRESENT cells alone is exact. NULL
    sensitive values form their own category,
    consistent with the l-diversity gate."""
    if not (0.0 < t < 1.0):
        raise ValueError(f"t-closeness needs t in (0, 1), got {t}")
    cells = df.groupBy(
        *quasi_cols, F.col(sensitive_col).alias("__s")
    ).agg(F.count(F.lit(1)).alias("__n"))
    klass = cells.groupBy(*quasi_cols).agg(
        F.sum("__n").alias("__class_n")
    )
    glob = cells.groupBy(F.col("__s").alias("__gs")).agg(
        F.sum("__n").alias("__s_n")
    )
    total = glob.agg(F.sum("__s_n").alias("__total_n"))
    tvd = (
        cells.join(klass, quasi_cols)
        # null-safe: a NULL sensitive value is its own category and must
        # still find its global mass
        .join(glob, F.col("__s").eqNullSafe(F.col("__gs")))
        .crossJoin(F.broadcast(total))
        .select(
            *quasi_cols,
            F.col("__class_n"),
            F.greatest(
                F.col("__n") / F.col("__class_n")
                - F.col("__s_n") / F.col("__total_n"),
                F.lit(0.0),
            ).alias("__excess"),
        )
        .groupBy(*quasi_cols, "__class_n")
        .agg(F.round(F.sum("__excess"), 6).alias("tvd"))
    )
    return tvd.filter(F.col("tvd") > t).select(
        *quasi_cols,
        F.col("__class_n").cast("long").alias("class_size"),
        "tvd",
    )
