"""Deterministic sampling operators for pipeline-reproducible subsets.

``df.sample()`` is seed-dependent *per partition layout*, so the same call
can yield different rows after a repartition — useless for training-data
pipelines that must be replayable. These operators derive the keep/drop
decision from a content hash of a stable key instead: the sample is a pure
function of the data, identical across engines, partitionings and reruns
(the same trick dbt/BigQuery users apply via ``farm_fingerprint(key)``).

Scale: a single projection + filter — no shuffle, fully pushdown-friendly,
embarrassingly parallel at any data size.
"""

from __future__ import annotations

from collections.abc import Mapping

from pyspark.sql import Column, DataFrame, Window, functions as F

# First 8 md5 hex chars as an integer, uniform on [0, 2^32).
_HASH_SPACE = float(2**32)


def _hash_bucket(key: Column) -> Column:
    """First 8 md5 hex chars of the key's string form as a long in
    [0, 2³²) — the ONE definition of the engine-parity-critical hash
    derivation (DuckDB twin: ``CAST(concat('0x', substr(md5(x),1,8)) AS
    UBIGINT)``)."""
    return F.conv(F.substring(F.md5(key.cast("string")), 1, 8), 16, 10).cast("long")


def hash_fraction(key: Column) -> Column:
    """Uniform [0,1) double derived from md5 of the key's string form.

    Engine-portable: DuckDB's ``CAST(concat('0x', substr(md5(x),1,8)) AS
    UBIGINT) / 2^32`` produces the identical value, so sampled sets match
    bit-for-bit across Spark and the oracle.
    """
    return _hash_bucket(key) / F.lit(_HASH_SPACE)


def deterministic_sample(df: DataFrame, key_col: str, rate: float) -> DataFrame:
    """Keep ~``rate`` of rows, chosen by content hash of ``key_col``."""
    return df.filter(hash_fraction(F.col(key_col)) < rate)


def weighted_reservoir(
    df: DataFrame,
    strata_col: str,
    weight_col: str,
    key_col: str,
    k: int,
) -> DataFrame:
    """Deterministic weighted reservoir sample (Efraimidis–Spirakis A-ES):
    per stratum, the ``k`` rows with the largest ln(u)/w, where u is the
    content-hash uniform of ``key_col`` — inclusion probability ∝ weight,
    and the sample is a pure function of the data (replayable across
    partitionings/engines, unlike seed-based sampling).

    u is shifted to (0, 1] ((bucket+1)/2³²) so ln() never sees 0 — Spark
    returns NULL for log(0) while other engines return -inf, which would
    silently diverge. One window shuffle on the stratum; top-k executes as
    WindowGroupLimit (map-side prune to k per stratum)."""
    from pyspark.sql.window import Window

    u = (_hash_bucket(F.col(key_col)) + F.lit(1)) / F.lit(_HASH_SPACE)
    wkey = F.log(u) / F.col(weight_col)
    win = Window.partitionBy(strata_col).orderBy(F.desc("__wkey"), F.asc(key_col))
    return (
        df.withColumn("__wkey", wkey)
        .withColumn("__rn", F.row_number().over(win))
        .filter(F.col("__rn") <= k)
        .drop("__wkey", "__rn")
    )


def rebalance_to_mixture(
    df: DataFrame,
    strata_col: str,
    target_shares: Mapping[str, float],
    key_col: str,
) -> DataFrame:
    """Downsample strata toward a TARGET mixture (the data-mixing step of a
    training pipeline: "make src A 10% of the corpus, src B 5%, ...").

    Per-stratum keep rate = min(1, target_share · N_total / n_stratum) —
    i.e. keep everything in under-represented strata and hash-sample the
    over-represented ones down toward the target. Strata absent from
    ``target_shares`` are dropped (share 0).

    Scale shape: one aggregate produces the strata-cardinality count table;
    the global total is a window sum OVER that tiny table; the rate table
    broadcasts back onto the corpus (strata cardinality ≪ corpus), and the
    keep decision is the same zero-shuffle content-hash filter as
    :func:`deterministic_sample` — replayable across engines and reruns.
    """
    share = F.when(F.lit(False), F.lit(0.0))
    for stratum, s in sorted(target_shares.items()):
        share = share.when(F.col(strata_col) == stratum, F.lit(float(s)))
    counts = df.groupBy(strata_col).agg(F.count(F.lit(1)).alias("__n"))
    rates = counts.select(
        strata_col,
        F.least(
            F.lit(1.0),
            F.coalesce(share, F.lit(0.0))
            * F.sum("__n").over(Window.partitionBy())
            / F.col("__n"),
        ).alias("__rate"),
    )
    return (
        df.join(F.broadcast(rates), strata_col)
        .filter(hash_fraction(F.col(key_col)) < F.col("__rate"))
        .drop("__rate")
    )


def stratified_sample(
    df: DataFrame, strata_col: str, rates: Mapping[str, float], key_col: str
) -> DataFrame:
    """Per-stratum deterministic sampling (e.g. downsample dominant
    languages, keep all of rare ones). Strata absent from ``rates`` are
    dropped. Pure filter — no shuffle, no driver collect."""
    frac = hash_fraction(F.col(key_col))
    rate = F.when(F.lit(False), F.lit(0.0))
    for stratum, r in sorted(rates.items()):
        rate = rate.when(F.col(strata_col) == stratum, F.lit(float(r)))
    return df.filter(frac < rate)


def holdout_split(
    df: DataFrame,
    key_col: str,
    train: float = 0.8,
    val: float = 0.1,
) -> DataFrame:
    """Deterministic train/val/test assignment from the content-hash
    uniform of ``key_col``: u < train → 'train', u < train+val → 'val',
    else 'test'. The split is a pure function of the data (identical
    across engines, partitionings, reruns — the module's replayability
    discipline), so a row can never migrate between splits when the
    corpus is re-processed, which is what keeps eval sets uncontaminated
    over pipeline versions. Zero shuffle — one projection."""
    if not (0 <= train and 0 <= val and train + val <= 1):
        raise ValueError(
            f"invalid split fractions train={train} val={val}: need "
            "0 <= train, 0 <= val, train + val <= 1 (else the 'test' "
            "band silently vanishes)"
        )
    u = hash_fraction(F.col(key_col))
    return df.withColumn(
        "split",
        F.when(u < train, F.lit("train"))
        .when(u < train + val, F.lit("val"))
        .otherwise(F.lit("test")),
    )


def kfold_assign(df: DataFrame, key_col: str, k: int) -> DataFrame:
    """Deterministic k-fold assignment: fold = content-hash(key) mod k —
    the cross-validation splitter with the same replayability contract
    as ``holdout_split`` (a row's fold is a pure function of the data:
    identical across engines, partitionings, and reruns, so fold i's
    eval set can never leak into fold i's training set when the corpus
    is reprocessed). Zero shuffle — one projection; the k models then
    train on ``fold != i`` filters of the same frame, each a pushed-down
    scan predicate."""
    if k < 2:
        raise ValueError(f"k-fold needs k >= 2, got {k}")
    return df.withColumn(
        "fold", (_hash_bucket(F.col(key_col)) % k).cast("int")
    )


def target_encode_oof(
    df: DataFrame,
    key_col: str,
    cat_col: str,
    target_col: str,
    k: int = 5,
) -> DataFrame:
    """Leakage-safe (out-of-fold) target encoding: replace a categorical
    with the mean of the target over the OTHER folds' rows of the same
    category — te(row) = (S_cat − S_cat,fold(row)) / (n_cat − n_cat,fold(row)).
    Naive target encoding (category mean over ALL rows) leaks each row's
    own label into its feature and inflates validation scores; the
    out-of-fold form is the standard fix (the CatBoost/Kaggle
    discipline), and it composes with ``kfold_assign``'s content-hash
    folds so the encoding is a pure function of the data.

    Scale shape: one aggregate to the (category × fold) grid (a
    k·|categories| frame — tiny), category totals derived FROM the grid
    (no second scan), broadcast back onto the rows — the same
    O(categories) broadcast discipline as dsir_importance's weight
    table. A category seen in only one fold has no out-of-fold evidence:
    its rows get NULL (callers back off to the global mean), never a
    leaked same-fold value.

    Returns (key, cat, fold, te) at row grain, te UNROUNDED (callers
    round at their comparison boundary)."""
    folded = kfold_assign(df, key_col, k).select(
        key_col, F.col(cat_col).alias("_cat"),
        F.col(target_col).cast("double").alias("_y"), "fold",
    )
    grid = folded.groupBy("_cat", "fold").agg(
        F.sum("_y").alias("_s"), F.count(F.lit(1)).alias("_n")
    )
    tot = grid.groupBy("_cat").agg(
        F.sum("_s").alias("_st"), F.sum("_n").alias("_nt")
    )
    oof = (
        grid.join(tot, "_cat")
        .select(
            "_cat", "fold",
            (
                (F.col("_st") - F.col("_s"))
                / F.nullif(F.col("_nt") - F.col("_n"), F.lit(0))
            ).alias("te"),
        )
    )
    return folded.join(F.broadcast(oof), ["_cat", "fold"]).select(
        key_col, F.col("_cat").alias(cat_col), "fold", "te"
    )


def minmax_scale(
    df: DataFrame,
    group_col: str,
    value_col: str,
    out_col: str | None = None,
) -> DataFrame:
    """Per-group min-max scaling to [0, 1] — the bounded-feature prep
    (distance models, neural inputs) beside ``target_encode_oof``'s
    categorical path: x' = (x − min)/(max − min), computed against the
    GROUP's range so heterogeneous segments don't crush each other's
    dynamic range. Constant groups (max = min) scale to NULL — a
    constant feature carries no information and 0-vs-0.5 conventions
    just hide that. The join back is LEFT + null-safe, so every input
    row survives (the ``median_impute`` / ``ordinal_encode`` /
    ``rare_category_collapse`` row-preserving contract): NULL-group
    rows match the NULL group ``groupBy`` itself emits and scale
    against that group's range, consistent with SQL grouping
    semantics.

    One group-keyed min/max aggregate joined back on the group key —
    two shuffles, O(groups) side table, never collected. The scaled
    value is rounded to 6 so both engines hash the division
    identically.
    """
    out = out_col or f"{value_col}_scaled"
    rng = df.groupBy(F.col(group_col).alias("__g")).agg(
        F.min(value_col).alias("__lo"), F.max(value_col).alias("__hi")
    )
    return (
        df.join(rng, F.col(group_col).eqNullSafe(F.col("__g")), "left")
        .withColumn(
            out,
            F.when(
                F.col("__hi") > F.col("__lo"),
                F.round(
                    (F.col(value_col) - F.col("__lo"))
                    / (F.col("__hi") - F.col("__lo")),
                    6,
                ),
            ),
        )
        .drop("__g", "__lo", "__hi")
    )


def ordinal_encode(
    df: DataFrame,
    cat_col: str,
    out_col: str | None = None,
) -> DataFrame:
    """Frequency-ordinal category encoding: map each category to its
    dense rank by DESCENDING frequency (ties broken lexicographically),
    so code 1 is always the modal category — the label encoding
    gradient-boosted trees consume, with a DETERMINISTIC code
    assignment (hash/arrival-order encoders shuffle codes between runs
    and poison model diffs). NULL categories encode to NULL.

    One category-keyed count, one dense_rank window over the O(|vocab|)
    count table (not the data), and a category-keyed join back — the
    vocabulary is never collected. Returns the input plus ``out_col``
    (default ``<cat>_code``, int).
    """
    out = out_col or f"{cat_col}_code"
    counts = df.filter(F.col(cat_col).isNotNull()).groupBy(
        F.col(cat_col).alias("__c")
    ).agg(F.count(F.lit(1)).alias("__n"))
    w = Window.orderBy(F.desc("__n"), F.asc("__c"))
    codes = counts.select(
        "__c", F.dense_rank().over(w).cast("int").alias(out)
    )
    return df.join(
        codes, F.col(cat_col) == F.col("__c"), "left"
    ).drop("__c")


def caliper_match(
    df: DataFrame,
    block_col,
    score_col,
    treated_col,
    unit_col: str,
    caliper: float,
) -> DataFrame:
    """Nearest-neighbor propensity-score matching with replacement and a
    caliper (Rosenbaum & Rubin 1985) — the observational-causal-inference
    prep step: each treated unit is paired with the control whose score
    is closest within the same block, if the distance is within
    ``caliper``; otherwise it stays unmatched (the caliper is what stops
    garbage pairs off the common support).

    Shape: the asof-join union-merge trick applied to the SCORE axis —
    tag both arms, ONE shuffle on the block key, two window passes over
    the same block partitioning ordered by (score, is_treated, unit):
    the nearest control at-or-below is a running ``last(control,
    ignorenulls)``, the nearest above the same running ``last`` over
    the REVERSED ordering (growing frames only — a shrinking
    (1, following) frame re-scans per row, O(n²) per block; see
    tools/stress_eval.py). Never a treated×control
    pairwise join; equal-score controls sort BEFORE the treated row, so
    an exact tie matches at distance 0 deterministically. Ties between
    sides (equidistant below vs above) break toward the LOWER score;
    among equidistant controls on ONE side the pick is the nearest in
    the window's (score, side, unit) order — the highest unit id below,
    the lowest above — fully reproducible, pinned by the brute-force
    differential in tests/test_properties_round11.py. Blocks (here:
    coarse strata like dates or sites) bound each window partition, so
    no global score sort exists.

    Returns one row per treated unit:
    ``(block, treated_id, treated_score, control_id, control_score,
    dist, matched)`` — unmatched treated rows keep NULL control columns
    and matched = false; dist is the exact double |Δscore|.
    """
    if caliper <= 0:
        raise ValueError(f"caliper_match needs caliper > 0, got {caliper}")
    b = block_col if isinstance(block_col, Column) else F.col(block_col)
    s = (
        score_col if isinstance(score_col, Column) else F.col(score_col)
    ).cast("double")
    base = df.select(
        b.alias("__b"),
        s.alias("__s"),
        treated_col.cast("boolean").alias("__t"),
        F.col(unit_col).alias("__u"),
    )
    w = Window.partitionBy("__b").orderBy(
        "__s", F.col("__t").cast("int"), "__u"
    )
    # the "nearest control after" direction runs on a REVERSED ordering
    # with the same growing (unboundedPreceding, -1) frame — a shrinking
    # (1, unboundedFollowing) frame is NOT incrementally computable in
    # Spark and re-scans the remainder per row: O(n²) per block
    # (measured 104x at 20x rows in tools/stress_eval.py; 1.2x after
    # this rewrite). The row sets are identical: "strictly after me in
    # ascending (s, t, u)" == "strictly before me in descending".
    w_rev = Window.partitionBy("__b").orderBy(
        F.col("__s").desc(), F.col("__t").cast("int").desc(),
        F.col("__u").desc(),
    )
    ctrl = F.when(
        ~F.col("__t"), F.struct(F.col("__s").alias("s"), F.col("__u").alias("u"))
    )
    below = F.last(ctrl, ignorenulls=True).over(
        w.rowsBetween(Window.unboundedPreceding, -1)
    )
    above = F.last(ctrl, ignorenulls=True).over(
        w_rev.rowsBetween(Window.unboundedPreceding, -1)
    )
    cand = base.select(
        "__b", "__s", "__t", "__u", below.alias("__lo"), above.alias("__hi")
    ).filter(F.col("__t"))
    d_lo = F.col("__s") - F.col("__lo.s")
    d_hi = F.col("__hi.s") - F.col("__s")
    # Prefer the nearer side; ties (d_lo = d_hi) take the lower score.
    use_lo = F.col("__lo").isNotNull() & (
        F.col("__hi").isNull() | (d_lo <= d_hi)
    )
    pick_s = F.when(use_lo, F.col("__lo.s")).otherwise(F.col("__hi.s"))
    pick_u = F.when(use_lo, F.col("__lo.u")).otherwise(F.col("__hi.u"))
    dist = F.abs(F.col("__s") - pick_s)
    ok = dist <= F.lit(float(caliper))
    return cand.select(
        F.col("__b").alias("block"),
        F.col("__u").alias("treated_id"),
        F.col("__s").alias("treated_score"),
        F.when(ok, pick_u).alias("control_id"),
        F.when(ok, pick_s).alias("control_score"),
        F.when(ok, dist).alias("dist"),
        F.coalesce(ok, F.lit(False)).alias("matched"),
    )


def rendezvous_shard(
    key: Column,
    n_shards: int,
    salt: str = "",
) -> Column:
    """Rendezvous (highest-random-weight) shard id for a key: argmax
    over shards s of md5("{s}:{salt}{key}") — Thaler-Ravishankar HRW
    hashing, the placement rule whose defining property is MINIMAL
    MOVEMENT under resharding: growing n→n+1 relocates only the keys
    whose new shard wins the argmax, an expected 1/(n+1) of the corpus,
    versus ~n/(n+1) for mod-hash. Pure expression (n md5s + one struct
    array_max), zero shuffle, reproducible on any engine; md5 collisions
    aside, the argmax is unique so no tiebreak state is needed."""
    if n_shards < 1:
        raise ValueError(f"rendezvous_shard needs n_shards >= 1, got {n_shards}")
    k = key.cast("string")
    return F.array_max(
        F.array(
            *[
                F.struct(
                    F.md5(
                        F.concat(F.lit(f"{s}:{salt}"), k)
                    ).alias("h"),
                    F.lit(s).alias("s"),
                )
                for s in range(n_shards)
            ]
        )
    ).getField("s")


def mod_shard(key: Column, n_shards: int) -> Column:
    """Baseline mod-hash shard id: first 8 md5 hex chars of the key as
    an integer, mod ``n_shards`` — uniform, but resharding n→n+1
    relocates ~n/(n+1) of all keys (the instability rendezvous_shard
    exists to avoid)."""
    if n_shards < 1:
        raise ValueError(f"mod_shard needs n_shards >= 1, got {n_shards}")
    bucket = F.conv(
        F.substring(F.md5(key.cast("string")), 1, 8), 16, 10
    ).cast("long")
    return (bucket % n_shards).cast("int")


def reshard_stability(
    df: DataFrame,
    key_col: str,
    n_from: int,
    n_to: int,
) -> DataFrame:
    """Resharding-movement audit: assign every key to shards under
    ``n_from`` and ``n_to`` with BOTH placement rules and report how
    much data each would relocate — the capacity-planning readout
    before scaling a sharded corpus/index (HRW theory: ≈ 1/n_to moves;
    mod-hash: ≈ 1 − 1/lcm-ish, nearly everything). One scan, all four
    assignments are map-side expressions, one single-row aggregate.

    Returns ONE row ``(n_keys, rdv_moved, rdv_moved_frac, mod_moved,
    mod_moved_frac)`` with fractions rounded to 6.
    """
    k = F.col(key_col)
    tagged = df.select(
        rendezvous_shard(k, n_from).alias("__r1"),
        rendezvous_shard(k, n_to).alias("__r2"),
        mod_shard(k, n_from).alias("__m1"),
        mod_shard(k, n_to).alias("__m2"),
    )
    agg = tagged.agg(
        F.count(F.lit(1)).cast("long").alias("n_keys"),
        F.sum(
            (F.col("__r1") != F.col("__r2")).cast("int")
        ).cast("long").alias("rdv_moved"),
        F.sum(
            (F.col("__m1") != F.col("__m2")).cast("int")
        ).cast("long").alias("mod_moved"),
    )
    return agg.select(
        "n_keys",
        "rdv_moved",
        F.round(
            F.col("rdv_moved")
            / F.nullif(F.col("n_keys").cast("double"), F.lit(0.0)),
            6,
        ).alias("rdv_moved_frac"),
        "mod_moved",
        F.round(
            F.col("mod_moved")
            / F.nullif(F.col("n_keys").cast("double"), F.lit(0.0)),
            6,
        ).alias("mod_moved_frac"),
    )
