"""Vector expressions over ``array<float>`` embedding columns.

Built on ``zip_with``/``aggregate`` higher-order functions: the arithmetic
runs JVM-side per row (map-only, codegen'd), so similarity scans are pure
narrow transformations — the only shuffle in a top-k search is the final
TakeOrdered, and none at all in an LSH-bucketed variant.

Accumulation is a left fold in array order, in double precision — the DuckDB
oracle reproduces the same fold (``list_sum`` over an index-ordered
``list_transform``), keeping scores bit-comparable.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def dot_product(a: Column | str, b: Column | str) -> Column:
    """Σ aᵢ·bᵢ in double precision (left fold in array order)."""
    prods = F.zip_with(
        _col(a), _col(b), lambda x, y: x.cast("double") * y.cast("double")
    )
    return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)


def l2_norm(a: Column | str) -> Column:
    """√(Σ aᵢ²) in double precision."""
    return F.sqrt(dot_product(a, a))


def l2_normalize(a: Column | str) -> Column:
    """Unit-normalize an embedding (array<double>); null-safe on zero norm."""
    c = _col(a)
    n = l2_norm(c)
    return F.when(n > 0, F.transform(c, lambda x: x.cast("double") / n))


def cosine_from_norms(dot: Column, norm_a: Column, norm_b: Column) -> Column:
    """Cosine from a precomputed dot product and per-side norms (the
    self-join path precomputes norms per row so each candidate pair costs
    one fold); null on zero-norm inputs — the single definition of the
    zero-norm guard."""
    denom = norm_a * norm_b
    return F.when(denom > 0, dot / denom)


def cosine_similarity(a: Column | str, b: Column | str) -> Column:
    """dot(a,b) / (‖a‖·‖b‖), null on zero-norm inputs."""
    return cosine_from_norms(dot_product(a, b), l2_norm(a), l2_norm(b))


# --- SQL-text twins --------------------------------------------------------
# Column-by-Column composition costs one py4j round trip per expression
# node; builders that instantiate many literal vectors (LSH planes, MMR's
# per-pick cosines) measured 0.7-2 s of pure driver time per query build.
# These render the SAME trees as the Column forms above as one SQL string
# for a single F.expr parse — the round-12 PQ discipline (repr() double
# literals round-trip IEEE-exactly; tests pin result equality against the
# Column composition). Operand strings must be SQL expressions; quote
# plain column names with sql_ident first.


def sql_ident(name: str) -> str:
    """Backtick-quoted identifier, embedded backticks doubled. NOTE this
    binds a literal TOP-LEVEL column (not a struct path) — callers pass
    simple names."""
    return "`" + name.replace("`", "``") + "`"


def sql_dlit(x: float) -> str:
    """Exact SQL double literal (repr round-trips IEEE doubles)."""
    r = repr(float(x))
    if "inf" in r or "nan" in r:
        raise ValueError(f"non-finite vector component: {x!r}")
    return f"{r}D"


def sql_vec_lit(xs) -> str:
    return "array(" + ", ".join(sql_dlit(x) for x in xs) + ")"


def dot_product_sql(a: str, b: str) -> str:
    """SQL text of :func:`dot_product` — same zip_with/aggregate fold."""
    return (
        f"aggregate(zip_with({a}, {b}, "
        "(x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), "
        "0.0D, (acc, x) -> acc + x)"
    )


def l2_norm_sql(a: str) -> str:
    return f"SQRT({dot_product_sql(a, a)})"


def cosine_similarity_sql(a: str, b: str) -> str:
    """SQL text of :func:`cosine_similarity` — the same duplicated-denom
    CASE the Column form builds (a Column object reused twice is the
    same subtree twice), null on zero-norm inputs."""
    denom = f"({l2_norm_sql(a)} * {l2_norm_sql(b)})"
    return (
        f"CASE WHEN {denom} > 0 THEN {dot_product_sql(a, b)} / {denom} END"
    )
