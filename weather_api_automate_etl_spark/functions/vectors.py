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
