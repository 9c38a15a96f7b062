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

from pyspark.sql import Column, DataFrame, functions as F

# First 8 md5 hex chars as an integer, uniform on [0, 2^32).
_HASH_SPACE = float(2**32)


def hash_fraction(key: Column) -> Column:
    """Uniform [0,1) double derived from md5 of the key's string form.

    Engine-portable: DuckDB's ``CAST(concat('0x', substr(md5(x),1,8)) AS
    UBIGINT) / 2^32`` produces the identical value, so sampled sets match
    bit-for-bit across Spark and the oracle.
    """
    bucket = F.conv(F.substring(F.md5(key.cast("string")), 1, 8), 16, 10).cast("long")
    return bucket / F.lit(_HASH_SPACE)


def deterministic_sample(df: DataFrame, key_col: str, rate: float) -> DataFrame:
    """Keep ~``rate`` of rows, chosen by content hash of ``key_col``."""
    return df.filter(hash_fraction(F.col(key_col)) < rate)


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
