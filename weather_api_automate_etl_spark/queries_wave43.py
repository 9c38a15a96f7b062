"""Round-9 forty-third-wave queries: training-free dimensionality
reduction and probabilistic-forecast audit.

Per-query rationale lives in each function docstring; registry/oracle
conventions in queries.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from weather_api_automate_etl_spark.operators.embeddings import (
    jl_sign_matrix,
)
from weather_api_automate_etl_spark.queries import query, t

_K = 16
_D = 64
_SIGNS = jl_sign_matrix(_K, _D)


def _jl_oracle() -> str:
    dots = []
    for j in range(_K):
        row = "[" + ", ".join(f"{float(s)}" for s in _SIGNS[j]) + "]"
        dots.append(
            f"list_sum(list_transform(range(1, {_D} + 1), "
            f"i -> CAST(embedding[i] AS DOUBLE) * ({row})[i])) / 4.0"
            f" AS p{j}"
        )
    proj = ", ".join(
        f"ROUND(p{j}, 6) AS proj_{j}" for j in range(4)
    )
    pn = " + ".join(f"p{j} * p{j}" for j in range(_K))
    return f"""
    WITH raw AS (
      SELECT vec_id,
             sqrt(list_sum(list_transform(embedding,
               x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS onorm,
             {", ".join(dots)}
      FROM embeddings
    )
    SELECT vec_id,
           {proj},
           ROUND(onorm, 6) AS orig_norm,
           ROUND(sqrt({pn}), 6) AS proj_norm,
           ROUND(sqrt({pn}) / NULLIF(onorm, 0), 6) AS distortion
    FROM raw
    """


@query("q_jl_project", oracle=_jl_oracle(), tags=("embeddings", "mlprep"))
def q_jl_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JL random projection 64-d → 16-d (operators/embeddings.py::
    jl_project, md5-Rademacher signs, 1/√16 scaling): pure projection —
    zip_with multiply + ordered aggregate folds, JVM-side codegen, zero
    shuffle, no training pass (contrast pca_project's Gram aggregate).
    distortion = ‖Sv/√k‖/‖v‖ audits the JL lemma per vector. The driver
    hash can't canon array cells, so the contract row carries the first
    four projected coordinates as scalars; the full 16-d array API is
    pinned by tests/test_wave43.py."""
    from weather_api_automate_etl_spark.operators import embeddings

    out = embeddings.jl_project(
        t(spark, sf_dir, "embeddings"), "vec_id", "embedding", _SIGNS
    )
    return out.select(
        "vec_id",
        *[
            F.col("proj").getItem(j).alias(f"proj_{j}")
            for j in range(4)
        ],
        "orig_norm",
        "proj_norm",
        "distortion",
    )


_BRIER_ORACLE = """
    WITH base AS (
      SELECT floor(value) / 491 AS s,
             CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
      FROM events
    ),
    b AS (
      SELECT LEAST(CAST(floor(s * 10) AS INTEGER), 9) AS bin,
             CAST(COUNT(*) AS BIGINT) AS n,
             AVG(s) AS f, AVG(CAST(y AS DOUBLE)) AS o,
             SUM((s - y) * (s - y)) AS se
      FROM base GROUP BY 1
    ),
    w AS (
      SELECT bin, n, f, o,
             SUM(n) OVER () AS nn,
             SUM(se) OVER () AS se_all,
             SUM(n * (f - o) * (f - o)) OVER () AS rel_n,
             SUM(n * o * o) OVER () AS oo_n,
             SUM(n * o) OVER () AS o_n
      FROM b
    )
    SELECT bin, n,
           ROUND(f, 6) AS f_mean,
           ROUND(o, 6) AS o_rate,
           ROUND(se_all / nn, 6) AS brier,
           ROUND(rel_n / nn, 6) AS reliability,
           ROUND(oo_n / nn - (o_n / nn) * (o_n / nn), 6) AS resolution,
           ROUND((o_n / nn) * (1.0 - o_n / nn), 6) AS uncertainty
    FROM w
"""


@query(
    "q_brier_decomposition",
    oracle=_BRIER_ORACLE,
    tags=("stats", "mlprep"),
)
def q_brier_decomposition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brier score Murphy decomposition (operators/stats.py::
    brier_decomposition, 10 fixed-width bins): BS, reliability,
    resolution, uncertainty riding every bin row — one binned aggregate
    (map-side combine) plus window sums over the 10-row result;
    resolution uses the Σw·o² − ō² expansion so no window nests inside
    another."""
    from weather_api_automate_etl_spark.operators import stats

    ev = t(spark, sf_dir, "events")
    return stats.brier_decomposition(
        ev,
        F.floor(F.col("value")) / 491,
        F.col("event_type") == "purchase",
        n_bins=10,
    )
