"""Round-10 fifty-ninth-wave query: progressive (SOF2) JPEG decode.

Per-query rationale lives in each function docstring; registry/oracle
conventions in queries.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from weather_api_automate_etl_spark.queries import query, t
from weather_api_automate_etl_spark.sources import multimodal

_PROG_ORACLE = """
    SELECT doc_id AS asset_id,
           CAST((doc_id % 3 + 1) * 8 + doc_id % 7 AS INTEGER) AS width,
           CAST((doc_id % 2 + 1) * 8 + doc_id % 5 AS INTEGER) AS height,
           CAST(3 AS INTEGER) AS n_channels,
           CAST((((doc_id % 3 + 1) * 8 + doc_id % 7 + 7) // 8)
                * (((doc_id % 2 + 1) * 8 + doc_id % 5 + 7) // 8)
                AS INTEGER) AS n_blocks,
           TRUE AS exact_match
    FROM documents
"""


@query(
    "q_multimodal_decode_progressive",
    oracle=_PROG_ORACLE,
    tags=("multimodal",),
)
def q_multimodal_decode_progressive(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """NON-stub progressive JPEG decode end-to-end: deterministic SOF2
    payloads (multimodal.documents_as_progressive_jpeg_assets, the
    libjpeg-style 12-scan script) are decoded by the pure-NumPy
    multi-scan codec (sources/codecs.py::decode_jpeg, Annex-G branch) —
    DC first/refinement, per-band AC first scans, two AC refinement
    rounds with EOB-run correction-bit sweeps — and reduced to
    structure stats plus the exact progressive==baseline pixel-equality
    contract. Bytes never leave executors (Arrow mapInPandas)."""
    assets = multimodal.documents_as_progressive_jpeg_assets(
        t(spark, sf_dir, "documents")
    )
    return multimodal.progressive_jpeg_stats(assets)
