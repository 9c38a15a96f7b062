"""Round-9 fortieth-wave query: Adam7 interlaced PNG decode.

Per-query rationale lives in each function docstring; registry/oracle
conventions in queries.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from weather_api_automate_etl_spark.queries import query, t
from weather_api_automate_etl_spark.sources import multimodal

_INTERLACED_ORACLE = """
    SELECT doc_id AS asset_id,
           CAST(doc_id % 11 + 2 AS INTEGER) AS width,
           CAST(doc_id % 5 + 2 AS INTEGER) AS height,
           CAST(CASE WHEN doc_id % 2 = 0 THEN 3 ELSE 4 END AS INTEGER) AS n_channels,
           ROUND(CAST((doc_id % 256) * ((doc_id % 11 + 2) * (doc_id % 5 + 2) - 1)
                      + 255 - (doc_id % 256) AS DOUBLE)
                 / ((doc_id % 11 + 2) * (doc_id % 5 + 2)), 6) AS mean_r,
           CAST(255 - doc_id % 256 AS INTEGER) AS first_px_r,
           CAST(255 - n_chars % 256 AS INTEGER) AS first_px_g,
           CAST(255 - doc_id * 7 % 256 AS INTEGER) AS first_px_b,
           CAST(CASE WHEN doc_id % 2 = 0 THEN 255
                     ELSE doc_id * 11 % 256 END AS INTEGER) AS first_px_a
    FROM documents
"""


@query(
    "q_multimodal_decode_interlaced",
    oracle=_INTERLACED_ORACLE,
    tags=("multimodal",),
)
def q_multimodal_decode_interlaced(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NON-stub Adam7 PNG decode end-to-end: deterministic interlaced
    payloads (multimodal.documents_as_interlaced_png_assets) are decoded
    by the pure-stdlib zlib + NumPy codec (sources/codecs.py::decode_png,
    interlace=1 branch) — chunk/CRC parse, inflate, seven per-pass
    unfilter + scatter rounds with empty passes omitted — and reduced to
    location- and value-sensitive stats. The oracle is the SAME
    generation-parameter prediction as the sequential PNG query: the
    pixels must come out identical even though every byte of the raster
    stream is arranged differently. Roundtrip fuzz (1,260 dim×filter
    combos incl. single-row/column images) lives in
    tests/test_multimodal.py."""
    assets = multimodal.documents_as_interlaced_png_assets(
        t(spark, sf_dir, "documents")
    )
    return multimodal.png_stats(assets)
