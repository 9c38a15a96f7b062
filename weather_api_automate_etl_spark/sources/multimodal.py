"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Extension surface per BASELINE.json: image/audio/video are ``binary``
columns with a metadata struct; decode / feature-extract / resize /
frame-sample run as Arrow-batched Pandas functions over ``mapInPandas`` —
the batch shape, schema, and partitioning are the real article, while the
codec step itself is stubbed (no image/audio libraries in this container):
``decode_stub=True`` produces a deterministic fake feature row, and the
real path raises ``NotImplementedError`` until a decoder is plugged in.

Scale shape: payload bytes never leave the executor, batches stream through
Arrow, and per-batch decode cost amortizes Python overhead — the standard
pattern for multimodal feature extraction on Spark.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T

ASSET_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("content", T.BinaryType()),
        T.StructField("byte_len", T.LongType()),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("byte_len", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_frames", T.IntegerType()),
    ]
)


def documents_as_assets(documents: DataFrame) -> DataFrame:
    """Materialize an opaque-binary asset table from the documents fixture
    (the container has no real media files): content = utf-8 bytes, typed
    metadata derived deterministically."""
    return documents.select(
        F.col("doc_id").alias("asset_id"),
        F.element_at(
            F.array(F.lit("image/png"), F.lit("audio/wav"), F.lit("video/mp4")),
            (F.col("doc_id") % 3 + 1).cast("int"),
        ).alias("media_type"),
        F.encode(F.col("text"), "UTF-8").alias("content"),
        F.octet_length(F.encode(F.col("text"), "UTF-8")).cast("long").alias("byte_len"),
    )


def _fake_decode(media_type: str, payload: bytes) -> tuple[int, int, int]:
    """Deterministic stand-in for a codec: dimensions derived from payload
    length. Mirrorable in SQL, so the Spark plumbing is oracle-checkable."""
    n = len(payload)
    return (n % 64 + 1, n % 48 + 1, n % 16 if media_type == "video/mp4" else 1)


def extract_features(assets: DataFrame, decode_stub: bool = True) -> DataFrame:
    """Decode + feature-extract via Arrow-batched ``mapInPandas``.

    With ``decode_stub=False`` this is where a real decoder (PIL/ffmpeg/…)
    would run per batch; absent those libraries it raises —
    deliberately, per the container constraints."""

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:  # noqa: F821
        import pandas as pd

        for pdf in batches:
            if not decode_stub:
                raise NotImplementedError(
                    "real media decode requires PIL/soundfile/ffmpeg — not in container"
                )
            dims = [
                _fake_decode(m, bytes(c)) for m, c in zip(pdf["media_type"], pdf["content"])
            ]
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "media_type": pdf["media_type"],
                    "byte_len": pdf["byte_len"],
                    "width": [d[0] for d in dims],
                    "height": [d[1] for d in dims],
                    "n_frames": [d[2] for d in dims],
                }
            )

    return assets.mapInPandas(run, FEATURE_SCHEMA)


def frame_sample(assets: DataFrame, every_nth: int = 4) -> DataFrame:
    """Frame-sampling plumbing: explode the (stub-)decoded frame index space
    and keep every n-th frame — the partition/batch shape of real video
    sampling, with the codec stubbed."""
    feats = extract_features(assets)
    return (
        # n_frames == 0 must yield no rows — and Spark's sequence(0, -1)
        # would COUNT DOWN to [0, -1], so guard before building the range.
        feats.filter((F.col("media_type") == "video/mp4") & (F.col("n_frames") > 0))
        .select(
            "asset_id",
            F.explode(F.sequence(F.lit(0), F.col("n_frames") - 1)).alias("frame_idx"),
        )
        .filter(F.col("frame_idx") % every_nth == 0)
    )


RESIZE_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("content", T.BinaryType()),
        T.StructField("byte_len", T.LongType()),
    ]
)


def resize(
    assets: DataFrame,
    target_w: int = 32,
    target_h: int = 24,
    decode_stub: bool = True,
) -> DataFrame:
    """Resize plumbing via Arrow-batched ``mapInPandas``: decode → scale →
    re-encode per batch. The codec is stubbed (container has no PIL/ffmpeg):
    the fake 'resized' payload is a deterministic truncation/pad of the
    source bytes to target_w*target_h, so batch shape, schema, and byte
    accounting are real and testable; swap ``_fake_resize`` for the real
    transform when a codec is available."""

    def _fake_resize(payload: bytes) -> bytes:
        n = target_w * target_h
        return bytes(payload[:n]).ljust(n, b"\0")

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:  # noqa: F821
        import pandas as pd

        for pdf in batches:
            if not decode_stub:
                raise NotImplementedError(
                    "real media resize requires PIL/ffmpeg — not in container"
                )
            out = [_fake_resize(bytes(c)) for c in pdf["content"]]
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "media_type": pdf["media_type"],
                    "width": target_w,
                    "height": target_h,
                    "content": out,
                    "byte_len": [len(b) for b in out],
                }
            )

    return assets.mapInPandas(run, RESIZE_SCHEMA)
