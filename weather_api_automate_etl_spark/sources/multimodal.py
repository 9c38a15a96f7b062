"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Extension surface per BASELINE.json: image/audio/video are ``binary``
columns with a metadata struct; decode / feature-extract / resize /
frame-sample run as Arrow-batched Pandas functions over ``mapInPandas`` —
the batch shape, schema, and partitioning are the real article.

The codec step has two tiers:

- ``decode_stub=True`` — deterministic fake feature row (any media type);
- ``decode_stub=False`` — a REAL pure-stdlib+NumPy decode for binary PPM,
  24-bpp BMP, 8-bit PNG (all five scanline filters, RGB/RGBA, Adam7),
  JFIF JPEG (4:4:4, baseline SOF0 AND progressive SOF2 with successive
  approximation, file-supplied Huffman/quant tables, restart markers)
  and RIFF/PCM-16 WAV payloads (sources/codecs.py); formats that
  genuinely need a codec library (subsampled/12-bit JPEG, compressed
  audio, compressed video) still raise — that is the documented
  PIL/ffmpeg plug point.

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


def _asset_frame(documents, build, media_type=None, cols=("doc_id", "n_chars")):
    """Shared Arrow scaffolding for the deterministic payload generators:
    ``build(*ints)`` returns payload bytes (tagged with the fixed
    ``media_type``) or a ``(payload, media_type)`` pair. Bytes are
    synthesized AND consumed on executors — the driver never sees one."""

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:  # noqa: F821
        import pandas as pd

        for pdf in batches:
            payloads, fmts = [], []
            for vals in zip(*[pdf[c] for c in cols]):
                out = build(*(int(v) for v in vals))
                p, mt = out if isinstance(out, tuple) else (out, media_type)
                payloads.append(p)
                fmts.append(mt)
            yield pd.DataFrame(
                {
                    "asset_id": pdf["doc_id"],
                    "media_type": fmts,
                    "content": payloads,
                    "byte_len": [len(p) for p in payloads],
                }
            )

    return documents.select(*cols).mapInPandas(run, ASSET_SCHEMA)


def documents_as_image_assets(documents: DataFrame) -> DataFrame:
    """Synthesize REAL image payloads (binary PPM / 24-bpp BMP, alternating
    by doc_id parity) deterministically from document columns, so the
    non-stub decode path has genuine bytes to parse and every decoded
    property is predictable from (doc_id, n_chars) — i.e. SQL-oracle-able.

    Per doc: width = doc_id%13+2, height = doc_id%7+2 (odd widths exercise
    BMP row padding), fill color (doc_id%256, n_chars%256, doc_id*7%256),
    and pixel (0,0) inverted — a flipped/offset decode moves that pixel and
    is caught by the first-pixel check."""

    def build(d, n):
        import numpy as np

        from weather_api_automate_etl_spark.sources import codecs

        w, h = d % 13 + 2, d % 7 + 2
        r, g, b = d % 256, n % 256, d * 7 % 256
        px = np.empty((h, w, 3), dtype=np.uint8)
        px[:, :] = (r, g, b)
        px[0, 0] = (255 - r, 255 - g, 255 - b)
        if d % 2 == 0:
            return codecs.encode_bmp(px), "image/bmp"
        return codecs.encode_ppm(px), "image/x-portable-pixmap"

    return _asset_frame(documents, build)


def documents_as_gif_assets(documents: DataFrame) -> DataFrame:
    """Synthesize REAL single-frame GIF89a payloads deterministically from
    document columns (the palette-indexed sibling of
    documents_as_image_assets): width = doc_id%9+2, height = doc_id%6+2, a
    2-color palette — fill (doc_id%256, doc_id*5%256, doc_id*11%256) with
    pixel (0,0) inverted-style (255-doc_id%256, 255-n_chars%256,
    255-doc_id*7%256) — so the LZW round-trip, color-table lookup, and
    raster order are all pinned by SQL-predictable stats. Long single-color
    runs grow the LZW string table across a code-width bump, so the
    variable-width path runs in-pipeline, not just in unit fuzz."""

    def build(d, n):
        import numpy as np

        from weather_api_automate_etl_spark.sources import codecs

        w, h = d % 9 + 2, d % 6 + 2
        fill = (d % 256, d * 5 % 256, d * 11 % 256)
        first = (255 - d % 256, 255 - n % 256, 255 - d * 7 % 256)
        idx = np.zeros((h, w), dtype=np.uint8)
        idx[0, 0] = 1
        return codecs.encode_gif(idx, [fill, first])

    return _asset_frame(documents, build, "image/gif")


def documents_as_tiff_assets(documents: DataFrame) -> DataFrame:
    """Synthesize REAL baseline-TIFF payloads deterministically from
    document columns (the strip-layout sibling of documents_as_gif_assets):
    width = doc_id%10+2, height = doc_id%7+2, fill color (doc_id%256,
    n_chars%256, doc_id*13%256) with pixel (0,0) inverted. The encoder
    parameters rotate over the format's structural degrees of freedom so
    every decoder path runs IN-PIPELINE, not just in unit fuzz: PackBits
    compression for odd doc_id (the solid fill makes real replicate runs),
    big-endian byte order when doc_id%5==0, and a 2-row multi-strip
    layout when doc_id%3==0 (external StripOffsets/ByteCounts arrays)."""

    def build(d, n):
        import numpy as np

        from weather_api_automate_etl_spark.sources import codecs

        w, h = d % 10 + 2, d % 7 + 2
        fill = (d % 256, n % 256, d * 13 % 256)
        arr = np.empty((h, w, 3), dtype=np.uint8)
        arr[:, :] = fill
        arr[0, 0] = tuple(255 - v for v in fill)
        return codecs.encode_tiff(
            arr,
            packbits=d % 2 == 1,
            rows_per_strip=2 if d % 3 == 0 else None,
            big_endian=d % 5 == 0,
        )

    return _asset_frame(documents, build, "image/tiff")


def documents_as_png_assets(documents: DataFrame) -> DataFrame:
    """Synthesize REAL PNG payloads deterministically from document columns
    (mirror of documents_as_image_assets for the PNG path).

    Per doc: width = doc_id%11+2, height = doc_id%5+2, RGB for even doc_id
    and RGBA for odd (both supported color types), scanline filter
    doc_id%5 (all five filter paths decode in-pipeline), fill color
    (doc_id%256, n_chars%256, doc_id*7%256) with pixel (0,0) RGB-inverted,
    constant alpha doc_id*11%256. Every decoded property is predictable
    from (doc_id, n_chars) — i.e. SQL-oracle-able — while the bytes still
    take the full chunk-parse → zlib → unfilter path."""

    def build(d, n):
        import numpy as np

        from weather_api_automate_etl_spark.sources import codecs

        w, h = d % 11 + 2, d % 5 + 2
        r, g, b = d % 256, n % 256, d * 7 % 256
        bpp = 3 if d % 2 == 0 else 4
        px = np.empty((h, w, bpp), dtype=np.uint8)
        px[:, :, :3] = (r, g, b)
        if bpp == 4:
            px[:, :, 3] = d * 11 % 256
        px[0, 0, :3] = (255 - r, 255 - g, 255 - b)
        return codecs.encode_png(px, filter_type=d % 5)

    return _asset_frame(documents, build, "image/png")


def documents_as_interlaced_png_assets(documents: DataFrame) -> DataFrame:
    """Adam7-interlaced sibling of ``documents_as_png_assets``: identical
    deterministic per-doc parameters (dims, color types, all five
    scanline filters, inverted first pixel) but every payload is written
    with ``interlace=True`` — seven independently-filtered reduced
    passes, with the 2..12 × 2..6 dims guaranteeing empty-pass omission
    is exercised in-pipeline (a w=2 image has no pass-2 pixels at all).
    A decoder that ignored the interlace flag, merged pass filters, or
    scattered a pass on the wrong grid moves pixels — caught by the
    first-pixel and mean checks in the oracle."""

    def build(d, n):
        import numpy as np

        from weather_api_automate_etl_spark.sources import codecs

        w, h = d % 11 + 2, d % 5 + 2
        r, g, b = d % 256, n % 256, d * 7 % 256
        bpp = 3 if d % 2 == 0 else 4
        px = np.empty((h, w, bpp), dtype=np.uint8)
        px[:, :, :3] = (r, g, b)
        if bpp == 4:
            px[:, :, 3] = d * 11 % 256
        px[0, 0, :3] = (255 - r, 255 - g, 255 - b)
        return codecs.encode_png(px, filter_type=d % 5, interlace=True)

    return _asset_frame(documents, build, "image/png")


def _jpeg_expected_pixels(doc_id: int) -> "np.ndarray":  # noqa: F821
    """The deterministic pre-encode image for doc_id: block-aligned dims
    (w = (doc_id%3+1)*8, h = (doc_id%2+1)*8), each 8x8 block solid with a
    block-index-derived RGB. Solid blocks put all signal in the DC
    coefficient, so quality-90 reconstruction error is bounded by DC
    quantization alone (≤ ~1 level per channel) — the contract
    jpeg_stats hashes. Single definition shared by the encoder side and
    the verification side."""
    import numpy as np

    w, h = (doc_id % 3 + 1) * 8, (doc_id % 2 + 1) * 8
    px = np.empty((h, w, 3), dtype=np.uint8)
    for by in range(h // 8):
        for bx in range(w // 8):
            bi = by * (w // 8) + bx
            px[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = (
                (doc_id + 29 * bi) % 256,
                (doc_id * 13 + 17 * bi) % 256,
                (doc_id * 7 + 11 * bi) % 256,
            )
    return px


def documents_as_jpeg_assets(documents: DataFrame) -> DataFrame:
    """Synthesize REAL baseline-JFIF JPEG payloads deterministically from
    doc_id (the lossy-codec sibling of documents_as_png_assets; image
    defined by _jpeg_expected_pixels). The bytes take the full marker
    parse → DHT/DQT build → Huffman entropy decode → dequant → IDCT →
    color-convert path on decode."""

    def build(d):
        from weather_api_automate_etl_spark.sources import codecs

        return codecs.encode_jpeg(_jpeg_expected_pixels(d), quality=90)

    return _asset_frame(documents, build, "image/jpeg", cols=("doc_id",))


def _jpeg_progressive_pixels(doc_id: int) -> "np.ndarray":  # noqa: F821
    """Deterministic pre-encode image for the progressive query:
    NON-block-aligned dims (w = (doc_id%3+1)*8 + doc_id%7,
    h = (doc_id%2+1)*8 + doc_id%5 — exercising edge-replication padding)
    and gradient+checkerboard content with real AC energy in every
    block, so every progressive scan kind (AC first, both refinement
    rounds, EOB runs, ZRL-with-history) carries live bits — a solid
    fixture would leave the AC paths trivially empty."""
    import numpy as np

    w = (doc_id % 3 + 1) * 8 + doc_id % 7
    h = (doc_id % 2 + 1) * 8 + doc_id % 5
    yy, xx = np.mgrid[0:h, 0:w]
    chk = ((yy // 2 + xx // 2) % 2) * 96
    return np.stack(
        [
            (yy * 7 + xx * 3 + doc_id) % 256,
            (yy * 2 + xx * 11 + chk) % 256,
            ((yy + xx) * 5 + doc_id * 13) % 256,
        ],
        axis=-1,
    ).astype(np.uint8)


def documents_as_progressive_jpeg_assets(documents: DataFrame) -> DataFrame:
    """Synthesize REAL progressive (SOF2) JFIF payloads deterministically
    from doc_id (codecs.py::encode_jpeg_progressive — the full Annex-G
    scan script: spectral selection + successive approximation)."""

    def build(d):
        from weather_api_automate_etl_spark.sources import codecs

        return codecs.encode_jpeg_progressive(
            _jpeg_progressive_pixels(d), quality=75
        )

    return _asset_frame(documents, build, "image/jpeg", cols=("doc_id",))


PROG_JPEG_STATS_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_channels", T.IntegerType()),
        T.StructField("n_blocks", T.IntegerType()),
        T.StructField("exact_match", T.BooleanType()),
    ]
)


def progressive_jpeg_stats(assets: DataFrame) -> DataFrame:
    """REAL progressive JPEG decode → per-image stats via Arrow-batched
    mapInPandas. The contract hashed here is EXACT (stronger than the
    baseline query's ±2 bound): a progressive stream entropy-codes the
    same quantized coefficients as the baseline stream of the same
    image, so ``decode(progressive) == decode(baseline)`` bit-for-bit —
    any defect in the multi-scan state (EOB runs, refinement bits,
    band boundaries, DC point transform) breaks pixel equality, which
    flips ``exact_match`` and breaks the hash."""

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:  # noqa: F821
        import numpy as np
        import pandas as pd

        from weather_api_automate_etl_spark.sources import codecs

        for pdf in batches:
            out = {k: [] for k in PROG_JPEG_STATS_SCHEMA.fieldNames()}
            for aid, content in zip(pdf["asset_id"], pdf["content"]):
                arr = codecs.decode_jpeg(bytes(content))
                baseline = codecs.decode_jpeg(
                    codecs.encode_jpeg(
                        _jpeg_progressive_pixels(int(aid)), quality=75
                    )
                )
                out["asset_id"].append(aid)
                out["width"].append(arr.shape[1])
                out["height"].append(arr.shape[0])
                out["n_channels"].append(arr.shape[2])
                out["n_blocks"].append(
                    -(-arr.shape[1] // 8) * -(-arr.shape[0] // 8)
                )
                out["exact_match"].append(bool(np.array_equal(arr, baseline)))
            yield pd.DataFrame(out)

    return assets.mapInPandas(run, PROG_JPEG_STATS_SCHEMA)


JPEG_STATS_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_channels", T.IntegerType()),
        T.StructField("n_blocks", T.IntegerType()),
        T.StructField("recon_ok", T.BooleanType()),
    ]
)


def jpeg_stats(assets: DataFrame) -> DataFrame:
    """REAL JPEG decode → per-image stats via Arrow-batched mapInPandas.

    JPEG is lossy, so exact pixel values are codec-noise; what IS exact —
    and what the driver hashes — is the structure (dims, channels, block
    count) plus the reconstruction CONTRACT: max |decoded − original| ≤ 2
    levels for the solid-block fixtures (DC-only quantization error at
    quality 90; the expected image is regenerated from asset_id via the
    shared _jpeg_expected_pixels definition). A decoder defect — wrong
    dequant table, zigzag slip, IDCT scale, color-matrix error, DC
    prediction bug — blows the ±2 bound immediately."""

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:  # noqa: F821
        import numpy as np
        import pandas as pd

        from weather_api_automate_etl_spark.sources import codecs

        for pdf in batches:
            out = {k: [] for k in JPEG_STATS_SCHEMA.fieldNames()}
            for aid, content in zip(pdf["asset_id"], pdf["content"]):
                arr = codecs.decode_jpeg(bytes(content))
                expected = _jpeg_expected_pixels(int(aid))
                err = int(
                    np.abs(
                        arr.astype(np.int16) - expected.astype(np.int16)
                    ).max()
                )
                out["asset_id"].append(aid)
                out["width"].append(arr.shape[1])
                out["height"].append(arr.shape[0])
                out["n_channels"].append(arr.shape[2])
                out["n_blocks"].append((arr.shape[1] // 8) * (arr.shape[0] // 8))
                out["recon_ok"].append(err <= 2)
            yield pd.DataFrame(out)

    return assets.mapInPandas(run, JPEG_STATS_SCHEMA)


PNG_STATS_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_channels", T.IntegerType()),
        T.StructField("mean_r", T.DoubleType()),
        T.StructField("first_px_r", T.IntegerType()),
        T.StructField("first_px_g", T.IntegerType()),
        T.StructField("first_px_b", T.IntegerType()),
        T.StructField("first_px_a", T.IntegerType()),
    ]
)


def png_stats(assets: DataFrame) -> DataFrame:
    """REAL PNG decode → per-image stats via Arrow-batched ``mapInPandas``.

    Location-sensitive (first pixel) and value-sensitive (channel mean)
    stats, plus channel count, so a decode defect — wrong filter
    reconstruction, row order, channel order, or alpha handling — cannot
    cancel out. RGB images report alpha 255 (opaque)."""

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:  # noqa: F821
        import pandas as pd

        from weather_api_automate_etl_spark.sources import codecs

        for pdf in batches:
            out = {k: [] for k in PNG_STATS_SCHEMA.fieldNames()}
            for aid, content in zip(pdf["asset_id"], pdf["content"]):
                arr = codecs.decode_png(bytes(content))
                out["asset_id"].append(aid)
                out["width"].append(arr.shape[1])
                out["height"].append(arr.shape[0])
                out["n_channels"].append(arr.shape[2])
                out["mean_r"].append(round(float(arr[:, :, 0].mean()), 6))
                out["first_px_r"].append(int(arr[0, 0, 0]))
                out["first_px_g"].append(int(arr[0, 0, 1]))
                out["first_px_b"].append(int(arr[0, 0, 2]))
                out["first_px_a"].append(
                    int(arr[0, 0, 3]) if arr.shape[2] == 4 else 255
                )
            yield pd.DataFrame(out)

    return assets.mapInPandas(run, PNG_STATS_SCHEMA)


def documents_as_wav_assets(documents: DataFrame) -> DataFrame:
    """Synthesize REAL RIFF/PCM-16 WAV payloads deterministically from
    document columns (the audio twin of documents_as_png_assets).

    Per doc: channels = 1 + doc_id%2 (mono/stereo alternating),
    n_frames = doc_id%50 + 10, sample_rate = 8000 + (doc_id%3)*4000,
    interleaved sample k = (doc_id*31 + k*7) % 65536 - 32768. Every
    decoded property is an integer function of doc_id — SQL-oracle-able —
    while the bytes take the full RIFF chunk-walk + PCM parse."""

    def build(d):
        import numpy as np

        from weather_api_automate_etl_spark.sources import codecs

        n_ch = 1 + d % 2
        n_frames = d % 50 + 10
        rate = 8000 + (d % 3) * 4000
        k = np.arange(n_frames * n_ch, dtype=np.int64)
        flat = (d * 31 + k * 7) % 65536 - 32768
        return codecs.encode_wav(
            flat.astype(np.int16).reshape(n_frames, n_ch), rate
        )

    return _asset_frame(documents, build, "audio/wav", cols=("doc_id",))


WAV_STATS_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType()),
        T.StructField("n_frames", T.IntegerType()),
        T.StructField("n_channels", T.IntegerType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("first_sample", T.IntegerType()),
        T.StructField("mean_sample", T.DoubleType()),
        T.StructField("max_sample", T.IntegerType()),
    ]
)


def wav_stats(assets: DataFrame) -> DataFrame:
    """REAL WAV decode → per-clip stats via Arrow-batched ``mapInPandas``:
    frame/channel/rate metadata plus location-sensitive (first interleaved
    sample) and value-sensitive (mean, max) amplitude stats, so a header
    mis-parse or sample-order defect cannot cancel out."""

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:  # noqa: F821
        import pandas as pd

        from weather_api_automate_etl_spark.sources import codecs

        for pdf in batches:
            out = {k: [] for k in WAV_STATS_SCHEMA.fieldNames()}
            for aid, content in zip(pdf["asset_id"], pdf["content"]):
                frames, rate = codecs.decode_wav(bytes(content))
                out["asset_id"].append(aid)
                out["n_frames"].append(frames.shape[0])
                out["n_channels"].append(frames.shape[1])
                out["sample_rate"].append(rate)
                out["first_sample"].append(int(frames[0, 0]))
                out["mean_sample"].append(round(float(frames.mean()), 6))
                out["max_sample"].append(int(frames.max()))
            yield pd.DataFrame(out)

    return assets.mapInPandas(run, WAV_STATS_SCHEMA)


def documents_as_avi_assets(documents: DataFrame) -> DataFrame:
    """Synthesize REAL uncompressed-DIB AVI payloads deterministically from
    document columns (the video member of the PNG/WAV generator family).

    Per doc: n_frames = doc_id%6+2, width = doc_id%7+2 (odd widths
    exercise DIB row padding), height = doc_id%4+2, fps = 5+(doc_id%3)*5;
    frame f fills (doc_id+f*11, doc_id*3+f*17, doc_id*7+f*23) % 256 with
    pixel (0,0) RGB-inverted — per-frame location- and value-sensitive,
    and every decoded property an integer function of (doc_id, f)."""

    def build(d):
        import numpy as np

        from weather_api_automate_etl_spark.sources import codecs

        nf, w, h = d % 6 + 2, d % 7 + 2, d % 4 + 2
        fps = 5 + (d % 3) * 5
        frames = np.empty((nf, h, w, 3), dtype=np.uint8)
        for f in range(nf):
            r = (d + f * 11) % 256
            g = (d * 3 + f * 17) % 256
            b = (d * 7 + f * 23) % 256
            frames[f, :, :] = (r, g, b)
            frames[f, 0, 0] = (255 - r, 255 - g, 255 - b)
        return codecs.encode_avi(frames, fps=fps)

    return _asset_frame(documents, build, "video/x-msvideo", cols=("doc_id",))


VIDEO_FRAME_STATS_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("fps", T.IntegerType()),
        T.StructField("mean_r", T.DoubleType()),
        T.StructField("first_px_r", T.IntegerType()),
        T.StructField("first_px_g", T.IntegerType()),
        T.StructField("first_px_b", T.IntegerType()),
    ]
)


def video_frame_stats(assets: DataFrame, every_nth: int = 2) -> DataFrame:
    """REAL video decode + frame sampling via Arrow ``mapInPandas``: decode
    the AVI, keep every n-th frame, emit per-frame location/value stats —
    the real-codec version of :func:`frame_sample`'s stubbed plumbing.
    One output row per sampled frame; payload bytes never leave the
    executor."""

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:  # noqa: F821
        import pandas as pd

        from weather_api_automate_etl_spark.sources import codecs

        for pdf in batches:
            out = {k: [] for k in VIDEO_FRAME_STATS_SCHEMA.fieldNames()}
            for aid, content in zip(pdf["asset_id"], pdf["content"]):
                frames, fps = codecs.decode_avi(bytes(content))
                for idx in range(0, frames.shape[0], every_nth):
                    fr = frames[idx]
                    out["asset_id"].append(aid)
                    out["frame_idx"].append(idx)
                    out["width"].append(fr.shape[1])
                    out["height"].append(fr.shape[0])
                    out["fps"].append(fps)
                    out["mean_r"].append(round(float(fr[:, :, 0].mean()), 6))
                    out["first_px_r"].append(int(fr[0, 0, 0]))
                    out["first_px_g"].append(int(fr[0, 0, 1]))
                    out["first_px_b"].append(int(fr[0, 0, 2]))
            yield pd.DataFrame(out)

    return assets.mapInPandas(run, VIDEO_FRAME_STATS_SCHEMA)


IMAGE_STATS_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("mean_r", T.DoubleType()),
        T.StructField("first_px_r", T.IntegerType()),
        T.StructField("first_px_g", T.IntegerType()),
        T.StructField("first_px_b", T.IntegerType()),
    ]
)


def image_stats(assets: DataFrame) -> DataFrame:
    """REAL decode → per-image stats, via Arrow-batched ``mapInPandas``.

    Exercises the full pure-NumPy codec path: header parse, BMP stride
    padding + bottom-up row order + BGR swap, raster reshape. Stats are
    location-sensitive (first pixel) and value-sensitive (channel mean),
    so a decode bug cannot cancel out."""

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:  # noqa: F821
        import pandas as pd

        from weather_api_automate_etl_spark.sources import codecs

        for pdf in batches:
            out = {k: [] for k in IMAGE_STATS_SCHEMA.fieldNames()}
            for aid, mt, content in zip(pdf["asset_id"], pdf["media_type"], pdf["content"]):
                arr = codecs.decode_image(bytes(content))
                out["asset_id"].append(aid)
                out["media_type"].append(mt)
                out["width"].append(arr.shape[1])
                out["height"].append(arr.shape[0])
                out["mean_r"].append(round(float(arr[:, :, 0].mean()), 6))
                out["first_px_r"].append(int(arr[0, 0, 0]))
                out["first_px_g"].append(int(arr[0, 0, 1]))
                out["first_px_b"].append(int(arr[0, 0, 2]))
            yield pd.DataFrame(out)

    return assets.mapInPandas(run, IMAGE_STATS_SCHEMA)


def _fake_decode(media_type: str, payload: bytes) -> tuple[int, int, int]:
    """Deterministic stand-in for a codec: dimensions derived from payload
    length. Mirrorable in SQL, so the Spark plumbing is oracle-checkable."""
    n = len(payload)
    return (n % 64 + 1, n % 48 + 1, n % 16 if media_type == "video/mp4" else 1)


def extract_features(assets: DataFrame, decode_stub: bool = True) -> DataFrame:
    """Decode + feature-extract via Arrow-batched ``mapInPandas``.

    ``decode_stub=False`` runs the real pure-NumPy decoder for PPM/BMP
    payloads (codecs.py); other media still raise ``NotImplementedError``
    (the PIL/ffmpeg plug point, absent in this container)."""

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:  # noqa: F821
        import pandas as pd

        for pdf in batches:
            if not decode_stub:
                from weather_api_automate_etl_spark.sources import codecs

                def real(payload: bytes) -> tuple[int, int, int]:
                    arr = codecs.decode_image(payload)
                    return (arr.shape[1], arr.shape[0], 1)

                dims = [real(bytes(c)) for c in pdf["content"]]
            else:
                dims = [
                    _fake_decode(m, bytes(c))
                    for m, c in zip(pdf["media_type"], pdf["content"])
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
    re-encode per batch.

    ``decode_stub=True``: the fake 'resized' payload is a deterministic
    truncation/pad of the source bytes to target_w*target_h, so batch
    shape, schema, and byte accounting are real and testable.
    ``decode_stub=False``: REAL decode (PPM/BMP, codecs.py) →
    nearest-neighbor resample → re-encode as binary PPM."""

    def _fake_resize(payload: bytes) -> bytes:
        n = target_w * target_h
        return bytes(payload[:n]).ljust(n, b"\0")

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:  # noqa: F821
        import pandas as pd

        for pdf in batches:
            if not decode_stub:
                from weather_api_automate_etl_spark.sources import codecs

                out = [
                    codecs.encode_ppm(
                        codecs.resize_nearest(
                            codecs.decode_image(bytes(c)), target_w, target_h
                        )
                    )
                    for c in pdf["content"]
                ]
                # the real path re-encodes as PPM: report the OUTPUT format,
                # not the source's (metadata must describe the bytes)
                mts = ["image/x-portable-pixmap"] * len(out)
            else:
                out = [_fake_resize(bytes(c)) for c in pdf["content"]]
                mts = pdf["media_type"]
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "media_type": mts,
                    "width": target_w,
                    "height": target_h,
                    "content": out,
                    "byte_len": [len(b) for b in out],
                }
            )

    return assets.mapInPandas(run, RESIZE_SCHEMA)


#: dHash operates on a fixed (w+1) x h grid: 8 horizontal-gradient bits
#: per row, 8 rows = a 64-bit perceptual fingerprint (16 hex chars).
DHASH_W, DHASH_H = 9, 8

DHASH_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType()),
        T.StructField("dhash", T.StringType()),
    ]
)


def documents_as_gradient_assets(documents: DataFrame) -> DataFrame:
    """Synthesize REAL binary-PPM payloads with a linear luminance
    gradient — px(x, y) = (a*x + b*y + s) % 256 on all three channels,
    with slopes a = (doc_id%5)*48+16, b = (doc_id%3)*37+11 and phase
    s = (doc_id%16)*16 — sized exactly (DHASH_W x DHASH_H) so the
    perceptual-hash grid IS the image grid and every dHash bit is
    predictable in closed form (the bit is 0 exactly when the +a step
    wraps mod 256; slopes span 16..208 so wraps are frequent and the
    hashes are bit-diverse). The parameters cycle with period
    lcm(5,3,16) = 240 over doc_id, so distinct documents land in 240
    byte-identical classes — the perceptual-duplicate structure the
    dHash query groups on."""

    def build(d):
        import numpy as np

        from weather_api_automate_etl_spark.sources import codecs

        a = (d % 5) * 48 + 16
        b = (d % 3) * 37 + 11
        s = (d % 16) * 16
        xs = np.arange(DHASH_W, dtype=np.int64)
        ys = np.arange(DHASH_H, dtype=np.int64)
        v = ((a * xs[None, :] + b * ys[:, None] + s) % 256).astype(np.uint8)
        return codecs.encode_ppm(np.repeat(v[:, :, None], 3, axis=2))

    return _asset_frame(
        documents, build, "image/x-portable-pixmap", cols=("doc_id",)
    )


def image_dhash(assets: DataFrame) -> DataFrame:
    """Difference hash (dHash), the classic perceptual image fingerprint:
    decode, reduce to the DHASH_W x DHASH_H luminance grid, and emit one
    bit per horizontal neighbor pair — bit(x, y) = 1 iff px(x+1, y) >
    px(x, y) — packed row-major, MSB-first into a 16-hex-char string.
    Near-duplicate images (re-encodes, small edits) land within a few
    bits of each other; exact perceptual duplicates collide outright, so
    grouping by the hash is the image-side analogue of exact text dedup
    and Hamming-banding the hash (q_simhash_pairs' pigeonhole trick)
    gives the near-dup join. Inputs wider than the grid are box-reduced
    first (mean over cells) — standard dHash; the gradient fixtures are
    generated AT grid size so the reduction is the identity there.

    Arrow-batched ``mapInPandas`` decode (payload bytes never leave the
    executor) followed by plain relational grouping — scan-rate at any
    corpus size, state O(1) per image."""

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:  # noqa: F821
        import numpy as np
        import pandas as pd

        from weather_api_automate_etl_spark.sources import codecs

        for pdf in batches:
            out = {k: [] for k in DHASH_SCHEMA.fieldNames()}
            for aid, content in zip(pdf["asset_id"], pdf["content"]):
                arr = codecs.decode_image(bytes(content))
                gray = arr.astype(np.float64).mean(axis=2)
                h, w = gray.shape
                if (h, w) != (DHASH_H, DHASH_W):
                    # box-reduce to the grid: mean over equal cell spans,
                    # clamped to >= 1 pixel — sub-grid inputs would yield
                    # zero-width cells whose NaN mean silently zeroes every
                    # bit (nearest-sample upscale; identity at grid size)
                    ys = (np.arange(DHASH_H + 1) * h) // DHASH_H
                    xs = (np.arange(DHASH_W + 1) * w) // DHASH_W
                    gray = np.array(
                        [
                            [
                                gray[
                                    min(ys[j], h - 1):max(ys[j + 1], ys[j] + 1),
                                    min(xs[i], w - 1):max(xs[i + 1], xs[i] + 1),
                                ].mean()
                                for i in range(DHASH_W)
                            ]
                            for j in range(DHASH_H)
                        ]
                    )
                bits = gray[:, 1:] > gray[:, :-1]
                row_bytes = (bits << np.arange(7, -1, -1)).sum(axis=1)
                out["asset_id"].append(int(aid))
                out["dhash"].append("".join(f"{int(rb):02x}" for rb in row_bytes))
            yield pd.DataFrame(out)

    return assets.mapInPandas(run, DHASH_SCHEMA)


AUDIO_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType()),
        T.StructField("win_id", T.IntegerType()),
        T.StructField("n_samp", T.IntegerType()),
        T.StructField("rms", T.DoubleType()),
        T.StructField("zcr", T.IntegerType()),
    ]
)


def audio_frame_features(assets: DataFrame, win: int = 8) -> DataFrame:
    """Frame-level audio features over REAL decoded PCM — the standard
    first stage of any audio pipeline (VAD gating, silence trimming,
    clip-quality filtering before an audio corpus ships): decode the WAV
    (sources/codecs.py — RIFF chunk walk, PCM-16 parse), mix down to
    mono (per-frame channel mean), window into fixed ``win``-frame
    blocks, and emit per window the RMS energy and the zero-crossing
    count (strict sign flips between consecutive mono frames INSIDE the
    window — no cross-window pairs, so windows are embarrassingly
    independent). The trailing partial window is kept with its true
    ``n_samp``, not padded (padding would fake low energy).

    Arrow-batched ``mapInPandas``: payload bytes never leave the
    executor, per-clip output is O(frames/win) small rows — scan-rate at
    any corpus size."""
    if win < 2:
        raise ValueError(f"audio_frame_features needs win >= 2, got {win}")

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:  # noqa: F821
        import numpy as np
        import pandas as pd

        from weather_api_automate_etl_spark.sources import codecs

        for pdf in batches:
            out = {k: [] for k in AUDIO_FEATURES_SCHEMA.fieldNames()}
            for aid, content in zip(pdf["asset_id"], pdf["content"]):
                frames, _rate = codecs.decode_wav(bytes(content))
                mono = frames.astype(np.float64).mean(axis=1)
                for w0 in range(0, len(mono), win):
                    seg = mono[w0:w0 + win]
                    out["asset_id"].append(int(aid))
                    out["win_id"].append(w0 // win)
                    out["n_samp"].append(len(seg))
                    out["rms"].append(
                        round(float(np.sqrt((seg * seg).mean())), 6)
                    )
                    out["zcr"].append(int((seg[1:] * seg[:-1] < 0).sum()))
            yield pd.DataFrame(out)

    return assets.mapInPandas(run, AUDIO_FEATURES_SCHEMA)
