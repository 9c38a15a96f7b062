"""Multimodal plumbing: asset schema, Arrow feature extraction, frame sampling."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql.utils import PythonException

from weather_api_automate_etl_spark.sources import multimodal
from weather_api_automate_etl_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def assets(spark):
    return multimodal.documents_as_assets(load_table(spark, SF, "documents"))


def test_asset_schema_and_bytes(spark, assets):
    row = assets.filter("asset_id = 0").head()
    assert row.media_type == "image/png"
    assert isinstance(row.content, bytearray | bytes)
    assert row.byte_len == len(row.content)


def test_feature_extraction_deterministic(spark, assets):
    feats = multimodal.extract_features(assets)
    a = {r.asset_id: (r.width, r.height, r.n_frames) for r in feats.collect()}
    b = {r.asset_id: (r.width, r.height, r.n_frames) for r in feats.collect()}
    assert a == b and len(a) == assets.count()
    # stub decode arithmetic: width = byte_len % 64 + 1
    raw = {r.asset_id: r.byte_len for r in assets.collect()}
    assert all(a[k][0] == raw[k] % 64 + 1 for k in a)


def test_real_decode_path_is_stubbed(spark, assets):
    with pytest.raises(PythonException, match="NotImplementedError"):
        multimodal.extract_features(assets, decode_stub=False).head()


def test_frame_sample_videos_only(spark, assets):
    sampled = multimodal.frame_sample(assets, every_nth=4)
    rows = sampled.collect()
    feats = {
        r.asset_id: r.n_frames
        for r in multimodal.extract_features(assets)
        .filter("media_type = 'video/mp4'")
        .collect()
    }
    assert {r.asset_id for r in rows} <= set(feats)
    assert all(r.frame_idx % 4 == 0 for r in rows)
    # index stays inside the frame space; zero-frame videos emit nothing
    assert all(0 <= r.frame_idx < feats[r.asset_id] for r in rows)
    zero_frame = {k for k, v in feats.items() if v == 0}
    assert zero_frame.isdisjoint({r.asset_id for r in rows})


def test_resize_stub_shapes_and_bytes(spark):
    from weather_api_automate_etl_spark.sources.multimodal import (
        documents_as_assets,
        resize,
    )
    from weather_api_automate_etl_spark.sources.tables import load_table

    assets = documents_as_assets(
        load_table(spark, "/root/testdata/sf0.001", "documents")
    )
    out = resize(assets, target_w=8, target_h=4).collect()
    assert len(out) == assets.count()
    for r in out:
        assert (r.width, r.height) == (8, 4)
        assert r.byte_len == 32 and len(r.content) == 32


def test_resize_without_stub_raises(spark):
    import pytest as _pytest

    from weather_api_automate_etl_spark.sources.multimodal import (
        documents_as_assets,
        resize,
    )
    from weather_api_automate_etl_spark.sources.tables import load_table

    assets = documents_as_assets(
        load_table(spark, "/root/testdata/sf0.001", "documents")
    )
    with _pytest.raises(Exception, match="NotImplementedError|resize"):
        resize(assets, decode_stub=False).collect()


# ---------------------------------------------------------------------------
# pure-NumPy codec (sources/codecs.py) — the non-stub decode tier
# ---------------------------------------------------------------------------


def _gradient(h, w):
    import numpy as np

    px = np.zeros((h, w, 3), dtype=np.uint8)
    px[:, :, 0] = np.arange(w, dtype=np.uint8)[None, :]
    px[:, :, 1] = np.arange(h, dtype=np.uint8)[:, None] * 3
    px[:, :, 2] = 200
    return px


def test_ppm_roundtrip_and_comment_header():
    import numpy as np

    from weather_api_automate_etl_spark.sources import codecs

    px = _gradient(5, 7)
    assert np.array_equal(codecs.decode_ppm(codecs.encode_ppm(px)), px)
    # tolerant header parse: comments + arbitrary whitespace (PPM spec)
    hdr = b"P6 # comment\n# another\n  7\t5\n255\n"
    assert np.array_equal(codecs.decode_ppm(hdr + px.tobytes()), px)


def test_bmp_roundtrip_including_row_padding():
    import numpy as np

    from weather_api_automate_etl_spark.sources import codecs

    # widths 2..6 cover all stride paddings (w*3 % 4 = 2,1,0,3,2)
    for w in range(2, 7):
        px = _gradient(4, w)
        payload = codecs.encode_bmp(px)
        assert payload[:2] == b"BM"
        assert np.array_equal(codecs.decode_bmp(payload), px), f"w={w}"


def test_decode_image_sniffs_magic_and_rejects_unknown():
    import numpy as np
    import pytest as _pytest

    from weather_api_automate_etl_spark.sources import codecs

    px = _gradient(3, 3)
    assert np.array_equal(codecs.decode_image(codecs.encode_ppm(px)), px)
    assert np.array_equal(codecs.decode_image(codecs.encode_bmp(px)), px)
    assert np.array_equal(codecs.decode_image(codecs.encode_png(px)), px)
    # JPEG and GIF route to the real decoders (rejecting garbage loudly);
    # magics beyond the pure-NumPy set remain the documented plug point
    # (PIL when installed, NotImplementedError otherwise — see
    # test_unknown_magic_without_pil_raises_not_implemented)
    with _pytest.raises(ValueError):
        codecs.decode_image(b"\xff\xd8\xff\xe0....")
    with _pytest.raises(ValueError):
        codecs.decode_image(b"GIF89a....")


def test_resize_nearest_exact_mapping():
    import numpy as np

    from weather_api_automate_etl_spark.sources import codecs

    px = np.array([[[0, 0, 0], [10, 10, 10]], [[20, 20, 20], [30, 30, 30]]], dtype=np.uint8)
    up = codecs.resize_nearest(px, 4, 4)
    # index map: target i -> source (i * 2) // 4 = [0, 0, 1, 1]
    want = px[[0, 0, 1, 1]][:, [0, 0, 1, 1]]
    assert np.array_equal(up, want)
    down = codecs.resize_nearest(up, 2, 2)
    assert np.array_equal(down, px)


def test_real_decode_and_resize_through_spark(spark):
    from weather_api_automate_etl_spark.sources.multimodal import (
        documents_as_image_assets,
        extract_features,
        image_stats,
        resize,
    )
    from weather_api_automate_etl_spark.sources.tables import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents").limit(40)
    assets = documents_as_image_assets(docs)
    # features through the REAL (non-stub) path: dims match the generator
    feats = {r.asset_id: (r.width, r.height) for r in
             extract_features(assets, decode_stub=False).collect()}
    for aid, (w, h) in feats.items():
        assert (w, h) == (aid % 13 + 2, aid % 7 + 2)
    # real resize: decode -> nearest-neighbor -> PPM re-encode
    out = resize(assets, target_w=8, target_h=6, decode_stub=False).collect()
    assert len(out) == len(feats)
    for r in out:
        assert (r.width, r.height) == (8, 6)
        assert bytes(r.content)[:2] == b"P6"
        assert r.byte_len == len(b"P6\n8 6\n255\n") + 8 * 6 * 3
    # the inverted (0,0) pixel survives nearest-neighbor resize at (0,0)
    stats = {r.asset_id: r for r in image_stats(assets).collect()}
    for aid, s in stats.items():
        assert s.first_px_r == 255 - aid % 256


def test_png_roundtrip_all_filters_both_color_types():
    import numpy as np

    from weather_api_automate_etl_spark.sources import codecs

    rng = np.random.default_rng(42)
    for bpp in (3, 4):
        for f in range(5):
            # (1,1) exercises the no-left/no-up edge; odd widths exercise
            # lane alignment in the per-lane prefix-sum Sub path
            for h, w in [(1, 1), (3, 5), (6, 4)]:
                px = rng.integers(0, 256, size=(h, w, bpp), dtype=np.uint8)
                got = codecs.decode_png(codecs.encode_png(px, filter_type=f))
                assert np.array_equal(got, px), f"bpp={bpp} filter={f} {h}x{w}"


def test_png_adam7_roundtrip_fuzz():
    """Adam7 interlace roundtrip across every pass-grid edge case:
    single-row/column images (most passes empty), dims below 8 (no
    pass-1 second pixel), dims straddling the 8×8 macro-tile, both
    color types, all five filters — and the sequential path stays
    intact beside it. 1,260 combos."""
    import itertools

    import numpy as np

    from weather_api_automate_etl_spark.sources import codecs

    rng = np.random.default_rng(7)
    for h, w, bpp, f in itertools.product(
        [1, 2, 3, 5, 7, 8, 9, 16, 23], [1, 2, 3, 5, 8, 13, 17], (3, 4), range(5)
    ):
        px = rng.integers(0, 256, size=(h, w, bpp), dtype=np.uint8)
        got = codecs.decode_png(codecs.encode_png(px, filter_type=f, interlace=True))
        assert np.array_equal(got, px), f"adam7 bpp={bpp} filter={f} {h}x{w}"
        got0 = codecs.decode_png(codecs.encode_png(px, filter_type=f))
        assert np.array_equal(got0, px), f"plain bpp={bpp} filter={f} {h}x{w}"


def test_png_adam7_stream_structure():
    """The interlaced stream is REALLY Adam7, not a tagged sequential
    raster: (a) the IHDR interlace flag is 1; (b) for an 8×8 image the
    inflated stream length equals the sum over the seven passes of
    ph·(1+pw·bpp) — not h·(1+w·bpp); (c) truncating the last pass fails
    loudly."""
    import struct as _struct
    import zlib as _zlib

    import numpy as np
    import pytest as _pytest

    from weather_api_automate_etl_spark.sources import codecs

    px = _gradient(8, 8)
    payload = codecs.encode_png(px, interlace=True)
    assert payload[8 + 8 + 12] == 1  # IHDR interlace byte
    # pull the IDAT stream back out and measure the pass layout
    pos, idat = 8, b""
    while pos + 8 <= len(payload):
        (length,) = _struct.unpack_from(">I", payload, pos)
        ctype = payload[pos + 4 : pos + 8]
        if ctype == b"IDAT":
            idat += payload[pos + 8 : pos + 8 + length]
        pos += 12 + length
    raster = _zlib.decompress(idat)
    expect = sum(
        ((8 - y0 + dy - 1) // dy) * (1 + ((8 - x0 + dx - 1) // dx) * 3)
        for x0, y0, dx, dy in codecs.ADAM7_PASSES
        if (8 - x0 + dx - 1) // dx > 0 and (8 - y0 + dy - 1) // dy > 0
    )
    assert len(raster) == expect != 8 * (1 + 8 * 3)
    # truncated final pass must be a loud error
    bad = _zlib.compress(raster[:-4], 6)
    trunc = (
        codecs.PNG_SIG
        + payload[8 : 8 + 25]  # original IHDR chunk (len+type+13+crc)
        + codecs._png_chunk(b"IDAT", bad)
        + codecs._png_chunk(b"IEND", b"")
    )
    with _pytest.raises(ValueError, match="Adam7|truncated"):
        codecs.decode_png(trunc)


def test_png_rejects_unsupported_and_corrupt():
    import numpy as np
    import pytest as _pytest

    from weather_api_automate_etl_spark.sources import codecs

    px = _gradient(3, 4)
    payload = bytearray(codecs.encode_png(px))
    # flip a raster byte inside IDAT: CRC must catch it
    payload[len(payload) - 20] ^= 0xFF
    with _pytest.raises(ValueError, match="CRC"):
        codecs.decode_png(bytes(payload))
    with _pytest.raises(ValueError, match="not a PNG"):
        codecs.decode_png(b"nope")
    # 16-bit depth is out of scope and must say so, not mis-decode
    good = codecs.encode_png(px)
    ihdr_off = 8 + 8  # sig + len/type
    bad_depth = bytearray(good)
    bad_depth[ihdr_off + 8] = 16
    import struct as _struct
    import zlib as _zlib

    body = bytes(bad_depth[ihdr_off - 4 : ihdr_off + 13])
    bad_depth[ihdr_off + 13 : ihdr_off + 17] = _struct.pack(
        ">I", _zlib.crc32(body)
    )
    with _pytest.raises(ValueError, match="8-bit"):
        codecs.decode_png(bytes(bad_depth))


def test_png_spark_pipeline_stats(spark):
    from weather_api_automate_etl_spark.sources.multimodal import (
        documents_as_png_assets,
        png_stats,
    )
    from weather_api_automate_etl_spark.sources.tables import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents").limit(40)
    stats = {r.asset_id: r for r in png_stats(documents_as_png_assets(docs)).collect()}
    assert len(stats) == 40
    for aid, s in stats.items():
        assert (s.width, s.height) == (aid % 11 + 2, aid % 5 + 2)
        assert s.n_channels == (3 if aid % 2 == 0 else 4)
        assert s.first_px_r == 255 - aid % 256
        assert s.first_px_a == (255 if aid % 2 == 0 else aid * 11 % 256)


def test_wav_roundtrip_mono_stereo_and_chunk_walk():
    import struct as _struct

    import numpy as np
    import pytest as _pytest

    from weather_api_automate_etl_spark.sources import codecs

    rng = np.random.default_rng(3)
    for n_ch in (1, 2):
        for n_frames in (1, 7, 40):
            s = rng.integers(-32768, 32768, size=(n_frames, n_ch)).astype(np.int16)
            back, rate = codecs.decode_wav(codecs.encode_wav(s, 16000))
            assert rate == 16000
            assert np.array_equal(back, s), (n_ch, n_frames)
    # chunk walk tolerates extra (odd-length, word-padded) chunks before data
    s = rng.integers(-32768, 32768, size=(5, 1)).astype(np.int16)
    payload = codecs.encode_wav(s, 8000)
    fmt_end = 12 + 8 + 16
    extra = b"LIST" + _struct.pack("<I", 3) + b"abc" + b"\x00"  # padded odd chunk
    doctored = payload[:fmt_end] + extra + payload[fmt_end:]
    doctored = doctored[:4] + _struct.pack("<I", len(doctored) - 8) + doctored[8:]
    back, rate = codecs.decode_wav(doctored)
    assert rate == 8000 and np.array_equal(back, s)
    # compressed formats stay a loud plug point
    bad = bytearray(payload)
    bad[20] = 85  # fmt tag 0x0055 = MP3
    with _pytest.raises(ValueError, match="PCM-16"):
        codecs.decode_wav(bytes(bad))
    with _pytest.raises(ValueError, match="RIFF"):
        codecs.decode_wav(b"nope")


def test_codec_truncation_raises_never_shrinks():
    # review finding: a truncated payload must ERROR, not silently decode
    # to fewer frames/rows (the fail-loudly decoder contract)
    import struct as _struct

    import numpy as np
    import pytest as _pytest

    from weather_api_automate_etl_spark.sources import codecs

    s = np.arange(10, dtype=np.int16).reshape(5, 2)
    wav = codecs.encode_wav(s, 8000)
    with _pytest.raises(ValueError, match="truncated"):
        codecs.decode_wav(wav[:-4])
    # fmt chunk shorter than 16 bytes: ValueError, not struct.error
    short_fmt = (
        b"RIFF" + _struct.pack("<I", 14) + b"WAVE"
        + b"fmt " + _struct.pack("<I", 4) + b"\x01\x00\x01\x00"
        + b"data" + _struct.pack("<I", 0)
    )
    with _pytest.raises(ValueError, match="fmt"):
        codecs.decode_wav(short_fmt)
    # zero-channel fmt must reject, not reshape as mono
    bad_ch = bytearray(wav)
    bad_ch[22:24] = b"\x00\x00"
    with _pytest.raises(ValueError, match="channel"):
        codecs.decode_wav(bytes(bad_ch))
    png = codecs.encode_png(np.zeros((3, 3, 3), dtype=np.uint8))
    with _pytest.raises(ValueError, match="truncated"):
        codecs.decode_png(png[:-4])


def test_wav_spark_pipeline_stats(spark):
    from weather_api_automate_etl_spark.sources.multimodal import (
        documents_as_wav_assets,
        wav_stats,
    )
    from weather_api_automate_etl_spark.sources.tables import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents").limit(30)
    stats = {r.asset_id: r for r in wav_stats(documents_as_wav_assets(docs)).collect()}
    assert len(stats) == 30
    for aid, s in stats.items():
        assert s.n_channels == 1 + aid % 2
        assert s.n_frames == aid % 50 + 10
        assert s.sample_rate == 8000 + (aid % 3) * 4000
        assert s.first_sample == (aid * 31) % 65536 - 32768


def test_avi_roundtrip_and_rejections():
    import numpy as np
    import pytest as _pytest

    from weather_api_automate_etl_spark.sources import codecs

    rng = np.random.default_rng(9)
    # odd widths exercise DIB row padding; several frame counts
    for n, h, w in [(1, 2, 3), (5, 4, 5), (3, 2, 2)]:
        fr = rng.integers(0, 256, size=(n, h, w, 3), dtype=np.uint8)
        dec, fps = codecs.decode_avi(codecs.encode_avi(fr, fps=15))
        assert fps == 15 and np.array_equal(dec, fr), (n, h, w)
    good = codecs.encode_avi(rng.integers(0, 256, size=(2, 3, 3, 3), dtype=np.uint8))
    with _pytest.raises(ValueError, match="truncated"):
        codecs.decode_avi(good[:-5])
    with _pytest.raises(ValueError, match="RIFF/AVI"):
        codecs.decode_avi(b"RIFF....WAVE")
    # compressed streams (e.g. MJPG fourcc in strf.biCompression) reject
    import struct as _struct

    strf_off = good.find(b"strf") + 8
    bad = bytearray(good)
    bad[strf_off + 16 : strf_off + 20] = b"MJPG"
    with _pytest.raises(ValueError, match="uncompressed"):
        codecs.decode_avi(bytes(bad))
    with _pytest.raises(ValueError, match="fps"):
        codecs.encode_avi(rng.integers(0, 256, size=(1, 2, 2, 3), dtype=np.uint8), fps=0)
    # top-down DIB (negative biHeight): rows must NOT be flipped
    fr = rng.integers(0, 256, size=(1, 4, 3, 3), dtype=np.uint8)
    td = bytearray(codecs.encode_avi(fr, fps=10))
    h_off = td.find(b"strf") + 8 + 8  # strf data + biWidth
    (h_val,) = _struct.unpack_from("<i", td, h_off)
    _struct.pack_into("<i", td, h_off, -h_val)
    flipped, _ = codecs.decode_avi(bytes(td))
    # the payload rows were written bottom-up; declaring top-down means
    # the decoder must return them in storage order = vertically flipped
    assert np.array_equal(flipped[0], fr[0][::-1])


def test_video_frame_stats_through_spark(spark):
    from weather_api_automate_etl_spark.sources.multimodal import (
        documents_as_avi_assets,
        video_frame_stats,
    )
    from weather_api_automate_etl_spark.sources.tables import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents").limit(20)
    rows = video_frame_stats(documents_as_avi_assets(docs), every_nth=2).collect()
    by_asset: dict[int, list] = {}
    for r in rows:
        by_asset.setdefault(r.asset_id, []).append(r)
    assert len(by_asset) == 20
    for aid, frs in by_asset.items():
        nf = aid % 6 + 2
        assert sorted(r.frame_idx for r in frs) == list(range(0, nf, 2))
        for r in frs:
            assert (r.width, r.height) == (aid % 7 + 2, aid % 4 + 2)
            assert r.fps == 5 + (aid % 3) * 5
            assert r.first_px_r == 255 - (aid + r.frame_idx * 11) % 256


def test_ppm_comment_terminates_token():
    # the PPM spec lets a comment butt directly against a header token
    import numpy as np

    from weather_api_automate_etl_spark.sources import codecs

    px = _gradient(2, 2)
    payload = b"P6\n2 2 255# trailing comment\n" + px.tobytes()
    assert np.array_equal(codecs.decode_ppm(payload), px)


def test_jpeg_roundtrip_solid_blocks_exact_and_lossy_bounded():
    import numpy as np

    from weather_api_automate_etl_spark.sources import codecs
    from weather_api_automate_etl_spark.sources.multimodal import (
        _jpeg_expected_pixels,
    )

    # solid 8x8 blocks: all signal in DC, quality-90 DC quant is exact for
    # these levels -> byte-identical reconstruction
    for d in (0, 1, 5, 11, 37, 254):
        px = _jpeg_expected_pixels(d)
        dec = codecs.decode_jpeg(codecs.encode_jpeg(px, quality=90))
        assert dec.shape == px.shape
        assert int(np.abs(dec.astype(int) - px.astype(int)).max()) <= 2
    # non-block-aligned dims (edge-replication padding) and gradients:
    # lossy but bounded, dims preserved exactly
    for h, w in [(1, 1), (5, 9), (17, 23), (31, 2)]:
        base = (np.indices((h, w)).sum(axis=0) * 9 % 256).astype(np.uint8)
        px = np.stack([base, base * 3 % 256, base * 7 % 256], axis=-1)
        dec = codecs.decode_jpeg(codecs.encode_jpeg(px.astype(np.uint8)))
        assert dec.shape == (h, w, 3)
        assert int(np.abs(dec.astype(int) - px.astype(int)).max()) <= 40


def test_jpeg_decoder_reads_tables_from_file_and_rejects_unsupported():
    import struct as _struct

    import numpy as np
    import pytest as _pytest

    from weather_api_automate_etl_spark.sources import codecs

    px = np.full((8, 8, 3), 77, dtype=np.uint8)
    payload = codecs.encode_jpeg(px, quality=75)

    # decoder must use the FILE's quant tables: re-encoding at a different
    # quality still round-trips (different DQT in the stream)
    assert codecs.decode_jpeg(payload).shape == (8, 8, 3)

    # not a JPEG
    with _pytest.raises(ValueError, match="SOI"):
        codecs.decode_jpeg(b"\x00\x01rubbish")
    # SOF2 decodes since round 10 — but a relabeled baseline stream is
    # MALFORMED progressive (its full-band Ss=0/Se=63 scan header is
    # illegal per G.1.1: a progressive DC scan needs Se=0), and the
    # decoder must say so rather than misread the entropy data
    prog = bytearray(payload)
    i = prog.find(b"\xff\xc0")
    prog[i + 1] = 0xC2
    with _pytest.raises(ValueError, match="Se=0"):
        codecs.decode_jpeg(bytes(prog))
    # progressive-only frame types stay rejected
    lossless = bytearray(payload)
    lossless[i + 1] = 0xC3
    with _pytest.raises(ValueError, match="SOF0/SOF2"):
        codecs.decode_jpeg(bytes(lossless))
    # subsampled files are outside the supported subset
    sub = bytearray(payload)
    sof_at = sub.find(b"\xff\xc0")
    # component 1 sampling byte: SOF0 payload = len(2) P(1) H(2) W(2) Nc(1),
    # then [cid, samp, tq] triples
    sub[sof_at + 2 + 2 + 1 + 2 + 2 + 1 + 1] = 0x22
    with _pytest.raises(ValueError, match="subsampling"):
        codecs.decode_jpeg(bytes(sub))
    # truncation fuzz: every cut either raises ValueError or (for cuts
    # past the entropy data) still decodes full dims — never a short image
    for cut in range(2, len(payload) - 1, 3):
        try:
            out = codecs.decode_jpeg(payload[:cut])
        except ValueError:
            continue
        assert out.shape == (8, 8, 3)
    assert codecs.decode_image(payload).shape == (8, 8, 3)  # magic sniffing


def test_jpeg_progressive_equals_baseline_decode():
    """The exact progressive contract: encode_jpeg_progressive codes the
    IDENTICAL quantized coefficients as encode_jpeg, so the two streams
    must decode bit-for-bit equal — across dims (incl. single-row/column
    and non-block-aligned), qualities, and content with dense AC energy
    (gradients + checkerboard: refinement scans carry live history
    bits, EOB runs interleave correction bits)."""
    import numpy as np

    from weather_api_automate_etl_spark.sources import codecs

    rng = np.random.default_rng(7)
    dims = [(8, 8), (16, 24), (17, 9), (1, 1), (1, 36), (40, 1), (5, 13),
            (64, 48)]
    for h, w in dims:
        for q in (90, 60, 30):
            px = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
            base = codecs.decode_jpeg(codecs.encode_jpeg(px, quality=q))
            prog_bytes = codecs.encode_jpeg_progressive(px, quality=q)
            assert prog_bytes[:2] == b"\xff\xd8"
            assert b"\xff\xc2" in prog_bytes  # SOF2, not SOF0
            prog = codecs.decode_jpeg(prog_bytes)
            assert np.array_equal(base, prog), f"{h}x{w} q={q}"
    # structured content (the fixture family the query decodes)
    from weather_api_automate_etl_spark.sources.multimodal import (
        _jpeg_progressive_pixels,
    )

    for doc_id in range(0, 40):
        px = _jpeg_progressive_pixels(doc_id)
        base = codecs.decode_jpeg(codecs.encode_jpeg(px, quality=75))
        prog = codecs.decode_jpeg(codecs.encode_jpeg_progressive(px, quality=75))
        assert np.array_equal(base, prog), f"doc {doc_id}"


def test_jpeg_progressive_spark_pipeline_stats(spark):
    from weather_api_automate_etl_spark.sources import multimodal
    from weather_api_automate_etl_spark.sources.tables import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents").limit(24)
    stats = multimodal.progressive_jpeg_stats(
        multimodal.documents_as_progressive_jpeg_assets(docs)
    ).collect()
    assert len(stats) == 24
    for r in stats:
        assert r.width == (r.asset_id % 3 + 1) * 8 + r.asset_id % 7
        assert r.height == (r.asset_id % 2 + 1) * 8 + r.asset_id % 5
        assert r.exact_match, f"asset {r.asset_id} lost pixel equality"


def test_jpeg_spark_pipeline_stats(spark):
    from weather_api_automate_etl_spark.sources import multimodal
    from weather_api_automate_etl_spark.sources.tables import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents").limit(24)
    stats = multimodal.jpeg_stats(
        multimodal.documents_as_jpeg_assets(docs)
    ).collect()
    assert len(stats) == 24
    for r in stats:
        assert r.width == (r.asset_id % 3 + 1) * 8
        assert r.height == (r.asset_id % 2 + 1) * 8
        assert r.n_channels == 3
        assert r.n_blocks == (r.width // 8) * (r.height // 8)
        assert r.recon_ok


def test_avi_audio_strl_before_video_strl_and_wav_frame_alignment():
    import struct as _struct

    import numpy as np
    import pytest as _pytest

    from weather_api_automate_etl_spark.sources import codecs

    def chunk(ctype, data):
        pad = b"\x00" if len(data) & 1 else b""
        return ctype + _struct.pack("<I", len(data)) + data + pad

    def lst(ltype, data):
        return chunk(b"LIST", ltype + data)

    frames = np.arange(2 * 3 * 4 * 3, dtype=np.uint8).reshape(2, 3, 4, 3)
    n, h, w = 2, 3, 4
    fps = 10
    frame_bytes = ((w * 3 + 3) & ~3) * h
    avih = _struct.pack(
        "<IIIIIIIIIIIIII",
        1_000_000 // fps, frame_bytes * fps, 0, 0x10,
        n, 0, 2, frame_bytes, w, h, 0, 0, 0, 0,
    )
    # AUDIO strl FIRST (legal stream order); its strf is a WAVEFORMAT that
    # must not be mistaken for the video format
    strh_a = _struct.pack(
        "<4s4sIHHIIIIIIIIhhhh",
        b"auds", b"\x00\x00\x00\x00", 0, 0, 0, 0, 1, 8000, 0, 16000, 3200,
        0, 0, 0, 0, 0, 0,
    )
    strf_a = _struct.pack("<HHIIHH", 1, 1, 8000, 16000, 2, 16)
    strh_v = _struct.pack(
        "<4s4sIHHIIIIIIIIhhhh",
        b"vids", b"DIB ", 0, 0, 0, 0, 1, fps, 0, n, frame_bytes, 0, 0,
        0, 0, w, h,
    )
    strf_v = _struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, frame_bytes, 2835, 2835, 0, 0
    )
    hdrl = lst(
        b"hdrl",
        chunk(b"avih", avih)
        + lst(b"strl", chunk(b"strh", strh_a) + chunk(b"strf", strf_a))
        + lst(b"strl", chunk(b"strh", strh_v) + chunk(b"strf", strf_v)),
    )
    movi = lst(
        b"movi", b"".join(chunk(b"00db", codecs._dib_encode(f)) for f in frames)
    )
    body = b"AVI " + hdrl + movi
    payload = b"RIFF" + _struct.pack("<I", len(body)) + body
    got, got_fps = codecs.decode_avi(payload)
    assert got_fps == fps
    assert np.array_equal(got, frames)

    # WAV: a non-frame-aligned data chunk errors per the decoder contract
    wav = bytearray(codecs.encode_wav(np.zeros((4, 2), dtype=np.int16), 8000))
    # shrink data chunk length by 2 bytes (half a stereo frame)
    data_at = bytes(wav).rfind(b"data")
    (dlen,) = _struct.unpack_from("<I", wav, data_at + 4)
    _struct.pack_into("<I", wav, data_at + 4, dlen - 2)
    with _pytest.raises(ValueError, match="frames"):
        codecs.decode_wav(bytes(wav[:-2]))
    # zero sample rate errors
    wav2 = bytearray(codecs.encode_wav(np.zeros((4, 1), dtype=np.int16), 8000))
    fmt_at = bytes(wav2).find(b"fmt ")
    _struct.pack_into("<I", wav2, fmt_at + 8 + 4, 0)
    with _pytest.raises(ValueError, match="sample rate"):
        codecs.decode_wav(bytes(wav2))


# ---------------------------------------------------------------------------
# GIF codec (round-6: pure-stdlib variable-width LZW)
# ---------------------------------------------------------------------------


def test_gif_known_vector_decodes():
    """The canonical 35-byte single-white-pixel GIF89a (an independent,
    hand-assembled stream — NOT produced by our encoder) pins the decoder
    against the spec: LSB-first bit order, clear/EOI codes, GCT lookup."""
    import numpy as np

    from weather_api_automate_etl_spark.sources import codecs

    known = bytes.fromhex(
        "474946383961010001008000"  # header + 1x1 screen, GCT of 2
        "00ffffff000000"            # bg/aspect + GCT: white, black
        "2c000000000100010000"      # image descriptor 1x1
        "0202440100"                # mcs=2, data block [44 01]
        "3b"
    )
    arr = codecs.decode_gif(known)
    assert arr.shape == (1, 1, 3) and (arr == 255).all()
    assert (codecs.decode_image(known) == arr).all()


def test_gif_roundtrip_fuzz_width_bumps_and_table_clear():
    """Round-trip across palette sizes and rasters chosen to cross every
    LZW regime: 3-bit codes only, one width bump, growth to 12 bits, and a
    table-full mid-stream CLEAR (90*120 random 256-color pixels emit >4096
    codes). Also pins the KwKwK special case via long single-color runs."""
    import numpy as np

    from weather_api_automate_etl_spark.sources import codecs

    rng = np.random.RandomState(7)
    for ncol, shape in [(2, (3, 4)), (4, (7, 9)), (16, (32, 33)),
                        (256, (64, 80)), (256, (90, 120))]:
        pal = [tuple(int(x) for x in rng.randint(0, 256, 3)) for _ in range(ncol)]
        idx = rng.randint(0, ncol, shape).astype(np.uint8)
        dec = codecs.decode_gif(codecs.encode_gif(idx, pal))
        assert (dec == np.array(pal, dtype=np.uint8)[idx]).all(), (ncol, shape)
    # KwKwK + run-length table growth: constant raster with one odd pixel
    idx = np.zeros((50, 77), dtype=np.uint8)
    idx[0, 0] = 1
    pal = [(10, 20, 30), (200, 100, 50)]
    dec = codecs.decode_gif(codecs.encode_gif(idx, pal))
    assert (dec == np.array(pal, dtype=np.uint8)[idx]).all()


def test_gif_interlaced_and_local_color_table():
    """Foreign-stream features our encoder never writes: a 4-pass
    interlaced raster and a local color table overriding the global one —
    built by hand (re-packing a non-interlaced stream's rows into pass
    order) so the decoder's de-interlace mapping is pinned independently."""
    import struct

    import numpy as np

    from weather_api_automate_etl_spark.sources import codecs

    h, w = 9, 4
    # display raster: row index encoded in the red channel via palette id
    idx = np.tile(np.arange(h, dtype=np.uint8)[:, None], (1, w))
    pal = [(i * 10, 0, 0) for i in range(16)]
    # pass order for h=9: rows 0,8 | 4 | 2,6 | 1,3,5,7
    pass_rows = [0, 8, 4, 2, 6, 1, 3, 5, 7]
    stored = idx[pass_rows]
    plain = codecs.encode_gif(stored, pal)
    # rewrite: move palette to a LOCAL color table and set the interlace bit
    depth = 4  # 16 entries
    gct_len = 3 * (1 << depth)
    # plain layout: 6 header + 7 screen + GCT + 10 image descriptor + data
    data_part = plain[13 + gct_len + 10 :]
    gct = plain[13 : 13 + gct_len]
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x00, 0, 0)  # no GCT
    out += struct.pack(
        "<BHHHHB", 0x2C, 0, 0, w, h, 0x80 | 0x40 | (depth - 1)
    )  # LCT + interlace
    out += gct
    out += data_part
    arr = codecs.decode_gif(bytes(out))
    assert arr.shape == (h, w, 3)
    assert [int(r) for r in arr[:, 0, 0]] == [i * 10 for i in range(h)]


def test_gif_encode_rejections():
    import numpy as np
    import pytest as _pytest

    from weather_api_automate_etl_spark.sources import codecs

    with _pytest.raises(ValueError, match="index raster"):
        codecs.encode_gif(np.zeros((2, 2, 3), dtype=np.uint8), [(0, 0, 0)])
    with _pytest.raises(ValueError, match="beyond the palette"):
        codecs.encode_gif(np.full((2, 2), 3, dtype=np.uint8), [(0, 0, 0)])
    payload = codecs.encode_gif(np.zeros((8, 8), dtype=np.uint8), [(1, 2, 3)])
    with _pytest.raises(ValueError, match="truncated"):
        codecs.decode_gif(payload[:-6])
    # round-6 advice: degenerate shapes and a corrupt first LZW code must
    # surface as the codec's documented ValueError, never IndexError
    for empty in ((0, 4), (4, 0)):
        with _pytest.raises(ValueError, match="empty index raster"):
            codecs.encode_gif(np.zeros(empty, dtype=np.uint8), [(0, 0, 0)])
    with _pytest.raises(ValueError, match="out of range"):
        # first code in the entropy stream = 7 (LSB-first), a non-root,
        # non-clear value beyond the fresh table for min_code_size=2
        codecs._gif_lzw_decompress(bytes([0b00000111]), 2, 4)
    # round-12 mutation fuzz: every truncation point must raise the
    # documented ValueError, never struct.error / IndexError
    with _pytest.raises(ValueError, match="truncated global color table"):
        codecs.decode_gif(payload[:14])
    with _pytest.raises(ValueError, match="truncated image descriptor"):
        codecs.decode_gif(payload[:20])  # header+GCT end at byte 19
    with _pytest.raises(ValueError, match="truncated extension block"):
        codecs.decode_gif(payload[:19] + bytes([0x21, 0xFE, 0x02]))
    with _pytest.raises(ValueError, match="before LZW code size"):
        codecs.decode_gif(payload[:29])  # descriptor ends at byte 28
    # a root code that a too-small color table can't cover: rewrite the
    # 1-entry-palette stream to claim mcs=7 (roots up to 127)
    mcs_pos = 6 + 7 + 6 + 10  # header, screen, GCT(2), image descriptor
    assert payload[mcs_pos] == 2
    idx2 = np.full((4, 4), 200, dtype=np.uint8)
    pal256 = [(i, i, i) for i in range(256)]
    big = bytearray(codecs.encode_gif(idx2, pal256))
    # shrink the screen-descriptor GCT depth to 4 entries but keep the
    # 8-bit LZW stream: roots up to 255 now exceed the 4-entry table
    big[10] = (big[10] & ~0x07) | 0x01
    del big[13 + 3 * 4 : 13 + 3 * 256]
    with _pytest.raises(ValueError, match="beyond the color table"):
        codecs.decode_gif(bytes(big))


def test_bmp_truncated_header_raises_value_error():
    # round-12 mutation fuzz: a BMP cut inside the 54-byte header pair
    # raised struct.error instead of the codec's documented ValueError
    import numpy as np
    import pytest as _pytest

    from weather_api_automate_etl_spark.sources import codecs

    payload = codecs.encode_bmp(np.zeros((3, 3, 3), dtype=np.uint8))
    for cut in (2, 13, 25, 40, 53):
        with _pytest.raises(ValueError, match="truncated BMP header"):
            codecs.decode_bmp(payload[:cut])


def test_gif_spark_pipeline_stats(spark):
    docs = load_table(spark, SF, "documents").filter(F.col("doc_id") < 40)
    stats = multimodal.image_stats(
        multimodal.documents_as_gif_assets(docs)
    ).collect()
    assert len(stats) == 40
    for r in stats:
        d = r.asset_id
        assert r.media_type == "image/gif"
        assert (r.width, r.height) == (d % 9 + 2, d % 6 + 2)
        assert r.first_px_r == 255 - d % 256
        assert r.first_px_b == 255 - d * 7 % 256


def test_pil_plug_point_decodes_foreign_media():
    """The WebP/exotic-TIFF seam: with Pillow installed, decode_image must route
    unknown magics through PIL; without it (this container), the
    documented NotImplementedError fires — asserted in
    test_gif_encode_rejections' sibling below."""
    import pytest as _pytest

    _pytest.importorskip("PIL")
    import io

    import numpy as np
    from PIL import Image

    from weather_api_automate_etl_spark.sources import codecs

    img = Image.fromarray(np.full((5, 7, 3), 99, dtype=np.uint8))
    buf = io.BytesIO()
    img.save(buf, format="WEBP", lossless=True)
    arr = codecs.decode_image(buf.getvalue())
    assert arr.shape == (5, 7, 3) and (arr == 99).all()


def test_unknown_magic_without_pil_raises_not_implemented():
    import pytest as _pytest

    from weather_api_automate_etl_spark.sources import codecs

    try:
        import PIL  # noqa: F401

        _pytest.skip("PIL installed: the fallback path decodes instead")
    except ImportError:
        pass
    with _pytest.raises(NotImplementedError, match="plug in PIL/ffmpeg"):
        codecs.decode_image(b"RIFF0000WEBPVP8 ")


def test_tiff_roundtrip_fuzz_all_structural_combos():
    """Every structural degree of freedom the TIFF codec claims: both byte
    orders × none/PackBits × single/multi-strip layouts, random rasters
    plus run-heavy ones (real replicate runs through PackBits)."""
    import numpy as np

    from weather_api_automate_etl_spark.sources import codecs

    rng = np.random.RandomState(7)
    for trial in range(25):
        h, w = rng.randint(1, 17), rng.randint(1, 17)
        arr = rng.randint(0, 256, (h, w, 3)).astype(np.uint8)
        if trial % 3 == 0:
            arr[:, : w // 2] = 77
        for pb in (False, True):
            for be in (False, True):
                for rps in (None, 1, 2, 5):
                    enc = codecs.encode_tiff(
                        arr, packbits=pb, rows_per_strip=rps, big_endian=be
                    )
                    dec = codecs.decode_tiff(enc)
                    assert dec.shape == (h, w, 3)
                    assert (dec == arr).all(), (trial, pb, be, rps)
    # decode_image dispatch routes both magics
    arr = (np.arange(2 * 3 * 3).reshape(2, 3, 3) % 256).astype(np.uint8)
    assert (codecs.decode_image(codecs.encode_tiff(arr)) == arr).all()
    assert (
        codecs.decode_image(codecs.encode_tiff(arr, big_endian=True)) == arr
    ).all()


def test_tiff_grayscale_photometrics_and_rejections():
    """Foreign-encoder coverage the roundtrip can't reach: hand-built
    grayscale TIFFs for both min-is-black and min-is-white photometrics,
    plus the documented ValueError rejections."""
    import struct

    import numpy as np
    import pytest as _pytest

    from weather_api_automate_etl_spark.sources import codecs

    g = np.array([[0, 128], [255, 7]], dtype=np.uint8)

    def gray_tiff(photometric: int) -> bytes:
        bo = "<"

        def entry(tag, typ, count, value):
            if typ == 3 and count == 1:
                return struct.pack(f"{bo}HHIHH", tag, typ, count, value, 0)
            return struct.pack(f"{bo}HHII", tag, typ, count, value)

        n = 8
        data_off = 8 + 2 + n * 12 + 4
        ifd = struct.pack(f"{bo}H", n)
        ifd += entry(256, 3, 1, 2) + entry(257, 3, 1, 2)
        ifd += entry(258, 3, 1, 8) + entry(259, 3, 1, 1)
        ifd += entry(262, 3, 1, photometric) + entry(273, 4, 1, data_off)
        ifd += entry(277, 3, 1, 1) + entry(279, 4, 1, 4)
        ifd += struct.pack(f"{bo}I", 0)
        return struct.pack(f"{bo}2sHI", b"II", 42, 8) + ifd + g.tobytes()

    d1 = codecs.decode_tiff(gray_tiff(1))  # min-is-black
    assert (d1[:, :, 0] == g).all() and (d1[:, :, 2] == g).all()
    d0 = codecs.decode_tiff(gray_tiff(0))  # min-is-white inverts
    assert (d0[:, :, 0] == 255 - g).all()

    with _pytest.raises(ValueError, match="not a TIFF"):
        codecs.decode_tiff(b"XX\x00\x00\x00\x00\x00\x00")
    with _pytest.raises(ValueError, match="truncated header"):
        codecs.decode_tiff(b"II\x00\x00")
    with _pytest.raises(ValueError, match="truncated IFD"):
        codecs.decode_tiff(b"II*\x00\x08\x00\x00\x00")
    with _pytest.raises(ValueError, match="empty raster"):
        codecs.encode_tiff(np.zeros((0, 4, 3), dtype=np.uint8))
    with _pytest.raises(ValueError, match="expects an"):
        codecs.encode_tiff(np.zeros((2, 2), dtype=np.uint8))
    # file-level truncation surfaces at the strip bound, stream-level
    # corruption inside the RLE decoder itself
    ok = codecs.encode_tiff(np.full((3, 3, 3), 9, dtype=np.uint8), packbits=True)
    with _pytest.raises(ValueError, match="strip out of bounds"):
        codecs.decode_tiff(ok[:-2])
    with _pytest.raises(ValueError, match="PackBits stream truncated"):
        codecs._packbits_decompress(b"\x05abc", 6)


def test_tiff_spark_pipeline_stats(spark):
    docs = load_table(spark, SF, "documents").filter(F.col("doc_id") < 40)
    stats = multimodal.image_stats(
        multimodal.documents_as_tiff_assets(docs)
    ).collect()
    assert len(stats) == 40
    for r in stats:
        d = r.asset_id
        assert r.media_type == "image/tiff"
        assert (r.width, r.height) == (d % 10 + 2, d % 7 + 2)
        assert r.first_px_r == 255 - d % 256
        assert r.first_px_b == 255 - d * 13 % 256


def test_jpeg_progressive_arbitrary_scan_scripts():
    """Foreign-file hardening: real progressive JPEGs use many different
    scan scripts (libjpeg's default, Photoshop's, mozjpeg's trellis
    splits). The decoder must not be shaped around OUR script — fuzz
    randomly generated VALID Annex-G scripts (random DC/AC successive-
    approximation depths, random spectral band splits, per-component
    scan interleavings) and require exact pixel equality with the
    baseline decode every time."""
    import random

    import numpy as np

    from weather_api_automate_etl_spark.sources import codecs

    rng = random.Random(1234)
    npr = np.random.default_rng(99)

    def random_script():
        scans = []
        dc_al = rng.randint(0, 2)
        # DC scans: interleaved all-components OR per-component
        # (non-interleaved DC is legal progressive; prediction resets
        # per scan on both sides)
        dc_groups = [(0, 1, 2)] if rng.random() < 0.5 else [(0,), (1,), (2,)]
        for g in dc_groups:
            scans.append((g, 0, 0, 0, dc_al))
        for al in range(dc_al - 1, -1, -1):
            for g in dc_groups:
                scans.append((g, 0, 0, al + 1, al))
        for comp in range(3):
            # random contiguous band split of 1..63
            cuts = sorted(rng.sample(range(2, 63), rng.randint(0, 2)))
            bands, lo = [], 1
            for c in cuts + [64]:
                bands.append((lo, c - 1))
                lo = c
            ac_al = rng.randint(0, 2)
            for ss, se in bands:
                scans.append(((comp,), ss, se, 0, ac_al))
            for al in range(ac_al - 1, -1, -1):
                for ss, se in bands:
                    scans.append(((comp,), ss, se, al + 1, al))
        # shuffle AC scans a little while keeping each chain's order:
        # stable-sort by a random per-chain key would be complex; instead
        # interleave by rotating — order BETWEEN components is free
        return tuple(scans)

    saved = codecs._PROG_SCRIPT
    try:
        for trial in range(12):
            h, w = int(npr.integers(1, 36)), int(npr.integers(1, 36))
            px = npr.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
            q = int(npr.choice([90, 60, 35]))
            base = codecs.decode_jpeg(codecs.encode_jpeg(px, quality=q))
            codecs._PROG_SCRIPT = random_script()
            prog = codecs.decode_jpeg(
                codecs.encode_jpeg_progressive(px, quality=q)
            )
            assert np.array_equal(base, prog), (
                trial, h, w, q, codecs._PROG_SCRIPT
            )
    finally:
        codecs._PROG_SCRIPT = saved


def test_jpeg_missing_eoi_and_bad_band_bounds():
    """Foreign-file robustness: a stream truncated right after its
    entropy data (no EOI — common in the wild) must still decode in
    full; a corrupt progressive scan header (Se > 63) must raise the
    documented ValueError, never an IndexError."""
    import numpy as np
    import pytest as _pytest

    from weather_api_automate_etl_spark.sources import codecs

    px = np.arange(8 * 8 * 3, dtype=np.uint8).reshape(8, 8, 3)
    base = codecs.encode_jpeg(px, quality=75)
    assert base.endswith(b"\xff\xd9")
    assert np.array_equal(
        codecs.decode_jpeg(base[:-2]), codecs.decode_jpeg(base)
    )
    prog = codecs.encode_jpeg_progressive(px, quality=75)
    assert np.array_equal(
        codecs.decode_jpeg(prog[:-2]), codecs.decode_jpeg(prog)
    )
    # corrupt an AC scan's Se byte: SOS payload = len(2) ns(1) + 2*ns
    # component bytes, then Ss, Se, AhAl. Find a 1-component scan.
    broken = bytearray(prog)
    i = 2
    while i < len(broken):
        if broken[i] == 0xFF and broken[i + 1] == 0xDA and broken[i + 4] == 1:
            broken[i + 8] = 200  # Se
            break
        i += 1
    with _pytest.raises(ValueError, match="spectral band"):
        codecs.decode_jpeg(bytes(broken))


def test_jpeg_short_segments_raise_value_error():
    """round-12 mutation fuzz: a corrupted seg_len passes the outer
    truncation check with a too-short segment, so the SOF/SOS/DRI
    fixed-layout reads must raise the contract ValueError, never
    struct.error."""
    import numpy as np
    import pytest as _pytest

    from weather_api_automate_etl_spark.sources import codecs

    px = np.arange(8 * 8 * 3, dtype=np.uint8).reshape(8, 8, 3)
    base = bytearray(codecs.encode_jpeg(px, quality=75))

    def shrink(marker: int, new_len: int) -> bytes:
        b = bytearray(base)
        i = 2
        while not (b[i] == 0xFF and b[i + 1] == marker):
            i += 1
        old = (b[i + 2] << 8) | b[i + 3]
        b[i + 2 : i + 4] = new_len.to_bytes(2, "big")
        del b[i + 2 + new_len : i + 2 + old]  # keep the stream aligned
        return bytes(b)

    with _pytest.raises(ValueError, match="truncated JPEG SOF"):
        codecs.decode_jpeg(shrink(0xC0, 5))
    with _pytest.raises(ValueError, match="truncated JPEG SOF components"):
        codecs.decode_jpeg(shrink(0xC0, 9))
    with _pytest.raises(ValueError, match="truncated JPEG SOS"):
        codecs.decode_jpeg(shrink(0xDA, 3))
