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
    # JPEG has no pure-NumPy decoder: still the documented plug point
    with _pytest.raises(NotImplementedError, match="magic"):
        codecs.decode_image(b"\xff\xd8\xff\xe0....")


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
