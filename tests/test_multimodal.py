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
