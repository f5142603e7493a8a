"""Multimodal plumbing tests: schema, mapInPandas batch shape, deterministic
fake kernels. The decode stub itself must raise (no codecs here)."""

from __future__ import annotations

import pytest

from tansu_spark.functions import multimodal as M


@pytest.fixture(scope="module")
def assets(spark):
    rows = [
        (1, "image", b"\x89PNG-fake-bytes-1", "image/png", 800, 600, None),
        (2, "image", b"\x89PNG-fake-bytes-22", "image/png", 200, 100, None),
        (3, "video", b"\x00\x00ftyp-fake", "video/mp4", 1920, 1080, 3500),
        (4, "audio", None, "audio/wav", None, None, 2000),
    ]
    return spark.createDataFrame(rows, M.ASSET_SCHEMA)


def test_extract_features_shape_and_determinism(assets):
    out = M.extract_features(assets, feature_dim=8).collect()
    assert len(out) == 4
    by_id = {r.asset_id: r for r in out}
    assert by_id[1].n_bytes == 17
    assert len(by_id[1].feature) == 8
    assert by_id[4].n_bytes == 0 and by_id[4].content_digest is None
    # deterministic: same content → same digest/feature
    again = {r.asset_id: r for r in M.extract_features(assets, feature_dim=8).collect()}
    assert again[1].content_digest == by_id[1].content_digest
    assert again[1].feature == by_id[1].feature


def test_sample_frames(assets):
    rows = M.sample_frames(assets, every_ms=1000).collect()
    assert sorted(r.frame_ts_ms for r in rows) == [0, 1000, 2000, 3000]
    assert all(r.asset_id == 3 for r in rows)


def test_resize_plan(assets):
    rows = {r.asset_id: r for r in M.resize_plan(assets, max_side=512).collect()}
    assert rows[1].target_width == 512 and rows[1].target_height == 384
    assert rows[2].target_width == 200 and rows[2].target_height == 100


def test_decode_stub_raises():
    with pytest.raises(NotImplementedError):
        M._decode_image_bytes(b"anything")
