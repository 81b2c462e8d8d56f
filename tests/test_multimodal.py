"""Multimodal plumbing: schema, deterministic synthesis, feature
extraction batch shapes, frame sampling, decode stub."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from oboyu_spark.operators import multimodal as M


@pytest.fixture(scope="module")
def assets(spark):
    return M.synthesize_assets(spark, n=60)


def test_schema_and_determinism(spark, assets):
    rows = assets.collect()
    assert len(rows) == 60
    assert set(r["kind"] for r in rows) == {"image", "audio", "video"}
    assert all(len(bytes(r["data"])) == 64 for r in rows)
    assert all(r["meta"]["codec"] for r in rows)
    again = sorted(map(lambda r: (r["asset_id"], bytes(r["data"])),
                       M.synthesize_assets(spark, n=60).collect()))
    first = sorted(map(lambda r: (r["asset_id"], bytes(r["data"])), rows))
    assert again == first


def test_extract_features(spark, assets):
    feats = M.extract_features(assets, dim=32).collect()
    assert len(feats) == 60
    for r in feats:
        assert len(r["features"]) == 32
        assert all(-1.0 <= float(x) < 1.0 for x in r["features"])
    # deterministic: same asset → same features
    again = {r["asset_id"]: r["features"] for r in
             M.extract_features(assets, dim=32).collect()}
    for r in feats:
        assert again[r["asset_id"]] == r["features"]


def test_frame_sample(spark, assets):
    frames = M.frame_sample_stub(assets, n_frames=4).collect()
    n_videos = assets.filter(F.col("kind") == "video").count()
    assert len(frames) == n_videos * 4
    assert all(len(bytes(r["frame_bytes"])) == 8 for r in frames)


def test_decode_stub_raises():
    with pytest.raises(NotImplementedError):
        M.decode_media(b"xx", "image")


def test_resize_images(spark, assets):
    out = M.resize_images(assets, out_w=4, out_h=3).collect()
    n_images = assets.filter(F.col("kind") == "image").count()
    assert len(out) == n_images
    for r in out:
        assert (r["out_w"], r["out_h"]) == (4, 3)
        assert len(bytes(r["pixels"])) == 4 * 3
    # deterministic across runs
    again = {r["asset_id"]: bytes(r["pixels"])
             for r in M.resize_images(assets, out_w=4, out_h=3).collect()}
    for r in out:
        assert again[r["asset_id"]] == bytes(r["pixels"])
