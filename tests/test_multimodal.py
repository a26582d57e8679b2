from __future__ import annotations

import pytest

from b2b_data_pipeline_indiamart_spark import catalog
from b2b_data_pipeline_indiamart_spark.operators import multimodal as mm


@pytest.fixture(scope="module")
def media(spark, sf_small):
    docs = catalog.load(spark, sf_small, "documents").limit(60)
    m = mm.media_from_documents(docs)
    m.cache().count()
    return m


def test_media_schema(media):
    assert [f.name for f in media.schema.fields] == ["media_id", "kind", "payload", "meta"]
    kinds = {r["kind"] for r in media.select("kind").distinct().collect()}
    assert kinds <= set(mm.KINDS)


def test_extract_media_features(media):
    feats = mm.extract_media_features(media)
    rows = feats.collect()
    assert len(rows) == media.count()
    for r in rows:
        assert r["n_bytes"] > 0
        assert len(r["sha256"]) == 64
        if r["kind"] == "image":
            assert r["n_frames"] == 1 and r["duration_s"] == 0.0
        if r["kind"] == "audio":
            assert r["width"] == 0 and r["height"] == 0
        if r["kind"] == "video":
            assert r["n_frames"] >= 8


def test_extract_deterministic_across_partitionings(media):
    a = sorted(map(tuple, mm.extract_media_features(media).collect()))
    b = sorted(map(tuple, mm.extract_media_features(media.repartition(7)).collect()))
    assert a == b


def test_resize_images_only_images(media):
    out = mm.resize_images(media, 224, 224)
    rows = out.collect()
    n_images = media.filter("kind = 'image'").count()
    assert len(rows) == n_images
    assert all(r["width"] == 224 and r["height"] == 224 for r in rows)
    assert all(len(r["payload"]) == 32 for r in rows)  # stub emits sha256 bytes


def test_sample_frames_fanout(media):
    frames = mm.sample_frames(media, every_n=16)
    rows = frames.collect()
    vids = media.filter("kind = 'video'").count()
    assert len(rows) >= vids  # ≥1 frame per video
    assert all(r["frame_idx"] % 16 == 0 for r in rows)
    # fan-out matches the stubbed decode's frame count
    feats = {
        r["media_id"]: r["n_frames"]
        for r in mm.extract_media_features(media.filter("kind='video'")).collect()
    }
    from collections import Counter

    per_vid = Counter(r["media_id"] for r in rows)
    for mid, n_frames in feats.items():
        assert per_vid[mid] == len(range(0, n_frames, 16))


def test_decode_real_is_stubbed():
    with pytest.raises(NotImplementedError):
        mm.decode_real(b"bytes", "image")
