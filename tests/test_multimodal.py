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


def test_parse_image_header_known_bytes():
    import struct

    png = (
        b"\x89PNG\r\n\x1a\n" + struct.pack(">I", 13) + b"IHDR"
        + struct.pack(">II", 640, 480) + b"\x08\x06\x00\x00\x00" + b"junkbody"
    )
    gif = b"GIF89a" + struct.pack("<HH", 320, 200) + b"trailer"
    bmp = b"BM" + b"\x00" * 16 + struct.pack("<ii", 800, -600) + b"rest"
    jpeg = (
        b"\xff\xd8"
        + b"\xff\xe0" + struct.pack(">H", 15) + b"JFIF\x00" + b"\x00" * 8  # APP0
        + b"\xff\xc0" + struct.pack(">H", 17) + b"\x08" + struct.pack(">HH", 1080, 1920)
        + b"\x03" + b"\x00" * 9
    )
    assert mm.parse_image_header(png) == ("png", 640, 480)
    assert mm.parse_image_header(gif) == ("gif", 320, 200)
    assert mm.parse_image_header(bmp) == ("bmp", 800, 600)  # abs(top-down h)
    assert mm.parse_image_header(jpeg) == ("jpeg", 1920, 1080)
    assert mm.parse_image_header(b"plain text, not an image") is None
    assert mm.parse_image_header(None) is None
    assert mm.parse_image_header(b"\x89PNG\r\n\x1a\n" + b"tr") is None  # truncated


def test_parse_wav_header_known_bytes():
    import struct

    byte_rate, data = 8000, b"\x00" * 4000  # 0.5 s of 8 kHz 8-bit mono
    fmt = struct.pack("<HHIIHH", 1, 1, 8000, byte_rate, 1, 8)
    wav = (
        b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    assert mm.parse_wav_header(wav) == 0.5
    assert mm.parse_wav_header(b"not riff") is None


def test_image_rows_decode_real_headers(media):
    """media_from_documents synthesizes valid PNG/GIF/BMP headers for
    image rows; the feature extractor must decode the REAL dimensions
    (64 + id % 192 by 64 + 7*id % 192), not the stub's hash-derived
    fakes — and report which header format it parsed."""
    feats = mm.extract_media_features(media.filter("kind = 'image'")).collect()
    assert feats
    seen = set()
    for r in feats:
        assert r["decoder"].startswith("header:"), r
        seen.add(r["decoder"])
        assert r["width"] == 64 + r["media_id"] % 192
        assert r["height"] == 64 + (r["media_id"] * 7) % 192
    assert seen == {"header:png", "header:gif", "header:bmp"}


def test_non_image_rows_fall_back_to_stub(media):
    feats = mm.extract_media_features(media.filter("kind != 'image'")).collect()
    assert feats and all(r["decoder"] == "stub" for r in feats)
