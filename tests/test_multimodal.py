"""Multimodal plumbing tests: binary columns, decode-stub contract,
error rows, frame fan-out."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from document_parser_spark.ops import multimodal as mm


@pytest.fixture(scope="module")
def media(spark):
    good = mm.DecodeStub.pack_header(8, 6, 3, b"\x01" * (8 * 3 * 2))
    rows = [
        ("d1", "img://1", "image", good, len(good)),
        ("d2", "img://2", "image", b"\x00\x01", 2),          # truncated
        ("d3", "vid://3", "video", good, len(good)),
        ("d4", "img://4", "image",
         mm.DecodeStub.pack_header(-1, 5, 3), 12),           # bad header
    ]
    return spark.createDataFrame(rows, mm.MEDIA_SCHEMA)


def test_decode_features(media):
    feats = {r.media_ref: r for r in
             mm.extract_image_features(media).collect()}
    assert set(feats) == {"img://1", "img://2", "img://4"}  # images only
    ok = feats["img://1"]
    assert (ok.width, ok.height, ok.n_channels) == (8, 6, 3)
    assert len(ok.embedding) == mm.EMBED_DIM
    assert abs(sum(x * x for x in ok.embedding) - 1.0) < 1e-5
    assert feats["img://2"].decode_error is not None
    assert feats["img://4"].decode_error is not None


def test_decode_deterministic(media):
    a = mm.extract_image_features(media).collect()
    b = mm.extract_image_features(media).collect()
    assert sorted(map(str, a)) == sorted(map(str, b))


def test_frame_sampling(media):
    frames = mm.sample_frames(media, every_ms=500, max_frames=3).collect()
    assert {f.media_ref for f in frames} == {"vid://3"}
    assert [f.frame_idx for f in frames] == [0, 1]  # 48/24 bytes -> 2 frames
    assert frames[1].frame_ts_ms == 500


def test_synthesize_media_schema(spark):
    docs = spark.createDataFrame(
        [(i, f"text body {i}") for i in range(9)], "doc_id long, text string")
    media = mm.synthesize_media(docs, modulo=3)
    rows = media.collect()
    assert len(rows) == 3
    assert all(r.media_type == "image" for r in rows)
    feats = mm.extract_image_features(media)
    assert feats.filter(F.col("decode_error").isNotNull()).count() == 0


def test_media_stats(media):
    stats = {r.media_type: r for r in mm.media_stats(media).collect()}
    assert stats["image"].n_items == 3
    assert stats["video"].n_items == 1
    assert stats["image"].max_bytes >= 12
