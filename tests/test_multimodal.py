"""Multimodal plumbing: schema, batching, deterministic stub decode."""

from __future__ import annotations

from pagerank_spark.operators.multimodal import (
    extract_media_features,
    resize_images,
    synth_media,
)


def test_features_deterministic_across_partitioning(spark):
    m1 = synth_media(spark, 48).repartition(2)
    m2 = synth_media(spark, 48).repartition(7)
    a = {r.media_id: r for r in extract_media_features(m1).collect()}
    b = {r.media_id: r for r in extract_media_features(m2).collect()}
    assert set(a) == set(b) == set(range(48))
    for k in a:
        assert a[k] == b[k]


def test_feature_ranges(spark):
    feats = extract_media_features(synth_media(spark, 30)).collect()
    for r in feats:
        assert 0 <= r.p05 <= r.p95 <= 255
        assert 0 <= r.mean <= 255 and r.n_bytes > 0
        assert 1 <= r.frames_sampled <= 3


def test_frame_sampling_caps_video(spark):
    feats = extract_media_features(synth_media(spark, 30), max_frames=2).collect()
    vids = [r for r in feats if r.kind == "video"]
    assert vids and all(r.frames_sampled <= 2 for r in vids)


def test_resize_images(spark):
    out = resize_images(synth_media(spark, 30), out_w=4, out_h=4).collect()
    assert out and all(r.kind == "image" for r in out)
    for r in out:
        assert r.width == 4 and r.height == 4 and len(r.payload) == 16
