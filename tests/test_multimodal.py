"""Multimodal binary-column plumbing: sniffing, feature UDF, plans, stub."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pdf_to_epub_spark.operators.multimodal import (
    extract_media_features,
    frame_sample_plan,
    make_media_corpus,
    resize_spec,
    sniff_container,
)

N = 50


@pytest.fixture(scope="module")
def media_df(spark):
    return spark.createDataFrame(
        make_media_corpus(N),
        "media_id long, url string, media_type string, payload binary",
    ).cache()


def test_container_sniffing_jvm_side(media_df):
    got = media_df.select("media_type", sniff_container().alias("c")).collect()
    image_containers = {r["c"] for r in got if r["media_type"] == "image"}
    assert image_containers <= {"png", "jpeg", "gif"}
    audio_containers = {r["c"] for r in got if r["media_type"] == "audio"}
    assert audio_containers <= {"riff", "mp3"}
    assert {r["c"] for r in got if r["media_type"] == "video"} == {"mp4"}
    assert "unknown" not in {r["c"] for r in got}


def test_feature_extraction_batch_shape(media_df):
    feats = extract_media_features(media_df, salt_partitions=4).cache()
    rows = feats.collect()
    assert len(rows) == N
    assert all(r["status"] == "ok" for r in rows)
    for r in rows:
        assert r["n_bytes"] > 64
        assert 16 <= r["width"] <= 2064 and 16 <= r["height"] <= 2064
        assert len(r["embedding"]) == 16
        if r["media_type"] == "image":
            assert r["n_frames"] == 1
        assert r["meta"]["codec_path"] == "stub"
    # deterministic: same payload → same embedding
    again = {r["media_id"]: r["embedding"] for r in extract_media_features(media_df).collect()}
    assert again[rows[0]["media_id"]] == rows[0]["embedding"]


def test_frame_sampling_and_resize_plans(media_df):
    feats = extract_media_features(media_df)
    frames = frame_sample_plan(feats, every_nth=10, max_frames=4).collect()
    assert frames, "video rows expected"
    for r in frames:
        assert 1 <= len(r["frame_indices"]) <= 4
        assert r["frame_indices"][0] == 0
        assert all(i < max(r["n_frames"], 1) for i in r["frame_indices"])

    resized = resize_spec(feats, target=224).collect()
    for r in resized:
        assert min(r["resized_w"], r["resized_h"]) == 224


def test_real_codec_path_is_stubbed(spark, media_df):
    feats = extract_media_features(media_df.limit(3), real_codecs=True).collect()
    assert all(r["status"] == "unsupported" for r in feats)
    assert all("not available" in r["meta"]["error"] for r in feats)


def test_corrupt_payload_rows(spark):
    rows = [
        {"media_id": 1, "url": "u://1", "media_type": "image", "payload": b""},
        {"media_id": 2, "url": "u://2", "media_type": "video", "payload": b"\x00"},
    ]
    df = spark.createDataFrame(
        rows, "media_id long, url string, media_type string, payload binary"
    )
    got = {r["media_id"]: r for r in extract_media_features(df).collect()}
    assert got[1]["status"] == "ok" and got[1]["n_bytes"] == 0
    assert got[2]["status"] == "ok"
    assert got[1]["embedding"] is not None
