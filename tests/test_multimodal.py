"""Multimodal plumbing tests: schemas, determinism, quarantine, batch shape.

The decode itself is a deterministic stub (no PIL/ffmpeg in the container);
what must be *real* is the Spark side: mapInPandas signatures, schema
stability, per-item fault isolation, and the row explosion for frame
sampling.
"""

from __future__ import annotations

from pyspark.sql import Row

from hierarchical_graph_db_spark.operators.multimodal import (
    FEATURE_DIM,
    frame_sample,
    image_features,
    load_media_dir,
    resize_metadata,
)

MEDIA = [
    Row(media_id=1, content=b"\x89PNG fake image bytes", content_type="image/png",
        duration_ms=None),
    Row(media_id=2, content=b"RIFF fake wav", content_type="audio/wav",
        duration_ms=3500),
]


def test_image_features_schema_and_determinism(spark):
    df = spark.createDataFrame(MEDIA)
    out1 = {r["media_id"]: r for r in image_features(df).collect()}
    out2 = {r["media_id"]: r for r in image_features(df).collect()}
    r = out1[1]
    assert r["decode_error"] is None
    assert r["n_bytes"] == len(MEDIA[0].content)
    assert 1 <= r["width"] <= 64 and 1 <= r["height"] <= 64
    assert len(r["features"]) == FEATURE_DIM
    assert all(0.0 <= f <= 1.0 for f in r["features"])
    # decode is deterministic across runs
    assert out1[1]["features"] == out2[1]["features"]
    # distinct content → distinct features
    assert out1[1]["features"] != out1[2]["features"]


def test_resize_metadata_aspect_ratio(spark):
    feats = spark.createDataFrame([Row(media_id=1, width=64, height=32)])
    r = resize_metadata(feats, max_side=16).collect()[0]
    assert (r["resized_width"], r["resized_height"]) == (16, 8)
    big = spark.createDataFrame([Row(media_id=2, width=8, height=4)])
    r2 = resize_metadata(big, max_side=16).collect()[0]
    assert (r2["resized_width"], r2["resized_height"]) == (8, 4)  # never upscale


def test_frame_sample_explosion(spark):
    df = spark.createDataFrame(MEDIA)
    frames = frame_sample(df.where("media_id = 2"), every_ms=1000).collect()
    assert len(frames) == 3                       # 3500ms // 1000
    assert [f["ts_ms"] for f in sorted(frames, key=lambda r: r["frame_idx"])] \
        == [0, 1000, 2000]
    assert len({f["frame_sha256"] for f in frames}) == 3


def test_load_media_dir_kind_inference(spark, tmp_path):
    d = tmp_path / "media"
    d.mkdir()
    (d / "a.png").write_bytes(b"png bytes")
    (d / "b.mp4").write_bytes(b"mp4 bytes")
    (d / "c.xyz").write_bytes(b"???")
    rows = {r["source_uri"].rsplit("/", 1)[-1]: r["kind"]
            for r in load_media_dir(spark, str(d)).collect()}
    assert rows == {"a.png": "image", "b.mp4": "video", "c.xyz": "unknown"}
