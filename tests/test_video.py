"""AVI container parse + MJPEG frame decode (operators/video.py)."""

import numpy as np
import pytest

from hive2es_offline_spark.operators import video
from hive2es_offline_spark.operators.multimodal import decode_png_pixels


def solid(r, g, b, w=24, h=16):
    img = np.zeros((h, w, 3), np.uint8)
    img[:, :, 0], img[:, :, 1], img[:, :, 2] = r, g, b
    return img


def test_avi_roundtrip_meta_and_frames():
    frames = [solid(200, 0, 0), solid(0, 200, 0), solid(0, 0, 200)]
    payload = video.encode_avi_mjpeg(frames, fps=5)
    m = video.parse_avi(payload)
    assert m is not None
    assert (m["width"], m["height"]) == (24, 16)
    assert m["codec"] == "MJPG"
    assert m["fps"] == 5.0
    assert len(m["frames"]) == 3
    # every frame chunk is a real JPEG that decodes to the right color
    from hive2es_offline_spark.operators.jpeg import decode_jpeg_pixels

    px = decode_jpeg_pixels(m["frames"][1])
    assert px is not None and px.shape == (16, 24, 3)
    assert px[:, :, 1].mean() > 150 and px[:, :, 0].mean() < 60


def test_parse_avi_rejects_garbage():
    assert video.parse_avi(b"not avi") is None
    assert video.parse_avi(b"RIFF\x00\x00\x00\x00WAVE") is None


def test_spark_video_meta_and_sampled_frames(spark):
    ids = spark.range(4).withColumnRenamed("id", "doc_id")
    payloads = video.with_avi_payload(ids, n_frames=6)
    meta = video.decode_video_meta(payloads).collect()
    assert all(r["decode_status"] == "ok" for r in meta)
    assert all(r["n_frames"] == 6 and r["codec"] == "MJPG" for r in meta)
    assert all(r["duration_s"] == pytest.approx(1.2) for r in meta)

    out = video.sample_video_frames(payloads, num_frames=3).collect()
    assert len(out) == 4 * 3
    assert all(r["frame_status"] == "ok" for r in out)
    # each sampled frame is a standalone decodable PNG of the right size
    px = decode_png_pixels(bytes(out[0]["frame"]))
    assert px is not None and px.size == 16 * 24 * 3


def test_spark_video_undecodable(spark):
    df = spark.createDataFrame([(9, bytearray(b"mp4junk"))], "doc_id long, payload binary")
    meta = video.decode_video_meta(df).collect()
    assert meta[0]["decode_status"] == "undecodable"
    frames = video.sample_video_frames(df, num_frames=2).collect()
    assert all(r["frame"] is None and r["frame_status"] == "undecodable" for r in frames)
