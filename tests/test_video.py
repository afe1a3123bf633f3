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


def test_video_features_solid_frames_known_histograms(spark):
    """VERDICT r7 #7: analytic oracle for the frame features.  A solid
    gray frame survives the MJPEG round trip as a (near-)solid frame, so
    the pixel histogram out of extract_features must be ONE-HOT at the
    decoded gray value's bin — and the decoded value must sit within DC
    quantization error of the original."""
    import pandas as pd

    from hive2es_offline_spark.operators import jpeg
    from hive2es_offline_spark.operators.multimodal import extract_features

    grays = [16, 100, 200]
    frames = [solid(g, g, g, w=32, h=24) for g in grays]
    payload = video.encode_avi_mjpeg(frames, fps=5)
    df = spark.createDataFrame(pd.DataFrame({"doc_id": [1], "payload": [payload]}))
    sampled = video.sample_video_frames(df, num_frames=3)
    feats = (
        extract_features(
            sampled.select("frame_index", sampled.frame.alias("payload"))
            .withColumnRenamed("frame_index", "doc_id"),
            dim=8,
        )
        .orderBy("doc_id")
        .collect()
    )
    assert [r["decode_status"] for r in feats] == ["ok"] * 3
    for g, row in zip(grays, feats):
        # what did the JPEG round trip actually produce for this frame?
        decoded = jpeg.decode_jpeg_pixels(jpeg.encode_jpeg(solid(g, g, g, 32, 24)))
        vals = np.unique(decoded)
        assert len(vals) <= 2 and abs(int(vals[0]) - g) <= 3  # near-solid
        hist = row["feature"]
        # one-hot at the decoded value's bin (v % dim), everything else 0
        hot = {int(v) % 8 for v in vals}
        assert sum(hist[b] for b in hot) == pytest.approx(1.0, abs=1e-6)
        assert sum(hist) == pytest.approx(1.0, abs=1e-6)


class TestVideoDedup:
    """video_dedup (round 14, VERDICT r13 #7): slot-aligned perceptual
    near-dup clusters over sampled MJPEG frames."""

    @pytest.fixture(scope="class")
    def vids(self, spark):
        from hive2es_offline_spark.operators.jpeg import decode_jpeg_pixels

        def grad_h(shift=0, w=48, h=32):
            g = np.tile(
                np.clip(np.linspace(0, 255, w) + shift, 0, 255)
                .astype(np.uint8), (h, 1))
            return np.stack([g, g, g], axis=2)

        def checker(cell, w=48, h=32):
            yy, xx = np.mgrid[0:h, 0:w]
            g = (((yy // cell) + (xx // cell)) % 2 * 255).astype(np.uint8)
            return np.stack([g, g, g], axis=2)

        def grad_v(w=48, h=32):
            g = np.tile(np.linspace(0, 255, h, dtype=np.uint8)[:, None],
                        (1, w))
            return np.stack([g, g, g], axis=2)

        base = [grad_h(), checker(5), grad_v(), checker(7)]
        near = [grad_h(shift=4), checker(5), grad_v(), checker(7)]
        # shares ONLY slot 0 with base — below min_matching_frames=3
        partial = [grad_h(), checker(11), grad_h()[::-1].copy(),
                   checker(13)]
        distinct = [grad_v(), grad_v(), checker(11), checker(11)]
        rows = [
            (1, video.encode_avi_mjpeg(base, fps=5)),
            (2, video.encode_avi_mjpeg(near, fps=5)),      # near-dup of 1
            (3, video.encode_avi_mjpeg(base, fps=5)),      # exact re-mux
            (4, video.encode_avi_mjpeg(partial, fps=5)),   # 1 shared slot
            (5, video.encode_avi_mjpeg(distinct, fps=5)),  # unrelated
            (6, b"not a video"),                           # undecodable
        ]
        return spark.createDataFrame(rows, "doc_id long, payload binary")

    def test_clusters(self, vids):
        from hive2es_offline_spark.operators.dedup import video_dedup

        out = video_dedup(vids, num_frames=4, max_hamming=3,
                          min_matching_frames=3).collect()
        comp = {r["doc_id"]: r["component"] for r in out}
        ok = {r["doc_id"]: r["frames_ok"] for r in out}
        # 1, 2, 3 cluster (exact re-mux + per-frame near-dup)
        assert comp[1] == comp[2] == comp[3] == 1
        # 4 shares only one slot -> its own component; 5 unrelated
        assert comp[4] == 4 and comp[5] == 5
        # undecodable: zero ok frames, own component
        assert comp[6] == 6 and ok[6] == 0
        assert ok[1] == 4

    def test_threshold_boundary(self, vids):
        from hive2es_offline_spark.operators.dedup import video_dedup

        # with min_matching_frames=1 the shared slot 0 pulls 4 into the
        # 1/2/3 cluster
        out = video_dedup(vids, num_frames=4, max_hamming=3,
                          min_matching_frames=1).collect()
        comp = {r["doc_id"]: r["component"] for r in out}
        assert comp[4] == comp[1] == 1
        assert comp[5] == 5

    def test_rejects(self, vids):
        from hive2es_offline_spark.operators.dedup import video_dedup

        with pytest.raises(ValueError, match="num_chunks"):
            video_dedup(vids, num_chunks=5)
        with pytest.raises(ValueError, match="min_matching_frames"):
            video_dedup(vids, num_frames=4, min_matching_frames=9)
        with pytest.raises(ValueError, match="alignment"):
            video_dedup(vids, alignment="fuzzy")

    def test_set_alignment_survives_trim_shift(self, spark):
        """Round 15 (VERDICT r14 #8): a re-cut that shifts the timeline
        defeats slot alignment but clusters under set overlap."""
        from hive2es_offline_spark.operators.dedup import video_dedup

        def checker(cell, w=48, h=32):
            yy, xx = np.mgrid[0:h, 0:w]
            g = (((yy // cell) + (xx // cell)) % 2 * 255).astype(np.uint8)
            return np.stack([g, g, g], axis=2)

        def grad_v(w=48, h=32):
            g = np.tile(np.linspace(0, 255, h, dtype=np.uint8)[:, None],
                        (1, w))
            return np.stack([g, g, g], axis=2)

        def grad_h(w=48, h=32):
            g = np.tile(np.linspace(0, 255, w).astype(np.uint8), (h, 1))
            return np.stack([g, g, g], axis=2)

        f0, f1, f2, f3 = grad_h(), checker(5), grad_v(), checker(7)
        base = [f0, f1, f2, f3]
        trimmed = [f1, f2, f3, checker(11)]   # intro cut, one new tail
        unrelated = [checker(3), grad_v()[::-1].copy(),
                     checker(9), grad_h()[:, ::-1].copy()]
        vids = spark.createDataFrame(
            [(1, video.encode_avi_mjpeg(base, fps=5)),
             (2, video.encode_avi_mjpeg(trimmed, fps=5)),
             (3, video.encode_avi_mjpeg(unrelated, fps=5))],
            "doc_id long, payload binary")
        slot = video_dedup(vids, num_frames=4, max_hamming=3,
                           min_matching_frames=3).collect()
        comp_slot = {r["doc_id"]: r["component"] for r in slot}
        # the documented slot-mode recall bound: the shift breaks every
        # slot pairing
        assert comp_slot[1] == 1 and comp_slot[2] == 2
        both = video_dedup(vids, num_frames=4, max_hamming=3,
                           min_matching_frames=3,
                           alignment="set").collect()
        comp_set = {r["doc_id"]: r["component"] for r in both}
        assert comp_set[1] == comp_set[2] == 1  # trim-shift closed
        assert comp_set[3] == 3                 # still no false pair


def test_fused_frame_dhash_matches_composed_path(spark):
    """Round-15 fusion pin (guide §4.2): ``video_frame_dhashes`` must
    produce bit-identical hashes to the composed sample_video_frames →
    dhash_images pipeline it replaced inside ``video_dedup`` — the PNG
    encode/decode it skips is a lossless uint8 round-trip."""
    from hive2es_offline_spark.operators.multimodal import dhash_images

    ids = spark.range(5).withColumnRenamed("id", "doc_id")
    payloads = video.with_avi_payload(ids, n_frames=6, style="textured")
    bad = spark.createDataFrame(
        [(99, bytearray(b"mp4junk"))], "doc_id long, payload binary")
    payloads = payloads.unionByName(bad)

    fused = {
        (r["doc_id"], r["frame_index"]): (r["dhash"], r["frame_status"])
        for r in video.video_frame_dhashes(payloads, num_frames=3).collect()
    }
    frames = video.sample_video_frames(payloads, num_frames=3)
    composed_ok = {
        (r["doc_id"] // 3, r["doc_id"] % 3): r["dhash"]
        for r in dhash_images(
            frames.where("frame is not null")
            .selectExpr("doc_id * 3 + frame_index as doc_id", "frame"),
            "doc_id", "frame").collect()
    }
    statuses = {
        (r["doc_id"], r["frame_index"]): r["frame_status"]
        for r in frames.collect()
    }
    assert set(fused) == set(statuses)
    for key, (h, st) in fused.items():
        assert st == statuses[key]
        if st == "ok":
            assert h == composed_ok[key], key
        else:
            assert h is None and key not in composed_ok
