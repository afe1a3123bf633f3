"""Video columns: real AVI (RIFF) container parse + MJPEG frame decode.

Completes the multimodal set (images: ``multimodal.py`` codecs; audio:
``audio.py`` WAV) with a real video path built entirely from public
formats this repo already decodes: AVI is a RIFF container, and an MJPEG
video stream is one baseline/progressive JPEG per frame — which
``operators/jpeg.py`` decodes for real.  Same contract as the other
modalities: genuinely parse what we claim (AVI structure for ANY codec,
pixel decode for MJPEG), NULL + ``decode_status`` for compressed codecs
we can't decode (H.264/VP9 need entropy decoders the sandbox doesn't
ship; the ``mapInPandas`` seam is where a pyav/ffmpeg swap plugs in),
and no fabricated frames ever.

Scale notes: container parse + frame decode run in one ``mapInPandas``
(map-only, no shuffle).  Frame sampling is flatMap-shaped: one output row
per sampled frame, each a standalone PNG ready for
``multimodal.extract_features`` / ``resize_images``.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from .jpeg import decode_jpeg_pixels, encode_jpeg
from .multimodal import encode_png
from .riff import walk_chunks

__all__ = [
    "encode_avi_mjpeg",
    "parse_avi",
    "with_avi_payload",
    "decode_video_meta",
    "sample_video_frames",
    "video_frame_dhashes",
]


def encode_avi_mjpeg(frames: list[np.ndarray], fps: int = 10) -> bytes:
    """Encode RGB frames (uint8 ``(h, w, 3)``, equal sizes) as a minimal
    MJPEG AVI — exists so the parser + frame decoder are round-trip
    testable without third-party muxers."""
    if not frames:
        raise ValueError("need at least one frame")
    h, w = frames[0].shape[:2]
    jpegs = [encode_jpeg(np.asarray(f, dtype=np.uint8)) for f in frames]

    def chunk(cid: bytes, body: bytes) -> bytes:
        return cid + struct.pack("<I", len(body)) + body + (b"\x00" if len(body) & 1 else b"")

    def lst(ltype: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", ltype + body)

    us_per_frame = 1_000_000 // fps
    max_bytes = max(len(j) for j in jpegs)
    avih = struct.pack(
        "<14I", us_per_frame, max_bytes * fps, 0, 0x10, len(jpegs), 0, 1,
        max_bytes, w, h, 0, 0, 0, 0,
    )
    strh = b"vids" + b"MJPG" + struct.pack(
        "<IHHIIIIIIIII", 0, 0, 0, 0, 1, fps, 0, len(jpegs), max_bytes,
        0xFFFFFFFF, 0, (w << 16) | h,
    )
    strf = struct.pack("<IiiHH4sIiiII", 40, w, h, 1, 24, b"MJPG",
                       w * h * 3, 0, 0, 0, 0)
    hdrl = lst(b"hdrl", chunk(b"avih", avih)
               + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)))
    movi = lst(b"movi", b"".join(chunk(b"00dc", j) for j in jpegs))
    body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(body)) + body


def parse_avi(payload: bytes) -> dict | None:
    """Parse an AVI container: header metadata + the video stream's frame
    chunks (codec-agnostic — frames come back as raw chunk bytes).
    Returns None for non-AVI payloads."""
    try:
        if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"AVI ":
            return None
        meta: dict = {"frames": []}

        def walk(pos: int, end: int) -> None:
            for cid, body_start, body_end in walk_chunks(payload, pos, end):
                if cid == b"LIST":
                    walk(body_start + 4, body_end)  # skip the list type tag
                elif cid == b"avih":
                    vals = struct.unpack("<14I", payload[body_start : body_start + 56])
                    meta["us_per_frame"] = vals[0]
                    meta["n_frames_declared"] = vals[4]
                    meta["width"], meta["height"] = vals[8], vals[9]
                elif cid == b"strh":
                    if payload[body_start : body_start + 4] == b"vids":
                        meta["codec"] = (
                            payload[body_start + 4 : body_start + 8]
                            .decode("ascii", "replace").strip("\x00 ")
                        )
                elif cid[2:4] in (b"dc", b"db") and cid[:2].isdigit():
                    meta["frames"].append(payload[body_start:body_end])

        walk(12, len(payload))
        if "width" not in meta or not meta["frames"]:
            return None
        meta["fps"] = (
            round(1_000_000 / meta["us_per_frame"], 3) if meta.get("us_per_frame") else None
        )
        return meta
    except Exception:
        return None


def with_avi_payload(
    df: DataFrame, id_col: str = "doc_id", n_frames: int = 6,
    style: str = "gradient",
) -> DataFrame:
    """Attach a deterministic REAL MJPEG-AVI payload per row — the
    harness stand-in for a video corpus, generated in ``mapInPandas``.

    ``style="gradient"`` (the historical default) varies only a uniform
    brightness base per id — structurally IDENTICAL videos, which a
    perceptual hash correctly sees as near-dups.  ``style="textured"``
    varies the pattern STRUCTURE per id (stripe/checker/diagonal mode ×
    cell size), so different ids hash far apart — the fixture shape
    ``video_dedup`` needs to demonstrate cluster separation."""
    if style not in ("gradient", "textured"):
        raise ValueError(f"unsupported style: {style!r} "
                         "(gradient | textured)")

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        w, h = 24, 16
        yy, xx = np.mgrid[0:h, 0:w]
        for pdf in batches:
            payloads = []
            for i in pdf[id_col]:
                k = int(i)
                frames = []
                for t in range(n_frames):
                    img = np.zeros((h, w, 3), np.uint8)
                    if style == "gradient":
                        base = (k * 37) % 200
                        img[:, :, 0] = (base + 10 * t + xx * 4) % 256
                        img[:, :, 1] = (yy * 8 + 5 * t) % 256
                        img[:, :, 2] = (base + 31 * t) % 256
                    else:
                        c = 3 + (k % 5)
                        mode = (k // 5) % 4
                        if mode == 0:
                            g = ((xx + t) // c) % 2 * 255
                        elif mode == 1:
                            g = ((yy + t) // c) % 2 * 255
                        elif mode == 2:
                            g = (((xx + t) // c) + (yy // c)) % 2 * 255
                        else:
                            g = ((xx + yy + t) // c) % 2 * 255
                        img[:, :, 0] = img[:, :, 1] = img[:, :, 2] = g
                    frames.append(img)
                payloads.append(encode_avi_mjpeg(frames, fps=5))
            yield pd.DataFrame(
                {"doc_id": pdf[id_col].astype("int64"), "payload": payloads}
            )

    return df.select(id_col).mapInPandas(gen, "doc_id long, payload binary")


VIDEO_META_SCHEMA = (
    "doc_id long, width int, height int, fps double, n_frames int, "
    "codec string, duration_s double, decode_status string"
)


def decode_video_meta(
    df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload"
) -> DataFrame:
    """Binary payload -> typed video metadata (container-level: works for
    any codec inside the AVI); non-AVI payloads yield NULLs + reason."""

    def meta(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i, p in zip(pdf[id_col], pdf[payload_col]):
                m = parse_avi(bytes(p))
                if m is None:
                    rows.append((int(i), None, None, None, None, None, None,
                                 "undecodable"))
                else:
                    n = len(m["frames"])
                    dur = round(n / m["fps"], 6) if m.get("fps") else None
                    rows.append(
                        (int(i), m["width"], m["height"], m.get("fps"), n,
                         m.get("codec"), dur, "ok")
                    )
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "width", "height", "fps", "n_frames",
                         "codec", "duration_s", "decode_status"],
            )

    return df.select(id_col, payload_col).mapInPandas(meta, VIDEO_META_SCHEMA)


VIDEO_FRAME_SCHEMA = (
    "doc_id long, frame_index int, frame binary, frame_status string"
)


def sample_video_frames(
    df: DataFrame,
    num_frames: int = 4,
    id_col: str = "doc_id",
    payload_col: str = "payload",
) -> DataFrame:
    """AVI payload -> N evenly-spaced REAL frames, each decoded from its
    MJPEG chunk (``jpeg.decode_jpeg_pixels``) and re-encoded as a
    standalone PNG — valid images ready for
    ``multimodal.extract_features`` / ``resize_images``.  Non-AVI payloads
    or codecs without a pixel decoder (H.264 etc.) emit NULL frames with a
    reason (``undecodable`` / ``no_pixel_codec``) — never fabricated
    bytes."""

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames, status = [], [], [], []

            def emit(did: int, i: int, frame, st: str) -> None:
                ids.append(did)
                idxs.append(i)
                frames.append(frame)
                status.append(st)

            for did, p in zip(pdf[id_col], pdf[payload_col]):
                m = parse_avi(bytes(p))
                if m is None:
                    for i in range(num_frames):
                        emit(int(did), i, None, "undecodable")
                    continue
                picks = (
                    np.linspace(0, len(m["frames"]) - 1, num_frames)
                    .round().astype(int)
                )
                for i, fi in enumerate(picks):
                    pixels = decode_jpeg_pixels(m["frames"][fi])
                    if pixels is None:
                        emit(int(did), i, None, "no_pixel_codec")
                    else:
                        emit(int(did), i, encode_png(pixels), "ok")
            yield pd.DataFrame(
                {"doc_id": ids, "frame_index": idxs, "frame": frames,
                 "frame_status": status}
            )

    return df.select(id_col, payload_col).mapInPandas(sample, VIDEO_FRAME_SCHEMA)


VIDEO_FRAME_DHASH_SCHEMA = (
    "doc_id long, frame_index int, dhash long, frame_status string"
)


def video_frame_dhashes(
    df: DataFrame,
    num_frames: int = 4,
    id_col: str = "doc_id",
    payload_col: str = "payload",
) -> DataFrame:
    """AVI payload -> per-slot 64-bit dHash in ONE Arrow pass: the fused
    form of ``sample_video_frames`` + ``multimodal.dhash_images`` for
    consumers that only need the hash (``dedup.video_dedup``).

    The composed pair PNG-encodes every sampled frame only for
    ``dhash_images`` to immediately PNG-decode it — a lossless uint8
    round-trip (``encode_png``/``decode_png_pixels`` preserve the RGB
    array bit-for-bit), so hashing the JPEG-decoded pixels directly
    yields the IDENTICAL hash while skipping both PNG codec passes and
    shipping 8 bytes per frame out of Python instead of the encoded
    frame image (equality is regression-pinned in tests/test_video.py).
    Status strings match ``sample_video_frames``: ``ok`` rows carry the
    hash, ``undecodable`` / ``no_pixel_codec`` rows carry NULL."""
    from .multimodal import dhash64

    def hash_frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, hashes, status = [], [], [], []

            def emit(did: int, i: int, h, st: str) -> None:
                ids.append(did)
                idxs.append(i)
                hashes.append(h)
                status.append(st)

            for did, p in zip(pdf[id_col], pdf[payload_col]):
                m = parse_avi(bytes(p))
                if m is None:
                    for i in range(num_frames):
                        emit(int(did), i, None, "undecodable")
                    continue
                picks = (
                    np.linspace(0, len(m["frames"]) - 1, num_frames)
                    .round().astype(int)
                )
                for i, fi in enumerate(picks):
                    pixels = decode_jpeg_pixels(m["frames"][fi])
                    if pixels is None:
                        emit(int(did), i, None, "no_pixel_codec")
                    else:
                        emit(int(did), i, dhash64(pixels), "ok")
            yield pd.DataFrame(
                {"doc_id": ids, "frame_index": idxs,
                 "dhash": pd.array(hashes, dtype="Int64"),
                 "frame_status": status}
            )

    return df.select(id_col, payload_col).mapInPandas(
        hash_frames, VIDEO_FRAME_DHASH_SCHEMA)
