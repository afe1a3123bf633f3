"""Audio columns: real RIFF/WAVE decode + spectral features, Arrow-batched.

Extends the multimodal surface (``operators/multimodal.py``: images as
opaque ``binary`` columns + typed metadata) to audio with the same
contract: a REAL pure-stdlib+numpy decoder for the formats it claims
(PCM / IEEE-float WAV — 8/16/24/32-bit int, 32/64-bit float, any channel
count), NULL + ``decode_status`` for everything else (MP3/OGG/FLAC need
entropy codecs this sandbox doesn't ship — the ``mapInPandas`` seam is
the same, so a native codec swap is config, not redesign), and fakes only
by explicit opt-in.

Scale notes: decode + featurize run inside one ``mapInPandas`` over Arrow
batches — map-only, no shuffle, no driver data movement.  Features are
fixed-dim ``array<float>`` matching the ``embeddings`` table convention,
so the similarity/dedup operators compose directly (audio near-dup =
``cosine_self_pairs`` over these vectors).
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .riff import walk_chunks

__all__ = [
    "decode_wav",
    "encode_wav",
    "with_wav_payload",
    "decode_audio_meta",
    "extract_audio_features",
]

_WAVE_FORMAT_PCM = 1
_WAVE_FORMAT_IEEE_FLOAT = 3
_WAVE_FORMAT_EXTENSIBLE = 0xFFFE


def decode_wav(payload: bytes) -> tuple[int, np.ndarray] | None:
    """Decode a RIFF/WAVE payload to ``(sample_rate, samples)`` where
    ``samples`` is float64 in [-1, 1], shape ``(n_frames, n_channels)``.

    Supports PCM 8 (unsigned) / 16 / 24 / 32-bit and IEEE float 32/64,
    including WAVE_FORMAT_EXTENSIBLE wrappers; chunk walk skips unknown
    chunks (LIST/fact/cue) per RIFF rules (word-aligned sizes).  Returns
    None for non-WAV or compressed formats — the caller's
    ``on_undecodable`` policy applies, never a fake.
    """
    try:
        if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
            return None
        fmt = None
        data = None
        for cid, body_start, body_end in walk_chunks(payload, 12, len(payload)):
            body = payload[body_start:body_end]
            if cid == b"fmt ":
                if len(body) < 16:
                    return None
                (afmt, channels, rate, _br, _ba, bits) = struct.unpack(
                    "<HHIIHH", body[:16]
                )
                if afmt == _WAVE_FORMAT_EXTENSIBLE:
                    # cbSize(2) + validBits(2) + mask(4) + GUID: first two
                    # GUID bytes carry the real format code
                    if len(body) < 26:
                        return None
                    (afmt,) = struct.unpack("<H", body[24:26])
                fmt = (afmt, channels, rate, bits)
            elif cid == b"data":
                data = body
        if fmt is None or data is None:
            return None
        afmt, channels, rate, bits = fmt
        if channels < 1 or rate <= 0:
            return None
        if afmt == _WAVE_FORMAT_PCM:
            if bits == 8:
                x = np.frombuffer(data, dtype=np.uint8).astype(np.float64)
                x = (x - 128.0) / 128.0
            elif bits == 16:
                x = np.frombuffer(data, dtype="<i2").astype(np.float64) / 32768.0
            elif bits == 24:
                raw = np.frombuffer(data[: len(data) - len(data) % 3], dtype=np.uint8)
                raw = raw.reshape(-1, 3).astype(np.uint32)
                v = raw[:, 0] | (raw[:, 1] << 8) | (raw[:, 2] << 16)
                v = v.astype(np.int32)
                v[v >= 1 << 23] -= 1 << 24  # sign-extend
                x = v.astype(np.float64) / float(1 << 23)
            elif bits == 32:
                x = np.frombuffer(data, dtype="<i4").astype(np.float64) / float(1 << 31)
            else:
                return None
        elif afmt == _WAVE_FORMAT_IEEE_FLOAT:
            if bits == 32:
                x = np.frombuffer(data, dtype="<f4").astype(np.float64)
            elif bits == 64:
                x = np.frombuffer(data, dtype="<f8").astype(np.float64)
            else:
                return None
        else:
            return None  # compressed (MP3-in-WAV, ADPCM, ...) — no decoder
        frames = len(x) // channels
        if frames == 0:
            return None
        return int(rate), x[: frames * channels].reshape(frames, channels)
    except Exception:
        return None


def encode_wav(samples: np.ndarray, sample_rate: int, bits: int = 16) -> bytes:
    """Encode float samples in [-1, 1] (``(frames,)`` or
    ``(frames, channels)``) as PCM WAV — exists so the decoder is
    round-trip-testable without third-party codecs.  ``bits``: 16 (PCM)
    or 32 (IEEE float)."""
    x = np.asarray(samples, dtype=np.float64)
    if x.ndim == 1:
        x = x[:, None]
    frames, channels = x.shape
    if bits == 16:
        pcm = np.clip(np.round(x * 32768.0), -32768, 32767).astype("<i2")
        data = pcm.tobytes()
        afmt, bytes_per = _WAVE_FORMAT_PCM, 2
    elif bits == 32:
        data = x.astype("<f4").tobytes()
        afmt, bytes_per = _WAVE_FORMAT_IEEE_FLOAT, 4
    else:
        raise ValueError("bits must be 16 (PCM) or 32 (float)")
    block = channels * bytes_per
    fmt = struct.pack(
        "<HHIIHH", afmt, channels, sample_rate, sample_rate * block, block, bits
    )
    out = b"fmt " + struct.pack("<I", len(fmt)) + fmt
    out += b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", 4 + len(out)) + b"WAVE" + out


def with_wav_payload(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Attach a deterministic REAL WAV payload per row (sine mixture whose
    frequencies derive from the id) — the harness stand-in for an audio
    corpus, mirroring ``with_png_payload``.  Generated in ``mapInPandas``
    so no payload bytes ever route through the driver."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        rate = 8000
        t = np.arange(rate // 2, dtype=np.float64) / rate  # 0.5 s
        for pdf in batches:
            payloads = []
            for i in pdf[id_col]:
                f1 = 200.0 + (int(i) % 17) * 100.0
                f2 = 300.0 + (int(i) % 5) * 250.0
                x = 0.6 * np.sin(2 * np.pi * f1 * t) + 0.3 * np.sin(2 * np.pi * f2 * t)
                payloads.append(encode_wav(x, rate))
            yield pd.DataFrame(
                {"doc_id": pdf[id_col].astype("int64"), "payload": payloads}
            )

    return df.select(id_col).mapInPandas(gen, "doc_id long, payload binary")


AUDIO_META_SCHEMA = (
    "doc_id long, sample_rate int, n_channels int, n_frames long, "
    "duration_s double, decode_status string"
)


def decode_audio_meta(
    df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload"
) -> DataFrame:
    """Binary payload -> typed audio metadata; undecodable payloads yield
    NULL fields + a ``decode_status`` reason (never fabricated)."""

    def meta(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i, p in zip(pdf[id_col], pdf[payload_col]):
                dec = decode_wav(bytes(p))
                if dec is None:
                    rows.append((int(i), None, None, None, None, "undecodable"))
                else:
                    rate, x = dec
                    rows.append(
                        (int(i), rate, x.shape[1], x.shape[0],
                         round(x.shape[0] / rate, 6), "ok")
                    )
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "sample_rate", "n_channels", "n_frames",
                         "duration_s", "decode_status"],
            )

    return df.select(id_col, payload_col).mapInPandas(meta, AUDIO_META_SCHEMA)


AUDIO_FEATURE_SCHEMA = "doc_id long, feature array<float>, decode_status string"

#: feature layout: [duration_s, rms, zero_crossing_rate, spectral_centroid,
#: rolloff85, bandwidth, flatness, peak] + 8 log band energies = 16 dims
AUDIO_FEATURE_DIM = 16


def _wav_features(rate: int, x: np.ndarray) -> list[float]:
    mono = x.mean(axis=1)
    n = len(mono)
    duration = n / rate
    rms = float(np.sqrt(np.mean(mono**2)))
    zcr = float(np.mean(np.abs(np.diff(np.signbit(mono).astype(np.int8)))))
    spec = np.abs(np.fft.rfft(mono))
    power = spec**2
    freqs = np.fft.rfftfreq(n, d=1.0 / rate)
    nyq = rate / 2.0
    total = float(power.sum()) or 1.0
    centroid = float((freqs * power).sum() / total) / nyq
    cum = np.cumsum(power)
    rolloff = float(freqs[int(np.searchsorted(cum, 0.85 * cum[-1]))]) / nyq
    bandwidth = float(
        np.sqrt(((freqs - centroid * nyq) ** 2 * power).sum() / total)
    ) / nyq
    flatness = float(
        np.exp(np.mean(np.log(power + 1e-12))) / (np.mean(power) + 1e-12)
    )
    peak = float(np.max(np.abs(mono)))
    # 8 log-energy bands, equal width over [0, nyquist]
    bands = []
    edges = np.linspace(0, len(power), 9).astype(int)
    for b in range(8):
        e = float(power[edges[b] : edges[b + 1]].sum())
        bands.append(float(np.log1p(e)))
    out = [duration, rms, zcr, centroid, rolloff, bandwidth, flatness, peak] + bands
    return [float(np.round(v, 6)) for v in out]


def extract_audio_features(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    on_undecodable: str = "null",
) -> DataFrame:
    """Binary payload -> 16-dim audio feature vector (duration, RMS, ZCR,
    spectral centroid/rolloff/bandwidth/flatness, peak, 8 log band
    energies — all from the REAL decoded waveform, frequencies normalized
    to Nyquist).  Undecodable payloads follow ``on_undecodable``:
    ``"null"`` (default) emits NULL + reason, ``"raise"`` fails the job —
    there is deliberately no fake for audio (a fabricated spectrum is
    indistinguishable from silence filtering gone wrong)."""
    if on_undecodable not in ("null", "raise"):
        raise ValueError(f"on_undecodable must be 'null' or 'raise', got {on_undecodable!r}")

    def featurize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats, status = [], []
            for p in pdf[payload_col]:
                dec = decode_wav(bytes(p))
                if dec is not None:
                    feats.append(_wav_features(*dec))
                    status.append("ok")
                elif on_undecodable == "raise":
                    raise NotImplementedError(
                        "no audio decoder for payload (MP3/OGG/FLAC/ADPCM); "
                        "on_undecodable='raise' requested strict behavior"
                    )
                else:
                    feats.append(None)
                    status.append("undecodable")
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "feature": feats,
                    "decode_status": status,
                }
            )

    return df.select(id_col, payload_col).mapInPandas(featurize, AUDIO_FEATURE_SCHEMA)
