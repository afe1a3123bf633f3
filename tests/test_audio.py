"""Real WAV decode + audio features (operators/audio.py)."""

import struct

import numpy as np
import pytest

from hive2es_offline_spark.operators import audio


def sine(freq, rate=8000, seconds=0.5, amp=0.5):
    t = np.arange(int(rate * seconds)) / rate
    return amp * np.sin(2 * np.pi * freq * t)


def test_wav_roundtrip_16bit_exact_quantization():
    x = sine(440)
    payload = audio.encode_wav(x, 8000, bits=16)
    rate, back = audio.decode_wav(payload)
    assert rate == 8000 and back.shape == (4000, 1)
    # 16-bit quantization error bound
    assert np.max(np.abs(back[:, 0] - x)) <= 1.0 / 32768 + 1e-12


def test_wav_roundtrip_float32_near_exact():
    x = sine(123.0, amp=0.9)
    rate, back = audio.decode_wav(audio.encode_wav(x, 8000, bits=32))
    assert np.max(np.abs(back[:, 0] - x)) < 1e-6


def test_wav_stereo_and_24bit():
    left, right = sine(200), sine(400)
    stereo = np.stack([left, right], axis=1)
    rate, back = audio.decode_wav(audio.encode_wav(stereo, 8000))
    assert back.shape == (4000, 2)
    # hand-build a 24-bit mono WAV: value 2^22 -> 0.5
    v = 1 << 22
    data = struct.pack("<BBB", v & 0xFF, (v >> 8) & 0xFF, (v >> 16) & 0xFF) * 10
    fmt = struct.pack("<HHIIHH", 1, 1, 8000, 8000 * 3, 3, 24)
    wav = (b"RIFF" + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(data)) + b"WAVE"
           + b"fmt " + struct.pack("<I", len(fmt)) + fmt
           + b"data" + struct.pack("<I", len(data)) + data)
    rate, back = audio.decode_wav(wav)
    assert np.allclose(back, 0.5)


def test_wav_extensible_and_unknown_chunks():
    x = sine(300)
    base = audio.encode_wav(x, 8000, bits=16)
    # rebuild with WAVE_FORMAT_EXTENSIBLE fmt and a LIST chunk before data
    fmt16 = struct.pack("<HHIIHH", 0xFFFE, 1, 8000, 16000, 2, 16)
    ext = struct.pack("<HHI", 22, 16, 0x4) + struct.pack("<H", 1) + b"\x00" * 14
    fmt = fmt16 + ext
    data = base[base.index(b"data") + 8:]
    junk = b"LIST" + struct.pack("<I", 4) + b"INFO"
    wav = (b"RIFF" + struct.pack("<I", 0) + b"WAVE"
           + b"fmt " + struct.pack("<I", len(fmt)) + fmt + junk
           + b"data" + struct.pack("<I", len(data)) + data)
    rate, back = audio.decode_wav(wav)
    assert rate == 8000 and len(back) == 4000


def test_wav_rejects_garbage_and_compressed():
    assert audio.decode_wav(b"not a wav") is None
    assert audio.decode_wav(b"RIFF\x00\x00\x00\x00WAVE") is None
    # ADPCM format code 2 -> refused, not garbled
    fmt = struct.pack("<HHIIHH", 2, 1, 8000, 8000, 1, 4)
    wav = (b"RIFF" + struct.pack("<I", 0) + b"WAVE"
           + b"fmt " + struct.pack("<I", len(fmt)) + fmt
           + b"data" + struct.pack("<I", 4) + b"\x00\x00\x00\x00")
    assert audio.decode_wav(wav) is None


def test_features_track_signal_physics():
    rate = 8000
    f = 1000.0
    feats = audio._wav_features(rate, sine(f, rate=rate, amp=0.5)[:, None])
    duration, rms, zcr, centroid, rolloff, bandwidth, flatness, peak = feats[:8]
    assert duration == pytest.approx(0.5)
    assert rms == pytest.approx(0.5 / np.sqrt(2), rel=1e-3)
    # a sine at f crosses zero 2f times per second -> zcr = 2f/rate
    assert zcr == pytest.approx(2 * f / rate, rel=0.01)
    # spectral centroid at f, normalized by nyquist
    assert centroid == pytest.approx(f / (rate / 2), rel=0.01)
    assert peak == pytest.approx(0.5, rel=1e-3)
    assert bandwidth < 0.02  # pure tone: almost no spread
    assert flatness < 0.01  # pure tone: very peaky spectrum


def test_spark_meta_and_features(spark):
    ids = spark.range(6).withColumnRenamed("id", "doc_id")
    payloads = audio.with_wav_payload(ids)
    meta = audio.decode_audio_meta(payloads).collect()
    assert all(r["decode_status"] == "ok" for r in meta)
    assert all(r["sample_rate"] == 8000 and r["duration_s"] == 0.5 for r in meta)
    feats = audio.extract_audio_features(payloads).collect()
    assert all(r["decode_status"] == "ok" for r in feats)
    assert all(len(r["feature"]) == audio.AUDIO_FEATURE_DIM for r in feats)
    # ids 0 and 5 have different sine mixes -> different spectra
    by_id = {r["doc_id"]: r["feature"] for r in feats}
    assert by_id[0] != by_id[5]


def test_spark_undecodable_policy(spark):
    df = spark.createDataFrame([(1, bytearray(b"mp3junk"))], "doc_id long, payload binary")
    out = audio.extract_audio_features(df).collect()
    assert out[0]["feature"] is None and out[0]["decode_status"] == "undecodable"
    with pytest.raises(Exception):
        audio.extract_audio_features(df, on_undecodable="raise").collect()
    with pytest.raises(ValueError):
        audio.extract_audio_features(df, on_undecodable="fake")


def test_features_analytic_oracle_rolloff_bands_two_tone():
    """VERDICT r7 #7: closed-form analytic oracle for the features no
    external library is needed to derive.  A pure tone at an exact FFT bin
    concentrates ALL power at that bin, so rolloff85 == f/nyquist and the
    8-band energy profile is one-hot; two equal-power tones put the
    centroid at the midpoint and the rolloff at the HIGHER tone (each tone
    carries 50% < the 85% threshold)."""
    rate, n = 8000, 4000  # 0.5 s; bin width = rate/n = 2 Hz
    nyq = rate / 2.0

    # pure tone at 1000 Hz (exact bin: 1000/2 = bin 500)
    f = 1000.0
    feats = audio._wav_features(rate, sine(f, rate=rate)[:, None])
    rolloff, bands = feats[4], feats[8:]
    assert rolloff == pytest.approx(f / nyq, abs=0.001)
    # 8 equal bands over [0, nyq]: 1000 Hz lies in band 2 ([1000, 1500))
    assert int(np.argmax(bands)) == 2
    others = sum(b for i, b in enumerate(bands) if i != 2)
    assert others < 0.01 * bands[2]

    # two equal tones at 500 and 3000 Hz
    f1, f2 = 500.0, 3000.0
    x = sine(f1, rate=rate, amp=0.35) + sine(f2, rate=rate, amp=0.35)
    feats = audio._wav_features(rate, x[:, None])
    centroid, rolloff, bands = feats[3], feats[4], feats[8:]
    assert centroid == pytest.approx((f1 + f2) / 2.0 / nyq, abs=0.002)
    assert rolloff == pytest.approx(f2 / nyq, abs=0.001)
    # bands: 500 Hz -> band 1 ([500,1000)), 3000 Hz -> band 6 ([3000,3500))
    hot = sorted(np.argsort(bands)[-2:].tolist())
    assert hot == [1, 6]
    # equal power split between the two hot bands (log1p of equal energies)
    assert bands[1] == pytest.approx(bands[6], rel=0.01)
