"""Baseline JPEG codec: analytic fixtures + round-trips + Spark integration.

Solid-color images are DC-only and must decode EXACTLY (independent of any
shared DCT-convention bug between encoder and decoder); gradients bound the
quantization error; 4:2:0 and restart intervals exercise the decoder's
dominant real-world paths.
"""

import numpy as np
import pytest

from hive2es_offline_spark.operators import multimodal
from hive2es_offline_spark.operators.jpeg import (
    _C,
    decode_jpeg_pixels,
    encode_jpeg,
)


def test_dct_matrix_is_orthonormal_and_matches_definition():
    # independent derivation of DCT-II: a(u) cos((2x+1)u pi / 16)
    ref = np.empty((8, 8))
    for u in range(8):
        a = np.sqrt(0.125) if u == 0 else np.sqrt(0.25)
        for x in range(8):
            ref[u, x] = a * np.cos((2 * x + 1) * u * np.pi / 16)
    np.testing.assert_allclose(_C, ref, atol=1e-12)
    np.testing.assert_allclose(_C @ _C.T, np.eye(8), atol=1e-12)


@pytest.mark.parametrize("v", [0, 16, 128, 200, 255])
def test_solid_color_roundtrip_exact(v):
    img = np.full((16, 24, 3), v, np.uint8)
    dec = decode_jpeg_pixels(encode_jpeg(img))
    assert dec is not None and dec.shape == (16, 24, 3)
    assert int(np.abs(dec.astype(int) - int(v)).max()) <= 1  # clip boundary


def test_solid_gray_128_bit_exact():
    # 128 level-shifts to all-zero coefficients: must be EXACT end to end
    img = np.full((24, 24, 3), 128, np.uint8)
    assert np.array_equal(decode_jpeg_pixels(encode_jpeg(img)), img)


@pytest.mark.parametrize("subsampling", ["444", "420", "422", "440"])
@pytest.mark.parametrize("restart_interval", [0, 3])
def test_gradient_roundtrip_all_paths(subsampling, restart_interval):
    img = np.linspace(0, 255, 33 * 41 * 3).reshape(33, 41, 3).astype(np.uint8)
    enc = encode_jpeg(img, subsampling=subsampling, restart_interval=restart_interval)
    dec = decode_jpeg_pixels(enc)
    assert dec is not None and dec.shape == img.shape  # non-MCU-aligned dims crop
    err = np.abs(dec.astype(int) - img.astype(int))
    assert err.mean() < 2.0 and err.max() <= 8  # quantization-level error


def test_solid_420_with_restarts_exact():
    img = np.full((40, 24, 3), 200, np.uint8)
    dec = decode_jpeg_pixels(encode_jpeg(img, subsampling="420", restart_interval=2))
    assert int(np.abs(dec.astype(int) - 200).max()) == 0


def test_rejects_non_jpeg_and_progressive():
    assert decode_jpeg_pixels(b"not an image") is None
    assert decode_jpeg_pixels(b"") is None
    # flip SOF0 (C0) to SOF2 (C2 = progressive): must refuse, not garble
    enc = bytearray(encode_jpeg(np.full((8, 8, 3), 99, np.uint8)))
    i = enc.find(b"\xFF\xC0")
    enc[i + 1] = 0xC2
    assert decode_jpeg_pixels(bytes(enc)) is None


def test_extract_features_uses_real_jpeg_pixels(spark):
    # a solid-color JPEG's pixel histogram concentrates on one bucket —
    # the byte-histogram fake could never produce this
    img = np.full((16, 16, 3), 77, np.uint8)
    df = spark.createDataFrame(
        [(1, bytearray(encode_jpeg(img)))], "doc_id long, payload binary"
    )
    row = multimodal.extract_features(df, dim=16).first()
    assert row["decode_status"] == "ok"
    feat = np.asarray(row["feature"])
    # every decoded pixel shares one value (+-1 quantization), so the
    # histogram concentrates on one bucket — the byte-histogram fake over
    # an entropy-coded stream could never produce this
    assert feat.max() > 0.99
    dec_val = int(decode_jpeg_pixels(encode_jpeg(img))[0, 0, 0])
    assert feat[dec_val % 16] == feat.max()


def test_resize_jpeg_is_format_preserving(spark):
    img = np.full((32, 16, 3), 150, np.uint8)
    df = spark.createDataFrame(
        [(1, bytearray(encode_jpeg(img)))], "doc_id long, payload binary"
    )
    row = multimodal.resize_images(df, 8, 8).first()
    assert row["decode_status"] == "ok"
    out = decode_jpeg_pixels(bytes(row["payload"]))  # output is a VALID jpeg
    assert out is not None and out.shape == (8, 8, 3)
    assert int(np.abs(out.astype(int) - 150).max()) <= 1


def test_rejects_four_component_cmyk():
    # flip SOF0's component count to 4 (Adobe CMYK shape): must refuse,
    # never decode the first 3 planes as YCbCr and call it "ok"
    import struct

    img = np.full((8, 8, 3), 99, np.uint8)
    enc = bytearray(encode_jpeg(img))
    i = enc.find(b"\xFF\xC0")
    # SOF payload: len(2) precision(1) h(2) w(2) ncomp(1)
    assert enc[i + 9] == 3
    enc[i + 9] = 4
    assert decode_jpeg_pixels(bytes(enc)) is None


def test_accepts_ff_fill_bytes_before_markers():
    # T.81 B.1.1.2: markers may be preceded by extra 0xFF fill bytes
    img = np.full((8, 8, 3), 150, np.uint8)
    enc = encode_jpeg(img)
    i = enc.find(b"\xFF\xDB")
    padded = enc[:i] + b"\xFF\xFF\xFF" + enc[i:]
    dec = decode_jpeg_pixels(padded)
    assert dec is not None
    assert int(np.abs(dec.astype(int) - 150).max()) <= 1


def test_grayscale_roundtrip():
    from hive2es_offline_spark.operators.jpeg import encode_jpeg_gray

    # solid gray decodes exactly (rounds, not truncates) and replicates to 3ch
    img = np.full((16, 24), 160, np.uint8)
    dec = decode_jpeg_pixels(encode_jpeg_gray(img))
    assert dec is not None and dec.shape == (16, 24, 3)
    assert int(np.abs(dec.astype(int) - 160).max()) == 0
    assert np.array_equal(dec[:, :, 0], dec[:, :, 1])
    # gradient: quantization-level error
    grad = np.linspace(0, 255, 24 * 32).reshape(24, 32).astype(np.uint8)
    dec = decode_jpeg_pixels(encode_jpeg_gray(grad))
    assert dec.shape == (24, 32, 3)
    assert np.abs(dec[:, :, 0].astype(int) - grad.astype(int)).max() <= 8


def test_progressive_spectral_matches_baseline_exactly():
    # same quantized coefficients, different scan organization: progressive
    # (spectral selection only) must decode BIT-IDENTICAL to baseline
    from hive2es_offline_spark.operators.jpeg import encode_jpeg_progressive

    img = np.linspace(0, 255, 24 * 33 * 3).reshape(24, 33, 3).astype(np.uint8)
    base = decode_jpeg_pixels(encode_jpeg(img))
    prog = decode_jpeg_pixels(encode_jpeg_progressive(img))
    assert prog is not None and np.array_equal(base, prog)


@pytest.mark.parametrize("subsampling", ["444", "420"])
@pytest.mark.parametrize("successive", [False, True])
def test_progressive_matches_baseline_all_layouts(subsampling, successive):
    # DC/AC first passes (Al=1 when successive) + AC refinement with
    # EOB-run correction bits + DC refinement must reconstruct the exact
    # coefficients for both 4:4:4 and the dominant 4:2:0 layout
    from hive2es_offline_spark.operators.jpeg import encode_jpeg_progressive

    rng = np.random.default_rng(3)
    for img in (
        np.linspace(0, 255, 24 * 33 * 3).reshape(24, 33, 3).astype(np.uint8),
        rng.integers(0, 256, (17, 26, 3), dtype=np.uint8),  # dense AC activity
        np.full((16, 16, 3), 190, np.uint8),
    ):
        base = decode_jpeg_pixels(encode_jpeg(img, subsampling=subsampling))
        prog = decode_jpeg_pixels(
            encode_jpeg_progressive(img, successive=successive, subsampling=subsampling)
        )
        assert prog is not None and np.array_equal(base, prog)


def test_progressive_illegal_interleaved_ac_scan_refused():
    # baseline file with SOF0 flipped to SOF2: its interleaved Ss=0,Se=63
    # scan is illegal in progressive — must refuse, not garble
    enc = bytearray(encode_jpeg(np.full((8, 8, 3), 99, np.uint8)))
    i = enc.find(b"\xFF\xC0")
    enc[i + 1] = 0xC2
    assert decode_jpeg_pixels(bytes(enc)) is None


@pytest.mark.parametrize("subsampling", ["444", "420"])
def test_non_interleaved_baseline_matches_interleaved(subsampling):
    """3-component SOF0 with one single-component SOS per component (legal
    per T.81, emitted by some encoders) must decode ALL planes — not just Y
    replicated into gray RGB marked 'ok'."""
    img = np.linspace(0, 255, 33 * 41 * 3).reshape(33, 41, 3).astype(np.uint8)
    inter = encode_jpeg(img, subsampling=subsampling)
    nonin = encode_jpeg(img, subsampling=subsampling, interleaved=False)
    assert inter != nonin  # genuinely different scan layout
    di = decode_jpeg_pixels(inter)
    dn = decode_jpeg_pixels(nonin)
    assert dn is not None
    # identical coefficients, identical reconstruction
    assert np.array_equal(di, dn)


def test_non_interleaved_solid_red_keeps_color():
    """The exact failure mode from review: a solid-red non-interleaved file
    must come back red, not gray."""
    img = np.zeros((16, 16, 3), np.uint8)
    img[:, :, 0] = 255
    dec = decode_jpeg_pixels(encode_jpeg(img, interleaved=False))
    assert dec is not None
    # red channel dominant, chroma planes clearly decoded
    assert dec[:, :, 0].mean() > 200
    assert dec[:, :, 1].mean() < 60 and dec[:, :, 2].mean() < 60


def test_baseline_missing_component_scan_refused():
    """A baseline color frame whose scans never cover Cb/Cr is corrupt —
    refuse instead of rendering the missing planes flat."""
    img = np.full((16, 16, 3), 200, np.uint8)
    data = bytearray(encode_jpeg(img, interleaved=False))
    # drop everything from the SECOND SOS onward, keep EOI
    first_sos = data.index(b"\xFF\xDA")
    second_sos = data.index(b"\xFF\xDA", first_sos + 2)
    truncated = bytes(data[:second_sos]) + b"\xFF\xD9"
    assert decode_jpeg_pixels(truncated) is None
