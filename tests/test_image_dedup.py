"""Image perceptual near-dup via 64-bit dHash (VERDICT r11 #4):
analytic fixtures — re-encoded copies (PNG→JPEG at different chroma
settings) must cluster; visually distinct images must not; identical
bytes collapse exactly; undecodable payloads stay NULL-hashed."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from hive2es_offline_spark.operators.dedup import image_dedup
from hive2es_offline_spark.operators.jpeg import encode_jpeg
from hive2es_offline_spark.operators.multimodal import (
    dhash64,
    dhash_images,
    encode_png,
)


def _gradient_h(w=64, h=64):
    g = np.tile(np.linspace(0, 255, w, dtype=np.uint8), (h, 1))
    return np.stack([g, g, g], axis=2)


def _gradient_v(w=64, h=64):
    # brightens downward (a darkening one has every v-bit CLEAR, which is
    # the same all-ties hash as a solid color — inherent to dHash)
    g = np.tile(np.linspace(0, 255, h, dtype=np.uint8)[:, None], (1, w))
    return np.stack([g, g, g], axis=2)


def _checker(w=64, h=64, cell=5):
    # cell=5 does NOT divide the 4x9/9x4 block grid, so block means vary
    # (an aligned checker averages to a constant = the all-ties hash)
    yy, xx = np.mgrid[0:h, 0:w]
    g = (((yy // cell) + (xx // cell)) % 2 * 255).astype(np.uint8)
    return np.stack([g, g, g], axis=2)


@pytest.fixture()
def images(spark):
    grad = _gradient_h()
    rows = [
        (1, encode_png(grad)),                       # PNG original
        (2, encode_jpeg(grad)),                      # JPEG re-encode 4:4:4
        (3, encode_jpeg(grad, subsampling="420")),   # JPEG re-encode 4:2:0
        (4, encode_png(_gradient_v())),              # distinct direction
        (5, encode_png(_checker())),                 # distinct pattern
        (6, encode_png(np.full((32, 32, 3), 200, np.uint8))),  # solid
        (7, encode_png(np.full((32, 32, 3), 200, np.uint8))),  # same bytes
        (8, b"not an image at all"),                 # undecodable
    ]
    return spark.createDataFrame(rows, "doc_id long, payload binary")


def test_dhash_vector_properties():
    # horizontal gradient: all 32 h-bits set, all v-bits clear
    hh = dhash64(_gradient_h())
    assert (hh >> 32) & 0xFFFFFFFF == 0xFFFFFFFF and hh & 0xFFFFFFFF == 0
    # vertical gradient brightens downward: all 32 v-bits set
    vv = dhash64(_gradient_v().mean(axis=2))
    assert vv & 0xFFFFFFFF == 0xFFFFFFFF and (vv >> 32) & 0xFFFFFFFF == 0
    up = np.tile(np.linspace(0, 255, 64, dtype=np.uint8)[:, None], (1, 64))
    assert dhash64(up) & 0xFFFFFFFF == 0xFFFFFFFF  # all v-bits set
    rev = np.tile(np.linspace(255, 0, 64, dtype=np.uint8), (64, 1))
    assert dhash64(rev) == 0
    # a solid image is all-ties = 0, DISTINCT from any gradient
    assert dhash64(np.full((32, 32), 99, np.uint8)) == 0 != hh
    # hash fits a signed 64-bit long both ways
    assert -(1 << 63) <= dhash64(_checker()) < (1 << 63)


def test_reencodes_cluster_distinct_do_not(images):
    out = {r["doc_id"]: r for r in image_dedup(images).collect()}
    # PNG + both JPEG re-encodes of the SAME gradient cluster together
    assert out[1]["component"] == out[2]["component"] == out[3]["component"]
    # distinct images each keep their own component
    comps = {out[i]["component"] for i in (1, 4, 5)}
    assert len(comps) == 3
    # identical bytes collapse via the exact-hash path
    assert out[6]["component"] == out[7]["component"]
    assert out[6]["component"] not in {out[1]["component"],
                                       out[4]["component"]}
    # undecodable: NULL hash, own component, loud status
    assert out[8]["dhash"] is None
    assert out[8]["decode_status"] == "undecodable"
    assert out[8]["component"] == 8


def test_dhash_images_statuses(images, spark):
    rows = {r["doc_id"]: r for r in dhash_images(images).collect()}
    assert rows[1]["decode_status"] == "ok"
    assert rows[8]["dhash"] is None
    # identical solid images: identical hashes
    assert rows[6]["dhash"] == rows[7]["dhash"]
    # near-dup re-encodes: small hamming, not necessarily equal
    h1, h2 = rows[1]["dhash"], rows[2]["dhash"]
    assert bin((h1 ^ h2) & ((1 << 64) - 1)).count("1") <= 3


def test_bucket_cap_keeps_exact_collapse(spark):
    # with a pathological cap of 1, near-dup EDGES may be lost but the
    # exact-hash collapse must still hold
    grad = _gradient_h()
    rows = [(i, encode_png(grad)) for i in range(1, 6)]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    out = image_dedup(df, max_bucket_size=1).collect()
    assert {r["component"] for r in out} == {1}
