"""Multimodal pipeline ops (feature/resize/frame-sample plumbing) + IVF ANN."""

from pyspark.sql import functions as F

from hive2es_offline_spark.operators import multimodal, similarity
from hive2es_offline_spark.sources import read_table

from conftest import SF_SMOKE


def _payloads(spark):
    df = spark.createDataFrame(
        [(1, "hello world " * 20), (2, "tiny"), (3, "")], "doc_id long, text string"
    )
    return multimodal.with_binary_payload(df)


def test_extract_features_shape_and_determinism(spark):
    # synthetic (non-image) payloads: the fake byte-histogram path must be
    # OPTED INTO — these tests exercise the batch plumbing, not real pixels
    p = _payloads(spark)
    feats = {
        r["doc_id"]: r["feature"]
        for r in multimodal.extract_features(p, dim=16, on_undecodable="fake").collect()
    }
    assert all(len(v) == 16 for v in feats.values())
    assert abs(sum(feats[1]) - 1.0) < 1e-5  # normalized histogram
    assert feats[3] == [0.0] * 16  # empty payload
    again = {
        r["doc_id"]: r["feature"]
        for r in multimodal.extract_features(p, dim=16, on_undecodable="fake").collect()
    }
    assert feats == again


def test_extract_features_null_by_default_for_undecodable(spark):
    # a payload with no pixel decoder (JPEG/unknown bytes) must yield NULL
    # features under the default policy — fabricated pixels only on request
    import pytest

    p = _payloads(spark)
    rows = {r["doc_id"]: r for r in multimodal.extract_features(p, dim=16).collect()}
    assert all(r["feature"] is None for r in rows.values())
    assert all(r["decode_status"] == "undecodable" for r in rows.values())
    faked = {
        r["doc_id"]: r
        for r in multimodal.extract_features(p, dim=16, on_undecodable="fake").collect()
    }
    assert all(r["feature"] is not None and r["decode_status"] == "fake"
               for r in faked.values())
    with pytest.raises(Exception, match="strict behavior"):
        multimodal.extract_features(p, dim=16, on_undecodable="raise").collect()
    with pytest.raises(ValueError, match="on_undecodable"):
        multimodal.extract_features(p, on_undecodable="bogus")


def test_features_compose_with_similarity(spark):
    p = _payloads(spark)
    feats = (
        multimodal.extract_features(p, dim=16, on_undecodable="fake")
        .withColumnRenamed("feature", "embedding")
    )
    qvec = [float(x) for x in feats.where("doc_id = 1").first()["embedding"]]
    top = similarity.cosine_topk(feats, qvec, k=2, id_col="doc_id")
    assert top.first()["doc_id"] == 1  # self is the best match


def test_resize_respects_budget(spark):
    out = {
        r["doc_id"]: r
        for r in multimodal.resize_images(
            _payloads(spark), 8, 4, on_undecodable="fake"
        ).collect()
    }
    assert all(len(bytes(r["payload"])) == 32 for r in out.values())
    assert out[2]["width"] == 8 and out[2]["height"] == 4


def test_resize_null_by_default_for_undecodable(spark):
    out = {r["doc_id"]: r for r in multimodal.resize_images(_payloads(spark), 8, 4).collect()}
    assert all(r["payload"] is None for r in out.values())
    assert all(r["decode_status"] == "undecodable" for r in out.values())


def test_sample_frames_one_to_n(spark):
    rows = multimodal.sample_frames(_payloads(spark), num_frames=4).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r["frame_index"])
    assert all(sorted(v) == [0, 1, 2, 3] for v in by_doc.values())


def test_ivf_matches_brute_force_when_probing_all(spark):
    e = read_table(spark, "embeddings", SF_SMOKE)
    qvec = [float(x) for x in e.where("vec_id = 0").first()["embedding"]]
    cents = similarity.seeded_centroids(e, 8)
    brute = [r["vec_id"] for r in similarity.cosine_topk(e, qvec, k=10).collect()]
    full_probe = [r["vec_id"] for r in similarity.ivf_topk(e, qvec, cents, k=10, n_probe=8).collect()]
    assert brute == full_probe  # probing every cell == exact search


def test_ivf_narrow_probe_is_subset_quality(spark):
    e = read_table(spark, "embeddings", SF_SMOKE)
    qvec = [float(x) for x in e.where("vec_id = 0").first()["embedding"]]
    cents = similarity.seeded_centroids(e, 8)
    narrow = similarity.ivf_topk(e, qvec, cents, k=10, n_probe=2).collect()
    assert 0 < len(narrow) <= 10
    assert narrow[0]["vec_id"] == 0  # query vector's own cell is probed first


def test_kmeans_refine_recovers_planted_clusters(spark):
    # two tight clusters around orthogonal axes; seeds start both inside
    # cluster A — refinement must move one centroid to cluster B
    rows = []
    for i in range(20):
        rows.append((i, [1.0, 0.02 * (i % 5), 0.0, 0.0]))          # cluster A
        rows.append((100 + i, [0.0, 0.0, 1.0, 0.02 * (i % 5)]))    # cluster B
    e = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    seeds = [[1.0, 0.0, 0.0, 0.0], [1.0, 0.1, 0.0, 0.0]]  # both in A
    refined = similarity.kmeans_refine(e, seeds, iters=5)
    # one centroid must now point dominantly along axis 2 (cluster B)
    axis2 = sorted(c[2] / (sum(x * x for x in c) ** 0.5) for c in refined)
    assert axis2[-1] > 0.9
    assert axis2[0] < 0.1  # the other stayed with cluster A


def test_kmeans_refine_empty_cell_keeps_position_and_converges(spark):
    e = spark.createDataFrame(
        [(i, [1.0, 0.0]) for i in range(4)], "vec_id long, embedding array<float>"
    )
    # centroid 1 is orthogonal to every vector: it attracts nothing and must
    # keep its position; centroid 0 already is the mean -> early tol exit
    out = similarity.kmeans_refine(e, [[1.0, 0.0], [0.0, 1.0]], iters=10)
    assert out[1] == [0.0, 1.0]
    assert abs(out[0][0] - 1.0) < 1e-9 and abs(out[0][1]) < 1e-9


def _tiny_png(width, height):
    """A complete, REAL PNG file built with stdlib only (zlib CRCs + IDAT)."""
    import struct
    import zlib

    def chunk(tag, data):
        return (
            struct.pack(">I", len(data))
            + tag
            + data
            + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 0)  # 8-bit RGB
    raw = b"".join(b"\x00" + b"\x10\x20\x30" * width for _ in range(height))
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def _tiny_jpeg(width, height):
    """SOI + APP0(JFIF) + SOF0 header bytes (enough of a real JPEG stream
    for dimension parsing; ITU T.81 B.2.2 layout)."""
    import struct

    app0 = b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    sof0 = (
        b"\xff\xc0"
        + struct.pack(">H", 17)
        + b"\x08"
        + struct.pack(">HH", height, width)
        + b"\x03\x01\x22\x00\x02\x11\x01\x03\x11\x01"
    )
    return b"\xff\xd8" + app0 + sof0


def test_parse_image_header_real_formats():
    assert multimodal.parse_image_header(_tiny_png(320, 240)) == (320, 240, "png")
    assert multimodal.parse_image_header(_tiny_jpeg(640, 480)) == (640, 480, "jpeg")
    gif = b"GIF89a" + (17).to_bytes(2, "little") + (9).to_bytes(2, "little")
    assert multimodal.parse_image_header(gif) == (17, 9, "gif")
    assert multimodal.parse_image_header(b"not an image") is None


def test_decode_image_meta_real_png_through_spark(spark):
    png = _tiny_png(32, 16)
    jpg = _tiny_jpeg(100, 50)
    df = spark.createDataFrame(
        [(1, bytearray(png)), (2, bytearray(jpg)), (3, bytearray(b"opaque blob"))],
        "doc_id long, payload binary",
    )
    out = {r["doc_id"]: r for r in multimodal.decode_image_meta(df).collect()}
    assert (out[1]["width"], out[1]["height"], out[1]["format"]) == (32, 16, "png")
    assert (out[2]["width"], out[2]["height"], out[2]["format"]) == (100, 50, "jpeg")
    assert out[1]["decode_status"] == "ok" and out[2]["decode_status"] == "ok"
    # unrecognized format: NULL metadata by default, never fabricated
    assert out[3]["format"] is None and out[3]["width"] is None
    assert out[3]["decode_status"] == "undecodable"
    assert out[1]["n_bytes"] == len(png)
    faked = {
        r["doc_id"]: r
        for r in multimodal.decode_image_meta(df, on_undecodable="fake").collect()
    }
    assert faked[3]["format"] in ("png", "jpeg", "webp")  # deterministic stand-in
    assert faked[3]["decode_status"] == "fake"


def test_png_codec_roundtrip_all_filters():
    import struct
    import zlib

    import numpy as np

    # encoder round-trip (filter 0)
    rng = np.random.RandomState(7)
    arr = rng.randint(0, 256, (6, 8, 3), dtype=np.uint8)
    decoded = multimodal.decode_png_pixels(multimodal.encode_png(arr))
    assert np.array_equal(decoded, arr)

    # hand-built stream exercising Sub(1)/Up(2)/Average(3)/Paeth(4) filters
    h, w, ch = 4, 5, 3
    stride = w * ch
    rows = rng.randint(0, 256, (h, stride), dtype=np.uint8)
    raw = bytearray()
    prev = np.zeros(stride, dtype=np.uint8)
    for y, ftype in enumerate([1, 2, 3, 4]):
        cur = rows[y]
        line = np.zeros(stride, dtype=np.uint8)
        for x in range(stride):
            left = int(cur[x - ch]) if x >= ch else 0
            up = int(prev[x])
            if ftype == 1:
                pred = left
            elif ftype == 2:
                pred = up
            elif ftype == 3:
                pred = (left + up) // 2
            else:
                ul = int(prev[x - ch]) if x >= ch else 0
                p = left + up - ul
                pa, pb, pc = abs(p - left), abs(p - up), abs(p - ul)
                pred = left if pa <= pb and pa <= pc else (up if pb <= pc else ul)
            line[x] = (int(cur[x]) - pred) & 0xFF
        raw += bytes([ftype]) + line.tobytes()
        prev = cur

    def chunk(tag, data):
        return (
            struct.pack(">I", len(data)) + tag + data
            + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
        )

    png = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )
    decoded = multimodal.decode_png_pixels(png)
    assert np.array_equal(decoded, rows.reshape(h, w, ch))


def test_resize_really_resamples_png(spark):
    import numpy as np

    arr = np.zeros((8, 8, 3), dtype=np.uint8)
    arr[:4, :, 0] = 200  # top half red-ish
    arr[4:, :, 2] = 150  # bottom half blue-ish
    df = spark.createDataFrame(
        [(1, bytearray(multimodal.encode_png(arr)))], "doc_id long, payload binary"
    )
    out = multimodal.resize_images(df, 4, 4).first()
    resized = multimodal.decode_png_pixels(bytes(out["payload"]))
    assert resized.shape == (4, 4, 3)
    assert resized[0, 0, 0] == 200 and resized[3, 3, 2] == 150  # content kept


def test_extract_features_uses_real_pixels_for_png(spark):
    import numpy as np

    # constant-color image: pixel histogram concentrates on value%dim
    arr = np.full((10, 10, 3), 33, dtype=np.uint8)
    df = spark.createDataFrame(
        [(1, bytearray(multimodal.encode_png(arr)))], "doc_id long, payload binary"
    )
    feats = multimodal.extract_features(df, dim=16).first()["feature"]
    assert feats[33 % 16] == 1.0  # all mass on the real pixel value


def test_cosine_topk_join_matches_per_query_topk(spark):
    e = read_table(spark, "embeddings", SF_SMOKE)
    queries = e.where("vec_id IN (0, 7, 19)").select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    batch = similarity.cosine_topk_join(e, queries, k=5)
    got = {}
    for r in batch.collect():
        got.setdefault(r["query_id"], []).append((r["rn"], r["vec_id"], r["score"]))
    for qid in (0, 7, 19):
        qvec = [float(x) for x in e.where(f"vec_id = {qid}").first()["embedding"]]
        single = [
            (i + 1, r["vec_id"], r["score"])
            for i, r in enumerate(similarity.cosine_topk(e, qvec, k=5).collect())
        ]
        assert sorted(got[qid]) == single, qid


def test_cosine_self_pairs_banded_recall_and_exactness(spark):
    import numpy as np

    rng = np.random.RandomState(3)
    base = rng.randn(40, 16).astype("float32")
    rows = []
    for i, v in enumerate(base):
        rows.append((i * 2, [float(x) for x in v]))
        # planted near-dup: tiny perturbation of each base vector
        rows.append((i * 2 + 1, [float(x) for x in v + rng.randn(16).astype("float32") * 0.01]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    exact = {(r["id_a"], r["id_b"]) for r in
             similarity.cosine_self_pairs(df, threshold=0.99, blocked=False).collect()}
    one = {(r["id_a"], r["id_b"]) for r in
           similarity.cosine_self_pairs(df, threshold=0.99, num_bands=1).collect()}
    four = {(r["id_a"], r["id_b"]) for r in
            similarity.cosine_self_pairs(df, threshold=0.99, num_bands=4).collect()}
    assert one <= exact and four <= exact  # blocking never invents pairs
    assert len(four) >= len(one)  # banding amplifies recall
    assert len(four) >= int(0.9 * len(exact))  # 4 bands ~ near-full recall


def test_cosine_self_pairs_bucket_cap_star(spark):
    # 300 identical vectors: one degenerate SRP bucket
    rows = [(i, [1.0] * 8) for i in range(300)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    capped = similarity.cosine_self_pairs(
        df, threshold=0.9, num_planes=4, max_bucket_size=64
    ).collect()
    assert len(capped) == 299  # hub-and-spoke, not 300*299/2
    assert all(r["id_a"] == 0 and r["score"] == 1.0 for r in capped)


def test_gif_lzw_codec_roundtrip():
    import numpy as np

    from hive2es_offline_spark.operators.multimodal import _lzw_decode, _lzw_encode

    cases = [
        b"\x01\x02" * 15,  # KwKwK self-reference pattern
        bytes(np.random.RandomState(0).randint(0, 250, 5000, dtype=np.uint8)),
        b"\x00" * 1000,  # degenerate run
    ]
    for data in cases:
        assert _lzw_decode(_lzw_encode(data, 8), 8, len(data)) == data
    import pytest as _pytest

    with _pytest.raises(ValueError, match="bits"):
        _lzw_encode(b"\xff", 4)  # index outside the code space fails loudly


def test_gif_two_frame_roundtrip_and_header():
    import numpy as np

    from hive2es_offline_spark.operators.multimodal import (
        decode_gif_frames, encode_gif, parse_image_header)

    rng = np.random.RandomState(7)
    f1 = rng.randint(0, 4, (5, 7, 3), dtype=np.uint8) * 60
    f2 = f1.copy()
    f2[1:3, 2:5] = [255, 0, 0]
    gif = encode_gif([f1, f2])
    assert parse_image_header(gif) == (7, 5, "gif")
    frames = decode_gif_frames(gif)
    assert len(frames) == 2
    assert np.array_equal(frames[0], f1) and np.array_equal(frames[1], f2)
    # interlaced storage decodes back to the same raster
    fi = decode_gif_frames(encode_gif([f1], interlace=True))
    assert np.array_equal(fi[0], f1)
    # a wider raster exercises LZW width growth past 9 bits
    ramp = rng.randint(0, 64, (40, 50), dtype=np.uint8) * 4
    big = np.stack([ramp, ramp, ramp], axis=-1)
    assert np.array_equal(decode_gif_frames(encode_gif([big]))[0], big)
    assert decode_gif_frames(b"not a gif at all") is None


def test_resize_images_gif_path_preserves_format(spark):
    import numpy as np

    from hive2es_offline_spark.operators.multimodal import (
        decode_gif_frames, encode_gif, resize_images)

    f1 = np.zeros((6, 8, 3), dtype=np.uint8)
    f1[:3] = [0, 128, 255]
    f2 = f1[:, ::-1].copy()
    df = spark.createDataFrame([(1, bytearray(encode_gif([f1, f2])))],
                               "doc_id long, payload binary")
    out = resize_images(df, 4, 3).first()
    frames = decode_gif_frames(bytes(out["payload"]))
    assert len(frames) == 2 and frames[0].shape == (3, 4, 3)
    # nearest-neighbor of a half-scale keeps the banded structure
    assert (frames[0][0] == [0, 128, 255]).all()


def test_extract_features_gif_uses_real_pixels(spark):
    import numpy as np

    from hive2es_offline_spark.operators.multimodal import encode_gif, extract_features

    # single-color frames: the pixel histogram concentrates on known bins,
    # which a byte-histogram of the compressed GIF container cannot produce
    f1 = np.full((4, 4, 3), 32, dtype=np.uint8)
    f2 = np.full((4, 4, 3), 33, dtype=np.uint8)
    df = spark.createDataFrame([(1, bytearray(encode_gif([f1, f2])))],
                               "doc_id long, payload binary")
    feat = extract_features(df, dim=16).first()["feature"]
    assert abs(feat[0] - 0.5) < 1e-6  # 32 % 16 == 0: half the pixels
    assert abs(feat[1] - 0.5) < 1e-6  # 33 % 16 == 1: the other half


def test_quantize_embeddings_roundtrip_bound_and_zero_vector(spark):
    e = spark.createDataFrame(
        [
            (1, [0.5, -1.0, 0.25, 0.0]),
            (2, [0.0, 0.0, 0.0, 0.0]),   # zero vector: q=0s, scale=0
            (3, [3.0]),                   # single component: q=[127]
        ],
        "vec_id long, embedding array<float>",
    )
    out = {r["vec_id"]: r for r in similarity.quantize_embeddings(e).collect()}
    assert out[1]["q"] == [64, -127, 32, 0]  # 0.5/1.0*127 = 63.5 -> half-up 64
    assert all(-127 <= q <= 127 for q in out[1]["q"])
    assert out[1]["max_err"] <= out[1]["scale"] / 2 + 1e-9
    assert out[2]["q"] == [0, 0, 0, 0] and out[2]["scale"] == 0.0
    assert out[2]["max_err"] == 0.0
    assert out[3]["q"] == [127] and abs(out[3]["scale"] - 3.0 / 127) < 1e-9


def test_quantize_embeddings_is_narrow(spark):
    e = read_table(spark, "embeddings", SF_SMOKE)
    qdf = similarity.quantize_embeddings(e)
    plan = qdf._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # per-row projection: runs inside the scan


def test_semantic_dedup_planted_families(spark):
    import numpy as np

    from hive2es_offline_spark.operators.similarity import semantic_dedup

    rng = np.random.default_rng(11)
    rows = []
    nid = 0
    # three tight families: near-identical members
    for fam in range(3):
        base = rng.normal(size=16)
        for _ in range(4 + fam):
            v = base + rng.normal(scale=1e-3, size=16)
            rows.append((nid, v.tolist()))
            nid += 1
    first_singleton = nid
    for _ in range(8):  # well-separated singletons
        rows.append((nid, rng.normal(size=16).tolist()))
        nid += 1
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    kept = semantic_dedup(df, num_cells=4, threshold=0.99, kmeans_iters=2)
    ids = sorted(r["vec_id"] for r in kept.select("vec_id").collect())
    # one survivor (the min id) per family: 0, 4, 9; all singletons kept
    assert ids == [0, 4, 9] + list(range(first_singleton, nid))
    assert kept.columns == df.columns
    # hot-cell cap: SCORED hub-and-spoke — family members still collapse
    # (cosine-to-hub >= threshold), but dissimilar rows sharing a hot cell
    # must NOT be dropped (the unscored star would have lost every one)
    kept_capped = semantic_dedup(
        df, num_cells=4, threshold=0.99, kmeans_iters=2, max_cell_size=3
    )
    capped_ids = {r["vec_id"] for r in kept_capped.select("vec_id").collect()}
    assert {0, 4, 9} <= capped_ids
    # every singleton survives even when its cell is hot
    assert set(range(first_singleton, nid)) <= capped_ids


def test_semantic_dedup_hot_cell_keeps_dissimilar_rows(spark):
    # ONE cell (num_cells=1) far over the cap, containing two tight planted
    # families and dissimilar singletons: the scored hub must drop exactly
    # the near-dups of the hub, never the unrelated rows
    import numpy as np

    from hive2es_offline_spark.operators.similarity import semantic_dedup

    rng = np.random.default_rng(23)
    base = rng.normal(size=12)
    rows = [(i, (base + rng.normal(scale=1e-4, size=12)).tolist()) for i in range(6)]
    rows += [(10 + i, rng.normal(size=12).tolist()) for i in range(8)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    kept = semantic_dedup(
        df, num_cells=1, threshold=0.99, kmeans_iters=1, max_cell_size=4
    )
    ids = sorted(r["vec_id"] for r in kept.select("vec_id").collect())
    # hub = min id 0; rows 1-5 are its near-dups (dropped); singletons kept
    assert ids == [0] + [10 + i for i in range(8)]


def test_kmeans_combine_driver_rows_partition_independent(spark):
    # the pre-combine must hand the driver one row per non-empty cell,
    # never one per partition (the 100 TB driver-OOM shape)
    import numpy as np

    from hive2es_offline_spark.operators import similarity

    rng = np.random.default_rng(3)
    df = spark.createDataFrame(
        [(i, rng.normal(size=6).tolist()) for i in range(300)],
        "vec_id long, embedding array<double>",
    )
    cents = [rng.normal(size=6).tolist() for _ in range(4)]
    for parts in (1, 17):
        assigned = similarity.ivf_assign(df.repartition(parts), cents)
        partials = assigned.selectExpr("_ivf_cell as cell", "embedding as _v")
        # rebuild the same partial shape kmeans_refine emits
        import pandas as pd
        from pyspark.sql import functions as F

        def mk(batches):
            for pdf in batches:
                if not len(pdf):
                    continue
                g = {}
                for c, v in zip(pdf["cell"], pdf["_v"]):
                    n, s = g.get(c, (0, np.zeros(6)))
                    g[c] = (n + 1, s + np.asarray(v))
                yield pd.DataFrame(
                    {
                        "cell": list(g),
                        "m": [np.concatenate(([float(n)], s)).tolist() for n, s in g.values()],
                    }
                )

        p = partials.mapInPandas(mk, "cell int, m array<double>")
        combined = similarity._combine_cell_partials(p)
        assert combined.count() <= 4  # <= k rows regardless of partitioning


def test_ivf_assign_pandas_matches_literal(spark):
    import numpy as np

    from hive2es_offline_spark.operators.similarity import ivf_assign

    rng = np.random.default_rng(5)
    df = spark.createDataFrame(
        [(i, rng.normal(size=8).tolist()) for i in range(200)],
        "vec_id long, embedding array<double>",
    )
    cents = [rng.normal(size=8).tolist() for _ in range(6)]
    lit = {r["vec_id"]: r["_ivf_cell"]
           for r in ivf_assign(df, cents, method="literal").collect()}
    pnd = {r["vec_id"]: r["_ivf_cell"]
           for r in ivf_assign(df, cents, method="pandas").collect()}
    assert lit == pnd


def test_parse_image_header_webp_all_flavors():
    # hand-built headers straight from the public container/bitstream specs
    import struct

    from hive2es_offline_spark.operators.multimodal import parse_image_header

    def riff(chunk_tag, chunk_body):
        chunk = chunk_tag + struct.pack("<I", len(chunk_body)) + chunk_body
        return b"RIFF" + struct.pack("<I", 4 + len(chunk)) + b"WEBP" + chunk

    # VP8 lossy: 3-byte frame tag + start code + 14-bit LE dims
    body = b"\x00\x00\x00" + b"\x9d\x01\x2a" + struct.pack("<HH", 320, 240) + b"\x00" * 8
    assert parse_image_header(riff(b"VP8 ", body)) == (320, 240, "webp")
    # VP8L lossless: 0x2F sig then 14+14 bits packed, stored minus one
    bits = (199 - 1) | ((99 - 1) << 14)
    body = b"\x2f" + struct.pack("<I", bits) + b"\x00" * 10
    assert parse_image_header(riff(b"VP8L", body)) == (199, 99, "webp")
    # VP8X extended: u24 canvas-minus-one at +4 / +7
    body = b"\x00\x00\x00\x00" + (511).to_bytes(3, "little") + (255).to_bytes(3, "little") + b"\x00" * 8
    assert parse_image_header(riff(b"VP8X", body)) == (512, 256, "webp")
    # truncated / non-webp RIFF stays unrecognized
    assert parse_image_header(b"RIFF\x00\x00\x00\x00WAVE" + b"\x00" * 20) is None


def test_sample_frames_real_gif_frames(spark):
    # a 6-frame animated GIF: sampling 3 must return REAL decoded frames
    # (valid standalone PNGs with the right pixels), evenly spaced
    import numpy as np

    from hive2es_offline_spark.operators.multimodal import (
        decode_png_pixels, encode_gif)

    frames = [np.full((4, 5, 3), 10 * i, np.uint8) for i in range(6)]
    df = spark.createDataFrame(
        [(1, bytearray(encode_gif(frames)))], "doc_id long, payload binary"
    )
    rows = sorted(
        multimodal.sample_frames(df, num_frames=3).collect(),
        key=lambda r: r["frame_index"],
    )
    assert [r["frame_status"] for r in rows] == ["ok"] * 3
    # linspace(0, 5, 3) -> frames 0, 2 (2.5 rounds to 2), 5
    got = [decode_png_pixels(bytes(r["frame"]))[0, 0, 0] for r in rows]
    assert got[0] == 0 and got[2] == 50 and got[1] in (20, 30)


def test_sample_frames_byte_slice_is_marked(spark):
    rows = multimodal.sample_frames(_payloads(spark), num_frames=4).collect()
    assert all(r["frame_status"] == "byte_slice" for r in rows)


def test_with_png_payload_real_decodable(spark):
    from hive2es_offline_spark.operators.multimodal import (
        decode_png_pixels, with_png_payload)

    d = spark.createDataFrame([(i,) for i in range(8)], "doc_id long")
    rows = {r["doc_id"]: bytes(r["payload"]) for r in with_png_payload(d).collect()}
    assert set(rows) == set(range(8))
    pix = {k: decode_png_pixels(v) for k, v in rows.items()}
    assert all(p is not None for p in pix.values())  # every payload a REAL PNG
    # deterministic and id-varying
    assert pix[1].shape != pix[2].shape or not (pix[1] == pix[2]).all()
    again = {r["doc_id"]: bytes(r["payload"]) for r in with_png_payload(d).collect()}
    assert rows == again


def test_multimodal_prepare_counts(spark):
    import __spark_entry__ as entry_mod

    r = entry_mod.queries()["multimodal_prepare"](spark, SF_SMOKE).first()
    assert r["input"] == r["meta_ok"] == r["feat_ok"] == r["quantized"]
    assert r["exported_samples"] == r["input"] and r["shards"] == 4


def test_auto_num_cells_scales_with_corpus():
    """num_cells=None sizes cells from the corpus (~4k vectors/cell, min
    16) so an under-celled corpus can't silently degrade at scale."""
    from hive2es_offline_spark.operators.similarity import auto_num_cells

    assert auto_num_cells(100) == 16
    assert auto_num_cells(64_000) == 16
    assert auto_num_cells(200_000) >= 48
    assert auto_num_cells(1_000_000) == 250


def test_semantic_dedup_auto_cells_runs(spark):
    """Default (auto) cell sizing end-to-end on a small corpus."""
    import numpy as np
    from hive2es_offline_spark.operators.similarity import semantic_dedup

    rng = np.random.default_rng(7)
    base = rng.normal(size=(30, 8))
    rows = [(i, [float(x) for x in base[i]]) for i in range(30)]
    rows += [(100 + i, [float(x) for x in base[i]]) for i in range(5)]  # dups
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    kept = semantic_dedup(df, threshold=0.999)
    assert kept.count() == 30


def test_incremental_semantic_dedup_drops_cross_corpus_dups(spark):
    import numpy as np

    from hive2es_offline_spark.operators.similarity import (
        incremental_semantic_dedup,
        kmeans_refine,
        seeded_centroids,
    )

    rng = np.random.default_rng(11)
    base = rng.normal(size=(30, 8))
    seen = spark.createDataFrame(
        [(i, [float(x) for x in base[i]]) for i in range(30)],
        "vec_id long, embedding array<double>",
    )
    fresh = rng.normal(size=(5, 8))
    new = spark.createDataFrame(
        [(100 + i, [float(x) for x in base[i]]) for i in range(5)]   # dups of seen
        + [(200 + i, [float(x) for x in fresh[i]]) for i in range(5)],
        "vec_id long, embedding array<double>",
    )
    cents = kmeans_refine(seen, seeded_centroids(seen, 4), iters=1)
    kept = incremental_semantic_dedup(new, seen, cents, threshold=0.999)
    ids = sorted(r["vec_id"] for r in kept.select("vec_id").collect())
    assert ids == [200, 201, 202, 203, 204]


def test_incremental_semantic_dedup_hot_cell_cap(spark):
    from hive2es_offline_spark.operators.similarity import incremental_semantic_dedup

    v = [1.0, 0.0, 0.0, 0.0]
    w = [0.0, 1.0, 0.0, 0.0]
    seen = spark.createDataFrame(
        [(i, v) for i in range(50)], "vec_id long, embedding array<double>"
    )
    new = spark.createDataFrame(
        [(100, v), (101, w)], "vec_id long, embedding array<double>"
    )
    # one centroid -> one hot cell; cap keeps 2 seen reps, dup still caught
    kept = incremental_semantic_dedup(
        new, seen, [v], threshold=0.99, max_seen_per_cell=2
    )
    ids = sorted(r["vec_id"] for r in kept.select("vec_id").collect())
    assert ids == [101]


def test_ivf_assign_extra_cols_both_paths(spark):
    from hive2es_offline_spark.operators.similarity import ivf_assign

    df = spark.createDataFrame(
        [(1, [1.0, 0.0], "a"), (2, [0.0, 1.0], "b")],
        "vec_id long, embedding array<double>, tag string",
    )
    cents = [[1.0, 0.0], [0.0, 1.0]]
    for method in ("literal", "pandas"):
        out = ivf_assign(df, cents, method=method, extra_cols=["tag"]).collect()
        got = {r["vec_id"]: (r["tag"], r["_ivf_cell"]) for r in out}
        assert got == {1: ("a", 0), 2: ("b", 1)}, method
