"""Multi-format source reading + hot-bucket capping."""

from pyspark.sql import functions as F

from hive2es_offline_spark.operators import dedup
from hive2es_offline_spark.sources import read_table


def test_read_table_json_and_csv(spark, tmp_path):
    src = spark.createDataFrame(
        [(1, "a", 1.5), (2, "b", 2.5), (3, "c", 3.5)], "id bigint, name string, v double"
    )
    src.write.json(str(tmp_path / "t.json"))
    src.write.option("header", "true").csv(str(tmp_path / "t.csv"))
    j = read_table(spark, "t", str(tmp_path), fmt="json", where="id > 1")
    c = read_table(spark, "t", str(tmp_path), fmt="csv", where="id > 1", columns=["id", "name"])
    assert j.count() == 2
    assert sorted(r["name"] for r in c.collect()) == ["b", "c"]


def test_minhash_bucket_cap_bounds_pairs(spark):
    # 30 identical docs = one 30-member duplicate family per band bucket
    text = "alpha beta gamma delta epsilon zeta eta theta " * 4
    df = spark.createDataFrame([(i, text) for i in range(30)], "doc_id long, text string")
    unbounded = dedup.dedup_minhash(
        df, "doc_id", "text", threshold=0.9, max_bucket_size=None
    ).count()
    starred = dedup.dedup_minhash(
        df, "doc_id", "text", threshold=0.9, max_bucket_size=10
    ).count()
    dropped = dedup.dedup_minhash(
        df, "doc_id", "text", threshold=0.9, max_bucket_size=10, oversized="drop"
    ).count()
    assert unbounded == 30 * 29 // 2  # full clique
    assert starred == 29  # hub-and-spoke: O(k) pairs, connectivity kept
    assert dropped == 0  # hard exclusion mode
    # a small family is unaffected by the cap
    small = spark.createDataFrame([(i, text) for i in range(5)], "doc_id long, text string")
    assert dedup.dedup_minhash(small, "doc_id", "text", 0.9, max_bucket_size=10).count() == 10


def test_read_binary_dir_payloads_and_ids(spark, tmp_path):
    """binaryFile source: recursive pickup, glob filter, deterministic
    path-hash ids, oversized-file guard — then straight into the real
    image decoder."""
    import numpy as np

    from hive2es_offline_spark.operators import multimodal
    from hive2es_offline_spark.sources.binary import read_binary_dir

    d = tmp_path / "corpus"
    (d / "sub").mkdir(parents=True)
    img = np.zeros((4, 4, 3), np.uint8)
    img[:, :, 0] = 250
    png = multimodal.encode_png(img)
    (d / "a.png").write_bytes(png)
    (d / "sub" / "b.png").write_bytes(png)
    (d / "notes.txt").write_bytes(b"not an image")

    out = read_binary_dir(spark, str(d), glob="*.png").collect()
    assert sorted(r["rel_path"] for r in out) == ["a.png", "sub/b.png"]
    assert all(not r["oversized"] and bytes(r["payload"]) == png for r in out)
    # ids deterministic across re-reads
    again = read_binary_dir(spark, str(d), glob="*.png").collect()
    assert {r["rel_path"]: r["doc_id"] for r in out} == {
        r["rel_path"]: r["doc_id"] for r in again
    }
    # decoded pixels flow straight through the real codec path
    payloads = read_binary_dir(spark, str(d), glob="*.png")
    meta = multimodal.decode_image_meta(payloads).collect()
    assert all(r["width"] == 4 and r["format"] == "png" for r in meta)

    # oversized guard: tiny threshold nulls the payload but keeps the row
    guarded = read_binary_dir(spark, str(d), glob="*.png", max_bytes_per_file=10).collect()
    assert all(r["oversized"] and r["payload"] is None for r in guarded)


def test_read_binary_dir_rel_path_with_recurring_base_name(spark, tmp_path):
    """ADVICE r6: the base is stripped as an exact qualified-URI prefix,
    so a base directory name that recurs inside the tree (data/data/...)
    or in an ancestor cannot shift the rel_path anchor — doc_ids stay
    mount-independent."""
    from hive2es_offline_spark.sources.binary import read_binary_dir

    base = tmp_path / "data"
    (base / "data" / "data").mkdir(parents=True)
    (base / "data" / "x.bin").write_bytes(b"one")
    (base / "data" / "data" / "y.bin").write_bytes(b"two")

    out = {r["rel_path"]: r["doc_id"] for r in read_binary_dir(spark, str(base)).collect()}
    assert sorted(out) == ["data/data/y.bin", "data/x.bin"]
    # reading the nested dir re-anchors: same file, rel to the NEW base
    nested = {
        r["rel_path"]: r["doc_id"]
        for r in read_binary_dir(spark, str(base / "data" / "data")).collect()
    }
    assert sorted(nested) == ["y.bin"]
