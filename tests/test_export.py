"""JSONL + WebDataset export sinks: round-trip, determinism, manifest."""

import json
import os
import tarfile

from pyspark.sql import functions as F

from hive2es_offline_spark.sinks import export


def _docs(spark, n=40):
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("text for doc "), F.col("id")).alias("text"),
        (F.col("id") % 3).cast("string").alias("lang"),
    )


def test_write_jsonl_roundtrip_and_manifest(spark, tmp_path):
    df = _docs(spark)
    dest = str(tmp_path / "corpus")
    manifest = export.write_jsonl(df, dest, num_shards=4, key_col="doc_id")
    assert manifest["row_count"] == 40
    assert len(manifest["shard_counts"]) <= 4
    assert sum(manifest["shard_counts"].values()) == 40
    # staging dir gone, manifest on disk, files gzipped
    assert not os.path.exists(dest + "_tmp")
    disk = json.load(open(os.path.join(dest, "_MANIFEST.json")))
    assert disk == manifest
    assert all(f.endswith(".gz") for f in manifest["shard_counts"])
    back = export.read_jsonl(spark, dest, schema=df.schema)
    assert back.count() == 40
    assert sorted(r["doc_id"] for r in back.select("doc_id").collect()) == list(range(40))


def test_write_jsonl_shard_membership_deterministic(spark, tmp_path):
    df = _docs(spark)
    m1 = export.write_jsonl(df, str(tmp_path / "a"), num_shards=4, key_col="doc_id")
    m2 = export.write_jsonl(
        df.repartition(7), str(tmp_path / "b"), num_shards=4, key_col="doc_id"
    )
    # hash sharding: membership survives upstream re-partitioning
    assert sorted(m1["shard_counts"].values()) == sorted(m2["shard_counts"].values())


def test_write_webdataset_layout_and_content(spark, tmp_path):
    df = _docs(spark, 12).withColumn("blob", F.encode(F.col("text"), "utf-8"))
    dest = str(tmp_path / "wds")
    manifest = export.write_webdataset(
        df,
        dest,
        key_col="doc_id",
        members={"text": ".txt", "lang": ".cls", "blob": ".bin"},
        num_shards=3,
    )
    assert manifest["sample_count"] == 12
    seen = {}
    for tar_name in manifest["tar_counts"]:
        with tarfile.open(os.path.join(dest, tar_name)) as tf:
            names = tf.getnames()
            # 3 members per sample, grouped by basename
            assert len(names) == 3 * manifest["tar_counts"][tar_name]
            for m in tf.getmembers():
                assert m.mtime == 0  # reproducible
                key, ext = os.path.splitext(m.name)
                seen.setdefault(key, set()).add(ext)
                if ext == ".txt":
                    assert tf.extractfile(m).read().decode() == f"text for doc {key}"
                if ext == ".bin":
                    assert tf.extractfile(m).read().decode() == f"text for doc {key}"
    assert len(seen) == 12
    assert all(exts == {".txt", ".cls", ".bin"} for exts in seen.values())


def test_write_webdataset_samples_per_tar_rolls(spark, tmp_path):
    df = _docs(spark, 30)
    manifest = export.write_webdataset(
        df,
        str(tmp_path / "wds2"),
        key_col="doc_id",
        members={"text": ".txt"},
        num_shards=2,
        samples_per_tar=5,
    )
    assert sum(manifest["tar_counts"].values()) == 30
    assert all(n <= 5 for n in manifest["tar_counts"].values())
    # ceil(per-shard count / 5) tars per shard; hash split is not exactly
    # 15/15 so allow the range
    assert 6 <= len(manifest["tar_counts"]) <= 8


def test_write_jsonl_refuses_existing_dest_without_overwrite(spark, tmp_path):
    # Hadoop rename(src, existing-dir) nests src INSIDE dest and reports
    # success — the sink must pre-check and fail loudly instead
    import pytest

    from hive2es_offline_spark.sinks import export

    df = spark.createDataFrame([(1, "a"), (2, "b")], "doc_id long, text string")
    dest = str(tmp_path / "out")
    export.write_jsonl(df, dest, num_shards=2, key_col="doc_id")
    with pytest.raises(Exception, match="overwrite"):
        export.write_jsonl(df, dest, num_shards=2, key_col="doc_id", overwrite=False)
    # original export intact, not nested
    assert export.read_jsonl(spark, dest).count() == 2
    import os as _os
    assert not _os.path.exists(_os.path.join(dest, _os.path.basename(dest) + "_tmp"))


def test_write_jsonl_fast_validation(spark, tmp_path):
    """validate='fast' counts rows during the write (observe) and inventories
    shard files without a second decompress pass."""
    df = _docs(spark)
    dest = str(tmp_path / "corpus_fast")
    manifest = export.write_jsonl(
        df, dest, num_shards=4, key_col="doc_id", validate="fast"
    )
    assert manifest["validation"] == "fast"
    assert manifest["row_count"] == 40
    assert "shard_counts" not in manifest
    assert len(manifest["shard_bytes"]) >= 1
    assert all(b > 0 for b in manifest["shard_bytes"].values())
    # the export itself is identical to the full-validation layout
    back = export.read_jsonl(spark, dest)
    assert back.count() == 40
    disk = json.load(open(os.path.join(dest, "_MANIFEST.json")))
    assert disk == manifest


def test_write_jsonl_full_validation_tagged(spark, tmp_path):
    manifest = export.write_jsonl(
        _docs(spark), str(tmp_path / "c2"), num_shards=2, key_col="doc_id"
    )
    assert manifest["validation"] == "full"


def test_write_jsonl_rejects_bad_validate(spark, tmp_path):
    import pytest as _pytest

    with _pytest.raises(ValueError):
        export.write_jsonl(
            _docs(spark), str(tmp_path / "c3"), 2, "doc_id", validate="nope"
        )
