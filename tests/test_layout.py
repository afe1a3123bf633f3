"""Compaction / clustered-rewrite layout maintenance."""

import glob
import os

import pytest
from pyspark.sql import functions as F

from hive2es_offline_spark.sinks import layout


def _fragmented(spark, tmp_path, n_rows=20_000, n_files=64):
    src = str(tmp_path / "frag")
    (
        spark.range(n_rows)
        .select(
            F.col("id"),
            F.md5(F.col("id").cast("string")).alias("payload"),
        )
        .repartition(n_files)
        .write.parquet(src)
    )
    return src


def test_compact_reduces_files_preserves_rows(spark, tmp_path):
    src = _fragmented(spark, tmp_path)
    before = layout.table_stats(spark, src)
    assert before["files"] >= 64
    dest = str(tmp_path / "compact")
    stats = layout.compact_parquet(
        spark, src, dest, target_file_bytes=before["bytes"] // 4
    )
    assert stats["rows"] == 20_000
    assert spark.read.parquet(dest).count() == 20_000
    n_out = len(glob.glob(os.path.join(dest, "*.parquet")))
    assert n_out <= 6  # ~4 target files, far fewer than 64
    # shuffle-free: coalesce plan has no Exchange
    plan = (
        spark.read.parquet(src)
        .coalesce(stats["after"]["files"])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan


def test_compact_range_mode_clusters_sort_key(spark, tmp_path):
    src = _fragmented(spark, tmp_path)
    dest = str(tmp_path / "clustered")
    layout.compact_parquet(
        spark,
        src,
        dest,
        target_file_bytes=layout.table_stats(spark, src)["bytes"] // 8,
        sort_cols=["id"],
        mode="range",
    )
    assert spark.read.parquet(dest).count() == 20_000
    # fragmented input: ids are spread across every file -> heavy overlap;
    # range rewrite: near-disjoint id ranges per file
    assert layout.file_range_overlap(src, "id") > 0.8
    assert layout.file_range_overlap(dest, "id") < 0.2


def test_compact_validates_args_and_empty(spark, tmp_path):
    src = str(tmp_path / "empty")
    spark.range(0).write.parquet(src)
    with pytest.raises(ValueError):
        layout.compact_parquet(spark, src, str(tmp_path / "x"), mode="zorder")
    with pytest.raises(ValueError):
        layout.compact_parquet(spark, src, str(tmp_path / "x"), mode="range")
    stats = layout.compact_parquet(spark, src, str(tmp_path / "out"))
    assert stats["rows"] == 0
    assert spark.read.parquet(str(tmp_path / "out")).count() == 0


def test_zorder_key_is_deterministic_and_jvm_only(spark):
    df = spark.createDataFrame(
        [(i, (i * 37) % 100, float((i * 13) % 50)) for i in range(1000)],
        "id long, x long, y double",
    )
    keyed, name = layout.zorder_key(df, ["x", "y"], bits=4)
    a = {r["id"]: r[name] for r in keyed.collect()}
    b = {r["id"]: r[name] for r in layout.zorder_key(df, ["x", "y"], bits=4)[0].collect()}
    assert a == b
    # key stays within 2*bits bits
    assert all(0 <= v < (1 << 8) for v in a.values())
    # no Python hop: the key is codegen expressions over the scan
    plan = keyed._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan and "Exchange" not in plan


def test_zorder_key_null_and_constant_columns(spark):
    df = spark.createDataFrame(
        [(1, None, 5.0), (2, 3, 5.0), (3, 9, 5.0)], "id long, x int, y double"
    )
    keyed, name = layout.zorder_key(df, ["x", "y"], bits=4)
    rows = {r["id"]: r[name] for r in keyed.collect()}
    assert rows[1] is not None  # NULL buckets to 0, row survives
    # y is constant -> contributes 0 bits; ordering driven by x alone
    assert rows[1] <= rows[2] <= rows[3]


def test_zorder_parquet_prunes_both_columns(spark, tmp_path):
    # two independent uniform columns: range-clustering on x alone leaves
    # y fully overlapped; z-order leaves BOTH columns partially disjoint
    import random

    rng = random.Random(5)
    rows = [(i, rng.randrange(10_000), rng.randrange(10_000)) for i in range(40_000)]
    src = str(tmp_path / "src")
    spark.createDataFrame(rows, "id long, x long, y long").repartition(8).write.parquet(src)
    bytes_total = layout.table_stats(spark, src)["bytes"]
    zdest = str(tmp_path / "z")
    layout.zorder_parquet(spark, src, zdest, ["x", "y"], target_file_bytes=bytes_total // 16)
    rdest = str(tmp_path / "r")
    layout.compact_parquet(
        spark, src, rdest, target_file_bytes=bytes_total // 16,
        sort_cols=["x"], mode="range",
    )
    assert spark.read.parquet(zdest).count() == 40_000
    assert "_zorder_key" not in spark.read.parquet(zdest).columns
    # z-order: both columns' file ranges partially disjoint
    zx = layout.file_range_overlap(zdest, "x")
    zy = layout.file_range_overlap(zdest, "y")
    ry = layout.file_range_overlap(rdest, "y")
    assert zx < 0.9 and zy < 0.9  # both pruned
    assert ry > 0.95  # single-column range layout: y unclustered
    assert layout.file_range_overlap(src, "x") > 0.95  # baseline: none
