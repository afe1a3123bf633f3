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
