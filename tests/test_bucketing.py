"""Bucketed co-located joins: the write-once-shuffle-never join path."""

import pytest
from pyspark.sql import functions as F

from hive2es_offline_spark.sources import read_table
from hive2es_offline_spark.sources.bucketing import (
    cobucket_join,
    read_bucketed,
    write_bucketed,
)

from conftest import SF_SMOKE


@pytest.fixture(scope="module")
def bucketed_tables(spark):
    o = read_table(spark, "orders", SF_SMOKE).select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    li = read_table(spark, "lineitem", SF_SMOKE).select(
        "l_orderkey", "l_quantity", "l_extendedprice"
    ).withColumnRenamed("l_orderkey", "o_orderkey")
    write_bucketed(o, "b_orders", ["o_orderkey"], 8, sort_cols=["o_orderkey"])
    write_bucketed(li, "b_lineitem", ["o_orderkey"], 8, sort_cols=["o_orderkey"])
    yield "b_orders", "b_lineitem"
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_cobucket_join_has_no_exchange(spark, bucketed_tables):
    lt, rt = bucketed_tables
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")  # force SMJ path
    try:
        joined = cobucket_join(spark, lt, rt, on=["o_orderkey"])
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan  # co-located: neither side shuffles
        assert "SelectedBucketsCount: 8 out of 8" in plan  # bucket-aware scan
        # (the per-side Sort elides too once each bucket is a single file —
        # Spark requires files-per-bucket == 1 for sorted-scan reuse)
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")


def test_cobucket_join_matches_plain_join(spark, bucketed_tables):
    lt, rt = bucketed_tables
    joined = cobucket_join(spark, lt, rt, on=["o_orderkey"]).groupBy().agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("l_quantity").cast("decimal(18,2)")).cast("double").alias("sq"),
    )
    o = read_table(spark, "orders", SF_SMOKE)
    li = read_table(spark, "lineitem", SF_SMOKE)
    plain = o.join(li, o.o_orderkey == li.l_orderkey).groupBy().agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("l_quantity").cast("decimal(18,2)")).cast("double").alias("sq"),
    )
    assert joined.first() == plain.first()


def test_bucketed_agg_avoids_exchange(spark, bucketed_tables):
    lt, _ = bucketed_tables
    agg = read_bucketed(spark, lt).groupBy("o_orderkey").agg(
        F.count(F.lit(1)).alias("n")
    )
    plan = agg._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # grouping on the bucket key: no shuffle
