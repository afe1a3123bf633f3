"""Tests for the ES shard partitioner (O15/O16).

O16 contract (``ESHashPartitioner.scala:15-19``, ``Hive2ES.scala:43,68-72``):
partition index == ``pmod(murmur3(routing), shards * multiple)``, so

* every Spark partition holds documents of exactly ONE ES shard, and
* a shard spans ``multiple`` partitions — a hot shard is written by many
  concurrent tasks, never a single straggler.
"""

import pyspark.sql.functions as F
import pytest

from hive2es_offline_spark.functions.es_hash import es_routing_hash
from hive2es_offline_spark.operators import routing
from hive2es_offline_spark.operators.routing import (
    _probe_keys,
    _spark_int_hash,
    repartition_for_shards,
    with_routing,
)

SHARDS = 3
MULTIPLE = 4
N = SHARDS * MULTIPLE


def test_probe_keys_cover_all_partitions():
    keys = _probe_keys(N)
    assert len(keys) == N
    assert sorted(_spark_int_hash(k) % N for k in keys) == list(range(N))


def test_spark_int_hash_matches_spark_hash(spark):
    """Our driver-side replica of Spark's Murmur3Hash(int) must agree with
    the JVM, else the probe-key mapping silently mispins partitions."""
    vals = list(range(50)) + [2**31 - 1, -(2**31), -1, 123456789]
    df = spark.createDataFrame([(v,) for v in vals], "v int")
    got = {r["v"]: r["h"] for r in df.select("v", F.hash("v").alias("h")).collect()}
    for v in vals:
        assert got[v] == _spark_int_hash(v), v


@pytest.fixture(scope="module")
def routed(spark):
    df = spark.range(2000).select(
        F.concat(F.lit("doc-"), F.col("id")).alias("_routing")
    )
    out = repartition_for_shards(df, "_routing", SHARDS, multiple=MULTIPLE)
    rows = out.withColumn("pid", F.spark_partition_id()).collect()
    assert len(rows) == 2000
    return rows


def test_partition_index_equals_es_slot(routed):
    """Exact ESHashPartitioner parity: Spark partition index == slot."""
    for r in routed:
        assert r["pid"] == es_routing_hash(r["_routing"]) % N


def test_each_partition_holds_one_shard(routed):
    by_pid = {}
    for r in routed:
        by_pid.setdefault(r["pid"], set()).add(r["_shard"])
    assert by_pid, "no partitions"
    for pid, shards in by_pid.items():
        assert len(shards) == 1, f"partition {pid} mixes shards {shards}"
        # partition -> shard mapping is pid mod shards
        assert shards == {pid % SHARDS}


def test_each_shard_spans_multiple_partitions(routed):
    by_shard = {}
    for r in routed:
        by_shard.setdefault(r["_shard"], set()).add(r["pid"])
    for shard, pids in by_shard.items():
        assert len(pids) > 1, f"shard {shard} written by a single task"
        assert len(pids) <= MULTIPLE


def test_shard_column_matches_es_shard(spark):
    df = spark.range(200).select(
        F.concat(F.lit("k"), F.col("id")).alias("_routing")
    )
    out = repartition_for_shards(df, "_routing", SHARDS, multiple=MULTIPLE)
    expected = routing.with_shard(df, "_routing", SHARDS, shard_col="want")
    joined = out.join(expected, "_routing")
    assert joined.where(F.col("_shard") != F.col("want")).count() == 0


def test_null_routing_lands_on_shard0(spark):
    df = spark.createDataFrame([(None,), ("abc",)], "_routing string")
    rows = repartition_for_shards(df, "_routing", SHARDS, multiple=MULTIPLE).collect()
    null_row = [r for r in rows if r["_routing"] is None][0]
    assert null_row["_shard"] == 0


def test_with_routing_uuid_fallback(spark):
    """O15: neither routing nor id -> random UUID key (Hive2ES.scala:58-62)."""
    df = spark.range(10)
    out = with_routing(df).collect()
    keys = [r["_routing"] for r in out]
    assert all(k is not None and len(k) == 36 for k in keys)
    assert len(set(keys)) == 10  # distinct per row


def test_with_routing_precedence(spark):
    df = spark.createDataFrame([("i1", "r1")], "id string, rt string")
    assert with_routing(df, id_col="id").collect()[0]["_routing"] == "i1"
    assert (
        with_routing(df, id_col="id", routing_col="rt").collect()[0]["_routing"]
        == "r1"
    )


def test_repartition_refuses_oversized_partition_count(spark):
    df = spark.createDataFrame([("k",)], "_routing string")
    with pytest.raises(ValueError, match="65536"):
        repartition_for_shards(df, "_routing", 10_000, multiple=10)
