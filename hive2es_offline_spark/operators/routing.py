"""ES routing + shard partitioning operators.

Reference: routing key = ``--routing`` else ``--id`` column
(``Hive2ES.scala:44,58-62``); partition = ``mod(murmur3(key), shards*multiple)``
via a custom RDD partitioner (``ESHashPartitioner.scala:15-19``,
``Hive2ES.scala:68-72``).

Spark-first translation: the shard id is a COLUMN (``es_shard``), and
co-location is ``df.repartition(num_shards * multiple, shard_col)``.  Rows of
one ES shard land together (possibly sharing a Spark partition with other
shards — same as the reference when ``multiple > 1`` maps several Spark
partitions per shard, just inverted); the sink only needs co-location +
the shard column, never an exact partition index.

Scale notes: one wide exchange, keyed by a 4-byte int.  The reference
shuffled serialized fastjson objects; here the shuffle happens BEFORE
document serialization so only normalized columns cross the wire, and AQE
coalesces/splits the post-shuffle partitions at runtime (multiple=10
oversubscription bounds task size exactly like the reference's
``--partition-multiples``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.es_hash import es_shard

DEFAULT_PARTITION_MULTIPLE = 10  # ArgsParser.scala:10,50-52


def with_routing(df: DataFrame, id_col: str, routing_col: str | None = None) -> DataFrame:
    """Attach ``_routing`` = routing column else id column (O15)."""
    routing = F.coalesce(
        *( [F.col(routing_col).cast("string")] if routing_col else [] ),
        F.col(id_col).cast("string"),
    )
    return df.withColumn("_routing", routing)


def with_shard(df: DataFrame, routing_col: str, num_shards: int, shard_col: str = "_shard") -> DataFrame:
    """Attach the ES shard id column (O16)."""
    return df.withColumn(shard_col, es_shard(routing_col, num_shards))


def repartition_for_shards(
    df: DataFrame,
    routing_col: str,
    num_shards: int,
    multiple: int = DEFAULT_PARTITION_MULTIPLE,
    shard_col: str = "_shard",
) -> DataFrame:
    """Co-locate documents by ES shard, oversubscribed by ``multiple`` so a
    hot shard is still written by several tasks (skew bound), mirroring
    ``numPartitions = shards x multiple`` (``Hive2ES.scala:43,68-72``)."""
    out = with_shard(df, routing_col, num_shards, shard_col)
    return out.repartition(num_shards * multiple, F.col(shard_col))


def partition_counts(df: DataFrame, routing_col: str, num_shards: int) -> DataFrame:
    """Docs per shard — the reference's per-partition count log
    (``Hive2ES.scala:85-90``) as a first-class skew diagnostic."""
    return (
        with_shard(df, routing_col, num_shards)
        .groupBy("_shard")
        .agg(F.count(F.lit(1)).alias("doc_count"))
    )
