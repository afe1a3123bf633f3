"""Bucketed-table co-location: shuffle-free large-x-large joins.

At 100 TB the dominant cost of a fact-x-fact join (orders x lineitem,
events x sessions) is shuffling BOTH sides on the join key.  Bucketing
pays that shuffle ONCE at write time: `bucketBy(n, key)` hash-partitions
each table's files by the key, and every later join/aggregation on that
key reads co-located buckets with NO exchange on either side — the same
trick the reference pulls with its per-shard document co-location
(``ESHashPartitioner`` routing), generalized to any join key.

Rules for the win to fire (verified in tests/test_bucketing.py):
* both sides bucketed by the join key with the SAME bucket count
  (or a divisor — Spark 3.1+ coalesces compatible counts);
* bucket columns must cover the equi-join keys;
* ``spark.sql.sources.bucketing.enabled`` (default true) and reads via
  the table catalog (``spark.table``), not raw parquet paths — bucket
  metadata lives in the catalog.

Sizing: pick buckets so one bucket of the BIG side is a few hundred MB
(compressed) — at 100 TB with 512 MB buckets that's ~200k buckets; tasks
scale with buckets, and AQE cannot re-split a bucket, so undersizing
buckets (too few) recreates the skew problem the shuffle would have had.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_cols: list[str],
    num_buckets: int,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a bucketed (and optionally sorted) catalog table.

    ``sortBy`` within buckets additionally enables sort-merge joins with
    no sort step and range-pruned point lookups."""
    writer = df.write.mode(mode).format("parquet").bucketBy(num_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table_name)


def read_bucketed(spark: SparkSession, table_name: str) -> DataFrame:
    """Read a bucketed table THROUGH the catalog (raw-path reads lose the
    bucket metadata and with it the shuffle elision)."""
    return spark.table(table_name)


def cobucket_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    on: list[str],
    how: str = "inner",
) -> DataFrame:
    """Join two co-bucketed tables on their bucket key — compiles to a
    SortMergeJoin with ZERO Exchange when both tables are bucketed on
    ``on`` with compatible bucket counts."""
    return read_bucketed(spark, left_table).join(
        read_bucketed(spark, right_table), on=on, how=how
    )
