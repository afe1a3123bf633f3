"""Structured-Streaming ingest (new surface — the reference is batch-only).

``readStream`` over a parquet/json directory -> watermarked event-time
windowed aggregates -> ``foreachBatch`` into the bundle/bulk sink.  The
watermark bounds state for late data; ``foreachBatch`` reuses the exact batch
sink (bundle staging is idempotent per epoch because the bundle path embeds
the index name, and the bulk path uses create-mode writes).

At scale: one streaming query per index build; state lives in the aggregation
operator keyed by (window, event_type) — cardinality-bounded; checkpointing
makes the ingest exactly-once into the idempotent sink.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def load_stream(spark: SparkSession, path: str, schema, time_col: str = "ts") -> DataFrame:
    """Open a file-source stream and normalize the event-time column.

    ``path`` may be a directory (the usual streaming source layout) or a
    single file — file sources must be directories, so a file path becomes
    (parent dir, pathGlobFilter=filename).

    Event-time normalization mirrors ``sources.tables``: nanos-as-long
    parquet becomes a micros timestamp, and TIMESTAMP_NTZ (tz-less parquet
    micros, the testdata encoding) is cast to TIMESTAMP — ``withWatermark``
    only accepts LTZ event time, and the session timezone is pinned to UTC
    so the cast is a pure type change, never a wall-clock shift.
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    reader = spark.readStream.schema(schema)
    if os.path.isfile(path):
        reader = reader.option("pathGlobFilter", os.path.basename(path))
        path = os.path.dirname(path)
    stream = reader.parquet(path)
    dtype = dict(stream.dtypes).get(time_col)
    if dtype == "bigint":
        stream = stream.withColumn(
            time_col, F.timestamp_micros(F.expr(f"{time_col} div 1000"))
        )
    elif dtype == "timestamp_ntz":
        stream = stream.withColumn(time_col, F.col(time_col).cast("timestamp"))
    return stream


def stream_events(
    spark: SparkSession,
    path: str,
    schema,
    watermark: str = "1 hour",
    window: str = "1 hour",
) -> DataFrame:
    """Windowed per-event-type counts with late-data watermarking."""
    stream = load_stream(spark, path, schema, "ts")
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("event_type"),
            F.col("n_events"),
            F.col("sum_value"),
        )
    )


def streaming_ingest_once(
    spark: SparkSession,
    path: str,
    schema,
    checkpoint_dir: str,
    watermark: str = "1 hour",
    window: str = "1 hour",
) -> DataFrame:
    """Drain all currently-available input through the streaming plan once
    (``Trigger.AvailableNow`` semantics) and return the materialized result.

    This is the harness-facing smoke path: the same plan runs continuously in
    production with ``.trigger(processingTime=...)`` and a real sink in
    ``foreachBatch``.
    """
    agg = stream_events(spark, path, schema, watermark, window)
    name = "streaming_ingest_result"
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName(name)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name)


def stream_enrich(
    spark: SparkSession,
    path: str,
    schema,
    dim_df: DataFrame,
    on: list[str],
    time_col: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """Stream-static enrichment join: events stream LEFT-joined to a
    dimension snapshot, the standard lookup step between ingest and sink.

    The static side is re-resolved EVERY micro-batch (stream-static join
    semantics), so a slowly-changing dimension refreshes without
    restarting the query; it is explicitly ``broadcast`` — the stream side
    never shuffles, which is the only sane plan when the stream runs at
    cluster scale and the dimension is table-sized.  Left join keeps
    events with no dimension row (enrichment must not drop data)."""
    stream = load_stream(spark, path, schema, time_col)
    return stream.withWatermark(time_col, watermark).join(F.broadcast(dim_df), on, "left")


def stream_enrich_once(
    spark: SparkSession,
    path: str,
    schema,
    dim_df: DataFrame,
    on: list[str],
    checkpoint_dir: str,
    time_col: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """AvailableNow drain of ``stream_enrich`` (harness smoke path)."""
    enriched = stream_enrich(spark, path, schema, dim_df, on, time_col, watermark)
    name = "streaming_enrich_result"
    q = (
        enriched.writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name)


def stream_dedup(
    spark: SparkSession,
    path: str,
    schema,
    key_cols: list[str],
    time_col: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming exact dedup: keep the first occurrence of every key within
    the watermark horizon (``dropDuplicatesWithinWatermark``).

    This is the streaming twin of ``dedup.dedup_exact``: state holds one
    entry per key seen inside the watermark window and is EVICTED once the
    watermark passes — bounded state, unlike a plain ``dropDuplicates`` on a
    stream which grows forever.  The standard front door of a streaming
    training-data ingest (exactly-once doc feed into the bulk/bundle sink).
    """
    stream = load_stream(spark, path, schema, time_col)
    return stream.withWatermark(time_col, watermark).dropDuplicatesWithinWatermark(key_cols)


def stream_dedup_once(
    spark: SparkSession,
    path: str,
    schema,
    key_cols: list[str],
    checkpoint_dir: str,
    time_col: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """AvailableNow drain of ``stream_dedup`` (harness smoke path)."""
    deduped = stream_dedup(spark, path, schema, key_cols, time_col, watermark)
    name = "streaming_dedup_result"
    q = (
        deduped.writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name)
