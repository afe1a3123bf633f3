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


def _staging_data_files(staging: str) -> set[str]:
    """Staged parquet files COMMITTED by the streaming file sink, read
    from its ``_spark_metadata`` log rather than a directory walk: a walk
    would also pick up orphans from crashed or speculative task attempts
    (ADVICE r6) — duplicate rows would be healed by the max_by merge, but
    a partially-written file breaks the increment read until manually
    cleaned.  Files absent from the log are invisible here, exactly as
    they are to a batch read of the sink directory."""
    import json
    from urllib.parse import unquote, urlparse

    meta = os.path.join(staging, "_spark_metadata")
    files: set[str] = set()
    if not os.path.isdir(meta):
        return files
    for name in sorted(os.listdir(meta)):
        if name.startswith(".") or name.endswith((".crc", ".tmp")):
            continue
        path = os.path.join(meta, name)
        if not os.path.isfile(path):
            continue
        with open(path) as f:
            for line in f:
                line = line.strip()
                if not line.startswith("{"):
                    continue  # "v1" version header
                entry = json.loads(line)
                p = entry.get("path")
                if not p:
                    continue
                if p.startswith("file:"):
                    p = unquote(urlparse(p).path)
                # compacted logs carry the full history: an "add" followed
                # by a retention "delete" for the same file means the file
                # is GONE — process in log order and retract it, or the
                # increment read fails on a missing file (ADVICE r7)
                if entry.get("action", "add") == "add":
                    files.add(p)
                else:
                    files.discard(p)
    return files


def _merged_marker(staging: str) -> str:
    return os.path.join(staging, "_MERGED.json")


def _read_merged(staging: str) -> set[str]:
    """Staged files already incorporated into a PUBLISHED snapshot version.
    This — not 'whatever is in staging' — is the increment baseline: if the
    upsert fails after the streaming sink committed, the files stay absent
    from the marker and the next call re-merges them (idempotent: keys
    replace)."""
    p = _merged_marker(staging)
    if not os.path.exists(p):
        return set()
    import json

    with open(p) as f:
        return set(json.load(f)["files"])


def _record_merged(staging: str, files: set[str]) -> None:
    import json

    p = _merged_marker(staging)
    tmp = p + ".tmp"
    with open(tmp, "w") as f:
        json.dump({"files": sorted(files)}, f)
    os.replace(tmp, p)  # atomic on posix


def stream_to_snapshot(
    spark: SparkSession,
    path: str,
    schema,
    snapshot_root: str,
    key_cols: list[str],
    checkpoint_dir: str,
    partition_col: str | None = None,
    time_col: str = "ts",
    staging_dir: str | None = None,
) -> dict | None:
    """Upsert one drained increment of a stream into the versioned
    snapshot store — the CDC-shaped ingest loop.  Each call:

    1. drains the currently-available NEW input (``Trigger.AvailableNow``
       against the checkpoint, so already-processed source files are never
       re-read) through a parquet file sink into ``staging_dir`` — the
       only exactly-once streaming sink that recovers from a checkpoint;
    2. reads back every staged file not yet incorporated into a PUBLISHED
       version (tracked in a ``_MERGED.json`` marker, updated atomically
       only after a successful publish — so an upsert failure after the
       sink committed leaves the files pending and the next call re-merges
       them, never losing an increment), reduced to the latest row per key
       (``max_by`` on ``time_col`` — an update must supersede the insert
       that arrived in the same increment, which is why the cross-batch
       keyed dedup stage is deliberately NOT in this pipeline: it would
       drop updates as duplicates);
    3. publishes exactly one ``upsert_snapshot`` version: keys replaced,
       new keys appended, untouched partitions carried over by manifest
       reference.

    Returns the published manifest, or None when the increment was empty
    (no version claimed).  Production shape: run on the micro-batch
    cadence (scheduler tick, or a ``foreachBatch`` wrapper where the py4j
    callback server is available — the drain IS the micro-batch).
    Delivery is effectively-once for keyed data: a retried drain re-reads
    nothing (checkpoint) or re-applies the same keys onto the previous
    version (replace, not duplicate), and the version publish is atomic
    behind an O_EXCL claim.
    """
    from ..sinks.snapshot import upsert_snapshot

    staging = staging_dir or checkpoint_dir.rstrip("/") + "_staging"
    os.makedirs(staging, exist_ok=True)
    stream = load_stream(spark, path, schema, time_col)
    q = (
        stream.writeStream.outputMode("append")
        .format("parquet")
        .option("path", staging)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    merged = _read_merged(staging)
    pending = sorted(_staging_data_files(staging) - merged)
    if not pending:
        return None
    increment = spark.read.schema(schema).parquet(*pending)
    latest = increment.groupBy(*key_cols).agg(
        F.max_by(
            F.struct(*[c for c in increment.columns if c not in key_cols]),
            F.col(time_col),
        ).alias("_row")
    ).select(*key_cols, "_row.*")
    if latest.isEmpty():
        _record_merged(staging, merged | set(pending))  # empty files: done
        return None
    manifest = upsert_snapshot(
        spark, snapshot_root, latest, key_cols, partition_col=partition_col
    )
    _record_merged(staging, merged | set(pending))
    return manifest
