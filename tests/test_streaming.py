"""Structured-Streaming ingest: incremental file pickup with checkpointing,
and windowed-aggregate equivalence with the batch plan."""

import shutil

from pyspark.sql import functions as F

from hive2es_offline_spark.sources import read_table
from hive2es_offline_spark.streaming import ingest

from conftest import SF_SMOKE


def _raw_events_schema(spark):
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    return spark.read.parquet(f"{SF_SMOKE}/events.parquet").schema


def test_incremental_pickup_across_drains(spark, tmp_path):
    src = tmp_path / "stream_src"
    src.mkdir()
    chk = str(tmp_path / "chk")
    schema = _raw_events_schema(spark)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    raw = spark.read.schema(schema).parquet(f"{SF_SMOKE}/events.parquet")
    half1, half2 = raw.where("event_id % 2 = 0"), raw.where("event_id % 2 = 1")
    half1.write.mode("overwrite").parquet(str(src / "batch1"))

    def drain():
        agg = ingest.stream_events(spark, str(src), schema)
        q = (
            agg.writeStream.outputMode("complete")
            .format("memory")
            .queryName("inc_test")
            .option("checkpointLocation", chk)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return spark.table("inc_test")

    # NB: file source needs a flat dir of files; write each batch as files
    shutil.rmtree(str(src / "batch1"))
    half1.coalesce(1).write.mode("append").parquet(str(src))
    n1 = drain().agg(F.sum("n_events").alias("s")).first()["s"]
    half2.coalesce(1).write.mode("append").parquet(str(src))
    n2 = drain().agg(F.sum("n_events").alias("s")).first()["s"]
    total = raw.count()
    assert n1 < total
    assert n2 == total  # second drain saw only the new file but state kept all


def test_streaming_agg_matches_batch(spark, tmp_path):
    schema = _raw_events_schema(spark)
    out = ingest.streaming_ingest_once(
        spark, f"{SF_SMOKE}/events.parquet", schema, str(tmp_path / "chk2")
    )
    e = read_table(spark, "events", SF_SMOKE)
    batch = (
        e.groupBy(F.date_trunc("hour", "ts").alias("window_start"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("sum_value"),
        )
    )
    s = sorted(map(tuple, out.collect()))
    b = sorted(map(tuple, batch.collect()))
    assert s == b


def test_stream_dedup_keeps_first_within_watermark(spark, tmp_path):
    from datetime import datetime

    from hive2es_offline_spark.streaming.ingest import stream_dedup_once

    src = tmp_path / "dup_events"
    rows = [
        (1, 10, datetime(2024, 1, 1, 0, 0, 0), "a"),
        (1, 10, datetime(2024, 1, 1, 0, 5, 0), "dup-close"),   # same key, inside watermark
        (2, 11, datetime(2024, 1, 1, 0, 1, 0), "b"),
        (3, 12, datetime(2024, 1, 1, 9, 0, 0), "c"),
    ]
    df = spark.createDataFrame(rows, "event_id long, user_id long, ts timestamp, payload string")
    df.coalesce(1).write.parquet(str(src))
    out = stream_dedup_once(
        spark, str(src), df.schema, ["event_id"],
        str(tmp_path / "chk"), watermark="1 hour",
    )
    got = {r["event_id"]: r["payload"] for r in out.collect()}
    assert set(got) == {1, 2, 3}
    assert got[1] == "a"  # first occurrence kept, in-watermark dup dropped


def test_stream_enrich_joins_dim_and_keeps_unmatched(spark, tmp_path):
    from datetime import datetime

    from hive2es_offline_spark.streaming.ingest import stream_enrich_once

    src = tmp_path / "ev"
    rows = [
        (1, 10, datetime(2024, 1, 1, 0, 0, 0), "a"),
        (2, 11, datetime(2024, 1, 1, 0, 1, 0), "b"),
        (3, 99, datetime(2024, 1, 1, 0, 2, 0), "no-dim"),  # no dim row
    ]
    df = spark.createDataFrame(rows, "event_id long, user_id long, ts timestamp, payload string")
    df.coalesce(1).write.parquet(str(src))
    dim = spark.createDataFrame(
        [(10, "alice"), (11, "bob"), (12, "unused")], "user_id long, name string"
    )
    out = stream_enrich_once(
        spark, str(src), df.schema, dim, ["user_id"], str(tmp_path / "chk")
    )
    got = {r["event_id"]: r for r in out.collect()}
    assert got[1]["name"] == "alice" and got[2]["name"] == "bob"
    assert got[3]["name"] is None  # left join: unmatched event survives
    assert len(got) == 3


def test_stream_to_snapshot_upserts_each_batch(spark, tmp_path):
    """CDC-shaped loop: each drained micro-batch becomes one snapshot
    version; re-keyed rows replace, new keys append, and a second drain
    picks up only new files."""
    from hive2es_offline_spark.sinks import snapshot as S

    src = tmp_path / "snap_src"
    src.mkdir()
    chk = str(tmp_path / "snap_chk")
    root = str(tmp_path / "snap_store")
    schema = "event_id long, user_id long, value double, ts timestamp"

    b1 = spark.createDataFrame(
        [(1, 10, 1.0, "2024-01-01 00:00:00"), (2, 20, 2.0, "2024-01-01 00:01:00")],
        "event_id long, user_id long, value double, ts string",
    ).select("event_id", "user_id", "value", F.to_timestamp("ts").alias("ts"))
    # file source needs a flat dir of files
    b1.coalesce(1).write.mode("append").parquet(str(src))

    ingest.stream_to_snapshot(
        spark, str(src), schema, root, ["event_id"], chk
    )
    v1 = S.read_snapshot(spark, root)
    assert {r["event_id"]: r["value"] for r in v1.collect()} == {1: 1.0, 2: 2.0}

    # batch 2: update key 2, add key 3
    b2 = spark.createDataFrame(
        [(2, 20, 99.0, "2024-01-01 00:05:00"), (3, 30, 3.0, "2024-01-01 00:06:00")],
        "event_id long, user_id long, value double, ts string",
    ).select("event_id", "user_id", "value", F.to_timestamp("ts").alias("ts"))
    b2.coalesce(1).write.mode("append").parquet(str(src))

    ingest.stream_to_snapshot(
        spark, str(src), schema, root, ["event_id"], chk
    )
    v2 = S.read_snapshot(spark, root)
    assert {r["event_id"]: r["value"] for r in v2.collect()} == {
        1: 1.0, 2: 99.0, 3: 3.0,
    }
    # versioned history survives: version 1 still readable (time travel)
    assert S.read_snapshot(spark, root, version=1).count() == 2


def test_stream_to_snapshot_recovers_lost_increment(spark, tmp_path, monkeypatch):
    """If the upsert fails AFTER the streaming sink committed, the staged
    files stay pending (not in _MERGED.json) and the next call merges
    them — the increment is never silently lost."""
    import os as _os

    from hive2es_offline_spark.sinks import snapshot as S

    src = tmp_path / "rec_src"
    src.mkdir()
    chk = str(tmp_path / "rec_chk")
    root = str(tmp_path / "rec_store")
    schema = "event_id long, value double, ts timestamp"
    b1 = spark.createDataFrame(
        [(1, 1.0, "2024-01-01 00:00:00")], "event_id long, value double, ts string"
    ).select("event_id", "value", F.to_timestamp("ts").alias("ts"))
    b1.coalesce(1).write.mode("append").parquet(str(src))

    # sabotage the first upsert: pre-claim v1 so _claim_version raises
    _os.makedirs(_os.path.join(root, "_VERSIONS"), exist_ok=True)
    open(_os.path.join(root, "_VERSIONS", "v1.json"), "w").close()
    import pytest as _pytest
    with _pytest.raises(RuntimeError, match="claimed"):
        ingest.stream_to_snapshot(spark, str(src), schema, root, ["event_id"], chk)

    # recovery: clear the orphaned claim; the retry re-reads NOTHING from
    # the source (checkpoint) but still merges the pending staged files
    _os.unlink(_os.path.join(root, "_VERSIONS", "v1.json"))
    m = ingest.stream_to_snapshot(spark, str(src), schema, root, ["event_id"], chk)
    assert m is not None and m["version"] == 1
    assert S.read_snapshot(spark, root).count() == 1
    # and a further call with no new input is a no-op
    assert ingest.stream_to_snapshot(spark, str(src), schema, root, ["event_id"], chk) is None


def test_staging_inventory_retracts_retention_deletes(tmp_path):
    """A compacted _spark_metadata log carries add AND a later retention
    'delete' for the same file: the inventory must process entries in log
    order and retract deleted paths (ADVICE r7), or the increment read
    fails on a missing file."""
    import json

    from hive2es_offline_spark.streaming.ingest import _staging_data_files

    meta = tmp_path / "staging" / "_spark_metadata"
    meta.mkdir(parents=True)
    (meta / "0").write_text(
        "v1\n"
        + json.dumps({"path": "file:///s/part-0.parquet", "action": "add"}) + "\n"
        + json.dumps({"path": "file:///s/part-1.parquet", "action": "add"}) + "\n"
    )
    (meta / "1.compact").write_text(
        "v1\n"
        + json.dumps({"path": "file:///s/part-0.parquet", "action": "add"}) + "\n"
        + json.dumps({"path": "file:///s/part-0.parquet", "action": "delete"}) + "\n"
        + json.dumps({"path": "file:///s/part-1.parquet", "action": "add"}) + "\n"
        + json.dumps({"path": "file:///s/part-2.parquet", "action": "add"}) + "\n"
    )
    files = _staging_data_files(str(tmp_path / "staging"))
    assert files == {"/s/part-1.parquet", "/s/part-2.parquet"}
