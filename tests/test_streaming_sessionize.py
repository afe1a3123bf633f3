"""Stateful streaming sessionization (applyInPandasWithState): sessions
close on gap within a drain and across drains via persisted state."""

from datetime import datetime, timedelta

from hive2es_offline_spark.streaming.sessionize import streaming_sessionize

T0 = datetime(2024, 1, 1, 0, 0, 0)


def _drain(spark, src, chk, out_dir):
    # parquet sink (not memory): the memory sink cannot recover an
    # append-mode checkpoint across drains
    stream = spark.readStream.schema("user_id long, ts timestamp").parquet(src)
    out = streaming_sessionize(stream, gap_seconds=1800)
    q = (
        out.writeStream.outputMode("append")
        .format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", chk)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.read.schema(
        "user_id long, session_start timestamp, session_end timestamp, n_events long"
    ).parquet(out_dir)


def test_sessions_close_on_gap_and_survive_drains(spark, tmp_path):
    src = str(tmp_path / "src")
    chk = str(tmp_path / "chk")
    batch1 = [
        (1, T0),
        (1, T0 + timedelta(minutes=10)),
        (1, T0 + timedelta(hours=2)),  # gap -> closes session [T0, T0+10m]
        (2, T0),
    ]
    spark.createDataFrame(batch1, "user_id long, ts timestamp").coalesce(1).write.mode(
        "append"
    ).parquet(src)
    out_dir = str(tmp_path / "out")
    out1 = {(r["user_id"], r["session_start"], r["n_events"]) for r in
            _drain(spark, src, chk, out_dir).collect()}
    assert out1 == {(1, T0, 2)}  # only the closed session; open ones stay in state

    batch2 = [(1, T0 + timedelta(hours=5)), (2, T0 + timedelta(minutes=5))]
    spark.createDataFrame(batch2, "user_id long, ts timestamp").coalesce(1).write.mode(
        "append"
    ).parquet(src)
    out2 = {(r["user_id"], r["session_start"], r["n_events"]) for r in
            _drain(spark, src, chk, out_dir).collect()}
    # cumulative parquet output: first-drain session + user 1's T0+2h
    # session closed by the 3h-later event; user 2's 5min-gap events merge
    # into one still-open session -> nothing emitted for 2
    assert (1, T0 + timedelta(hours=2), 1) in out2
    assert (1, T0, 2) in out2
    assert not any(u == 2 for u, _, _ in out2)
