"""As-of join and range join operator semantics."""

from datetime import datetime

from hive2es_offline_spark.operators import temporal


def _ts(s):
    return datetime.fromisoformat(s)


def test_asof_join_picks_latest_at_or_before(spark):
    left = spark.createDataFrame(
        [(1, "k", _ts("2024-01-10T00:00:00")), (2, "k", _ts("2024-01-01T00:00:00")),
         (3, "nokey", _ts("2024-01-10T00:00:00"))],
        "lid long, k string, t timestamp",
    )
    right = spark.createDataFrame(
        [("k", _ts("2024-01-05T00:00:00"), "a"),
         ("k", _ts("2024-01-09T00:00:00"), "b"),   # latest <= 01-10
         ("k", _ts("2024-02-01T00:00:00"), "c")],  # after every left row
        "k string, rt timestamp, v string",
    )
    out = {r["lid"]: (r["asof_rt"], r["asof_v"]) for r in
           temporal.asof_join(left, right, "k", "t", "rt").collect()}
    assert out[1] == (_ts("2024-01-09T00:00:00"), "b")
    assert out[2] == (None, None)   # no right row at or before
    assert out[3] == (None, None)   # key never matches, left join keeps row


def test_asof_join_exact_timestamp_is_inclusive(spark):
    left = spark.createDataFrame([(1, "k", _ts("2024-01-05T00:00:00"))], "lid long, k string, t timestamp")
    right = spark.createDataFrame([("k", _ts("2024-01-05T00:00:00"), "same")], "k string, rt timestamp, v string")
    r = temporal.asof_join(left, right, "k", "t", "rt").first()
    assert r["asof_v"] == "same"


def test_range_join_banded_matches_broadcast_range_join(spark):
    facts = spark.createDataFrame([(i, float(i % 37)) for i in range(300)], "id long, v double")
    ranges = spark.createDataFrame(
        [(0.0, 10.0, "low"), (10.0, 25.0, "mid"), (25.0, 40.0, "high")],
        "lo double, hi double, label string",
    )
    broad = {(r["id"], r["label"]) for r in
             temporal.range_join(facts, ranges, "v").select("id", "label").collect()}
    banded = {(r["id"], r["label"]) for r in
              temporal.range_join_banded(facts, ranges, "v", "lo", "hi", band_width=8.0)
              .select("id", "label").collect()}
    assert banded == {p for p in broad if p[1] is not None}


def test_range_join_half_open_interval(spark):
    facts = spark.createDataFrame([(1, 10.0)], "id long, v double")
    ranges = spark.createDataFrame([(0.0, 10.0, "low"), (10.0, 20.0, "mid")],
                                   "lo double, hi double, label string")
    r = temporal.range_join(facts, ranges, "v").first()
    assert r["label"] == "mid"  # [lo, hi): 10.0 belongs to the upper band


def test_asof_strategies_equivalent(spark):
    from hive2es_offline_spark.sources import read_table
    from pyspark.sql import functions as F
    from conftest import SF_SMOKE

    e = read_table(spark, "events", SF_SMOKE).select("event_id", "user_id", "ts")
    o = read_table(spark, "orders", SF_SMOKE).select(
        F.col("o_custkey").alias("user_id"), "o_orderdate", "o_orderkey"
    )
    u = temporal.asof_join(e, o, "user_id", "ts", "o_orderdate", strategy="union")
    j = temporal.asof_join(e, o, "user_id", "ts", "o_orderdate", strategy="join")
    assert sorted(map(tuple, u.collect())) == sorted(map(tuple, j.collect()))


def test_asof_union_atomic_carry_with_null_right_cols(spark):
    # right row with a NULL payload column must not get stitched with an
    # older row's non-null value (atomic struct carry)
    from datetime import datetime
    left = spark.createDataFrame(
        [(1, "k", datetime(2024, 1, 10))], "lid long, k string, t timestamp"
    )
    right = spark.createDataFrame(
        [("k", datetime(2024, 1, 1), "old"), ("k", datetime(2024, 1, 5), None)],
        "k string, rt timestamp, v string",
    )
    r = temporal.asof_join(left, right, "k", "t", "rt").first()
    assert r["asof_rt"] == datetime(2024, 1, 5)
    assert r["asof_v"] is None  # the latest row's NULL, not 'old'


def test_asof_broadcast_matches_union(spark):
    from hive2es_offline_spark.sources import read_table
    from pyspark.sql import functions as F
    from conftest import SF_SMOKE

    e = read_table(spark, "events", SF_SMOKE).select("event_id", "user_id", "ts")
    o = read_table(spark, "orders", SF_SMOKE).select(
        F.col("o_custkey").alias("user_id"), "o_orderdate", "o_orderkey"
    )
    u = temporal.asof_join(e, o, "user_id", "ts", "o_orderdate", strategy="union")
    b = temporal.asof_join(e, o, "user_id", "ts", "o_orderdate", strategy="broadcast")
    assert sorted(map(tuple, u.collect())) == sorted(map(tuple, b.collect()))


def test_asof_broadcast_plan_is_broadcast_join(spark):
    left = spark.createDataFrame(
        [(i, "k", _ts("2024-01-10T00:00:00")) for i in range(100)],
        "lid long, k string, t timestamp",
    )
    right = spark.createDataFrame(
        [("k", _ts("2024-01-05T00:00:00"), "a")], "k string, rt timestamp, v string"
    )
    out = temporal.asof_join(left, right, "k", "t", "rt", strategy="broadcast")
    plan = out._jdf.queryExecution().executedPlan().toString()
    # the (dim-sized) right side aggregates + broadcasts; the LEFT side joins
    # without any shuffle or per-key window sort
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "Window" not in plan


def test_asof_null_right_time_ignored_by_all_strategies(spark):
    # a null right timestamp can never satisfy rt <= lt; every strategy
    # must skip it (the union plan's nulls-first sort used to carry it)
    left = spark.createDataFrame(
        [(1, "k", _ts("2024-01-10T00:00:00"))], "lid long, k string, t timestamp"
    )
    right = spark.createDataFrame(
        [("k", None, "ghost")], "k string, rt timestamp, v string"
    )
    for strategy in ("union", "join", "broadcast"):
        r = temporal.asof_join(left, right, "k", "t", "rt", strategy=strategy).first()
        assert (r["asof_rt"], r["asof_v"]) == (None, None), strategy


def test_asof_auto_strategy_broadcasts_small_right(spark, tmp_path):
    left = spark.createDataFrame(
        [(i, "k", _ts("2024-01-10T00:00:00")) for i in range(100)],
        "lid long, k string, t timestamp",
    )
    # auto reads Catalyst size stats — parquet scans carry real file sizes
    # (createDataFrame relations have no stats and conservatively stay on
    # the union plan)
    spark.createDataFrame(
        [("k", _ts("2024-01-05T00:00:00"), "a")], "k string, rt timestamp, v string"
    ).write.parquet(str(tmp_path / "right.parquet"))
    right = spark.read.parquet(str(tmp_path / "right.parquet"))
    # default strategy: auto -> small right side broadcasts, left never shuffles
    out = temporal.asof_join(left, right, "k", "t", "rt")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "Window" not in plan
    # broadcasting disabled -> auto falls back to the union/window plan
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        fallback = temporal.asof_join(left, right, "k", "t", "rt")
        plan2 = fallback._jdf.queryExecution().executedPlan().toString()
        assert "Window" in plan2
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    assert sorted(map(tuple, out.collect())) == sorted(map(tuple, fallback.collect()))
