"""Versioned snapshot tables: partition-pruned upsert, atomic publish,
time travel, compaction."""

import os

import pytest
from pyspark.sql import functions as F

from hive2es_offline_spark.sinks import snapshot as S


def _batch(spark, rows):
    return spark.createDataFrame(rows, "id long, part string, val string")


def test_first_publish_and_read(spark, tmp_path):
    root = str(tmp_path / "t")
    os.makedirs(root)
    m = S.upsert_snapshot(
        spark, root, _batch(spark, [(1, "a", "x"), (2, "b", "y")]), ["id"], "part"
    )
    assert m["version"] == 1
    assert S.current_version(root) == 1
    got = {r["id"]: r["val"] for r in S.read_snapshot(spark, root).collect()}
    assert got == {1: "x", 2: "y"}


def test_upsert_replaces_and_appends_only_affected_partition(spark, tmp_path):
    root = str(tmp_path / "t")
    os.makedirs(root)
    S.upsert_snapshot(
        spark, root,
        _batch(spark, [(1, "a", "x"), (2, "a", "y"), (3, "b", "z")]),
        ["id"], "part",
    )
    # record partition-b file set before the second upsert
    m1 = S.read_manifest(root)
    b_dir = os.path.join(root, m1["partitions"]["b"])
    b_files_before = sorted(os.listdir(b_dir))
    m2 = S.upsert_snapshot(
        spark, root,
        _batch(spark, [(2, "a", "y2"), (4, "a", "w")]),  # update id=2, add id=4
        ["id"], "part",
    )
    assert m2["version"] == 2
    assert m2["rewritten"] == ["a"]
    # partition b inherited: same manifest entry, same files on disk
    assert m2["partitions"]["b"] == m1["partitions"]["b"]
    assert sorted(os.listdir(b_dir)) == b_files_before
    got = {r["id"]: r["val"] for r in S.read_snapshot(spark, root).collect()}
    assert got == {1: "x", 2: "y2", 3: "z", 4: "w"}
    # time travel: v1 still readable, pre-update values
    old = {r["id"]: r["val"] for r in S.read_snapshot(spark, root, version=1).collect()}
    assert old == {1: "x", 2: "y", 3: "z"}


def test_unpartitioned_upsert_full_rewrite(spark, tmp_path):
    root = str(tmp_path / "t")
    os.makedirs(root)
    S.upsert_snapshot(spark, root, _batch(spark, [(1, "a", "x")]), ["id"])
    S.upsert_snapshot(spark, root, _batch(spark, [(1, "a", "x2"), (2, "b", "y")]), ["id"])
    got = {r["id"]: r["val"] for r in S.read_snapshot(spark, root).collect()}
    assert got == {1: "x2", 2: "y"}


def test_compact_collapses_versions(spark, tmp_path):
    root = str(tmp_path / "t")
    os.makedirs(root)
    S.upsert_snapshot(spark, root, _batch(spark, [(1, "a", "x"), (3, "b", "z")]), ["id"], "part")
    S.upsert_snapshot(spark, root, _batch(spark, [(2, "a", "y")]), ["id"], "part")
    m = S.compact_snapshot(spark, root)
    assert m["version"] == 3
    # every partition now owned by v3
    assert all(rel.startswith("v3/") for rel in m["partitions"].values())
    got = {r["id"]: r["val"] for r in S.read_snapshot(spark, root).collect()}
    assert got == {1: "x", 2: "y", 3: "z"}


def test_read_missing_raises(spark, tmp_path):
    with pytest.raises(FileNotFoundError):
        S.read_snapshot(spark, str(tmp_path / "nope"))


def test_concurrent_upsert_loses_race_loudly(spark, tmp_path):
    # single-writer guard: a second writer targeting an already-claimed
    # version must fail BEFORE writing data, never clobber the winner
    root = str(tmp_path / "t")
    os.makedirs(root)
    S.upsert_snapshot(spark, root, _batch(spark, [(1, "a", "x")]), ["id"])
    # simulate a concurrent winner that already claimed/committed v2
    with open(os.path.join(root, "_VERSIONS", "v2.json"), "w") as f:
        f.write("{}")
    with pytest.raises(RuntimeError, match="already claimed"):
        S.upsert_snapshot(spark, root, _batch(spark, [(2, "b", "y")]), ["id"])
    # winner's v1 data untouched and still live
    got = {r["id"]: r["val"] for r in S.read_snapshot(spark, root).collect()}
    assert got == {1: "x"}


def test_failed_upsert_releases_claim_and_retry_succeeds(spark, tmp_path):
    # a bad batch (NULL partition) must not wedge the table: validation
    # precedes the claim, and an in-flight failure unlinks the claim
    root = str(tmp_path / "t")
    os.makedirs(root)
    S.upsert_snapshot(spark, root, _batch(spark, [(1, "a", "x")]), ["id"], "part")
    bad = spark.createDataFrame([(2, None, "y")], "id long, part string, val string")
    with pytest.raises(ValueError, match="NULL"):
        S.upsert_snapshot(spark, root, bad, ["id"], "part")
    # no orphan claim: the valid retry proceeds at the same version
    m = S.upsert_snapshot(spark, root, _batch(spark, [(2, "b", "y")]), ["id"], "part")
    assert m["version"] == 2
    got = {r["id"]: r["val"] for r in S.read_snapshot(spark, root).collect()}
    assert got == {1: "x", 2: "y"}


def test_diff_snapshots_added_removed_updated(spark, tmp_path):
    root = str(tmp_path / "t")
    os.makedirs(root)
    S.upsert_snapshot(
        spark, root,
        _batch(spark, [(1, "a", "x"), (2, "a", "y"), (3, "b", "z")]),
        ["id"], "part",
    )
    # v2: update id=1, add id=4; ids 2,3 untouched
    S.upsert_snapshot(
        spark, root,
        _batch(spark, [(1, "a", "x2"), (4, "a", "w")]),
        ["id"], "part",
    )
    d = {r["id"]: r for r in S.diff_snapshots(spark, root, 1, 2).collect()}
    assert set(d) == {1, 4}
    assert d[1]["change"] == "updated" and d[1]["val"] == "x2"
    assert d[4]["change"] == "added" and d[4]["val"] == "w"
    # a full-rewrite (unpartitioned) table also supports removed
    root2 = str(tmp_path / "u")
    os.makedirs(root2)
    S.upsert_snapshot(spark, root2, _batch(spark, [(1, "a", "x"), (2, "a", "y")]), ["id"])
    # unpartitioned upsert merges (no removal); simulate removal via compact
    # of a filtered read is out of scope — assert diff of identical versions
    S.upsert_snapshot(spark, root2, _batch(spark, [(2, "a", "y")]), ["id"])
    assert S.diff_snapshots(spark, root2, 1, 2).count() == 0  # value unchanged


def test_apply_cdc_upserts_and_deletes(spark, tmp_path):
    from hive2es_offline_spark.sinks import snapshot as S

    root = str(tmp_path / "cdc")
    base = spark.createDataFrame(
        [(1, "a", 10.0), (2, "a", 20.0), (3, "b", 30.0)],
        "id long, part string, v double",
    )
    S.upsert_snapshot(spark, root, base, ["id"], "part")
    changes = spark.createDataFrame(
        [(2, "a", 99.0, "upsert"),   # update
         (4, "a", 40.0, "upsert"),   # insert
         (1, "a", 0.0, "delete")],   # delete (value cols ignored)
        "id long, part string, v double, _op string",
    )
    m = S.apply_cdc(spark, root, changes, ["id"], partition_col="part")
    assert m["version"] == 2
    got = {r["id"]: r["v"] for r in S.read_snapshot(spark, root).collect()}
    assert got == {2: 99.0, 3: 30.0, 4: 40.0}
    # partition b untouched: manifest still references the v1 files
    m2 = S.read_manifest(root)
    assert m2["partitions"]["b"].startswith("v1/")
    # idempotent: re-applying the same batch changes nothing state-wise
    S.apply_cdc(spark, root, changes, ["id"], partition_col="part")
    again = {r["id"]: r["v"] for r in S.read_snapshot(spark, root).collect()}
    assert again == got


def test_apply_cdc_partition_tombstone_and_guards(spark, tmp_path):
    from hive2es_offline_spark.sinks import snapshot as S

    root = str(tmp_path / "cdc2")
    base = spark.createDataFrame(
        [(1, "a", 1.0), (2, "b", 2.0)], "id long, part string, v double"
    )
    S.upsert_snapshot(spark, root, base, ["id"], "part")
    # delete the only row of partition a -> partition drops from manifest
    S.apply_cdc(
        spark, root,
        spark.createDataFrame([(1, "a", 0.0, "delete")],
                              "id long, part string, v double, _op string"),
        ["id"], partition_col="part",
    )
    assert [r["id"] for r in S.read_snapshot(spark, root).collect()] == [2]
    assert "a" not in S.read_manifest(root)["partitions"]
    # refusing to publish an empty table
    import pytest as _pytest
    with _pytest.raises(ValueError, match="every row"):
        S.apply_cdc(
            spark, root,
            spark.createDataFrame([(2, "b", 0.0, "delete")],
                                  "id long, part string, v double, _op string"),
            ["id"], partition_col="part",
        )
    # unknown op rejected before any claim
    with _pytest.raises(ValueError, match="unknown"):
        S.apply_cdc(
            spark, root,
            spark.createDataFrame([(2, "b", 0.0, "merge")],
                                  "id long, part string, v double, _op string"),
            ["id"], partition_col="part",
        )


def test_pit_search_pins_a_version_across_upserts(spark, tmp_path):
    from hive2es_offline_spark.plans.query_dsl import (
        es_open_pit, es_pit_search,
    )
    from hive2es_offline_spark.sinks import snapshot as S

    root = str(tmp_path / "pit_store")
    d = spark.createDataFrame(
        [(1, "a", 10), (2, "a", 20), (3, "b", 30)],
        "id long, part string, v long")
    S.upsert_snapshot(spark, root, d, ["id"], "part")
    pid = es_open_pit(spark, root)
    S.upsert_snapshot(
        spark, root,
        spark.createDataFrame([(2, "a", 999)], "id long, part string, v long"),
        ["id"], "part")
    body = {"sort": [{"id": "asc"}], "size": 10, "_source": ["id", "v"]}
    pit = {(r["id"], r["v"]) for r in es_pit_search(
        spark, {**body, "pit": {"id": pid}}, id_field="id").collect()}
    assert pit == {(1, 10), (2, 20), (3, 30)}  # pre-upsert state
    live = {(r["id"], r["v"]) for r in S.read_snapshot(spark, root)
            .select("id", "v").collect()}
    assert live == {(1, 10), (2, 999), (3, 30)}
    with pytest.raises(ValueError, match="pit"):
        es_pit_search(spark, body, id_field="id")
