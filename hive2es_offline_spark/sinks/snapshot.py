"""Versioned snapshot tables with partition-pruned upsert (mini table format).

The reference's publish protocol is stage -> validate -> atomic rename
(``ESContainer.scala:251-285``); its unit of replacement is a whole index.
A training corpus needs the same atomicity at finer grain: "merge today's
re-crawl into the 100 TB corpus" must rewrite ONLY the partitions that
changed, never the whole table, and readers must see either the old or the
new snapshot — nothing in between.  That is the core idea of the public
table formats (Iceberg/Delta/Hudi): data files are immutable, a manifest
maps each partition to the file set that currently owns it, and publishing
is an atomic swap of a tiny pointer.  This module implements that idea
directly over parquet dirs + JSON manifests, dependency-free.

Layout::

    root/v{N}/{part_col}={val}/part-*.parquet   immutable data, per version
    root/_VERSIONS/v{N}.json                    manifest: partition -> owner dir
    root/CURRENT.json                           atomic pointer to live version

An upsert writes ONLY the affected partitions into a new ``v{N}`` dir
(merge = updates ∪ (current partition ⟂ updates on the key)), inherits the
manifest entries of untouched partitions verbatim (no data copied, no file
moved), then swaps ``CURRENT.json`` via write-to-tmp + rename.  Readers
assemble the live table from the manifest — one parquet read per version
referenced, unioned; ``compact`` collapses the history back to one version
when the read fan-out grows.

Scale: the upsert's cost is O(changed partitions), the publish is O(1), and
concurrent readers never block.  The partition-values collect is bounded by
partition cardinality (same class as the reference's metadata lookup).
"""

from __future__ import annotations

import json
import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_NO_PART = "__table__"  # partition key used for unpartitioned tables


def _versions_dir(root: str) -> str:
    return os.path.join(root, "_VERSIONS")


def _current_path(root: str) -> str:
    return os.path.join(root, "CURRENT.json")


def current_version(root: str) -> int | None:
    p = _current_path(root)
    if not os.path.exists(p):
        return None
    with open(p) as f:
        return json.load(f)["version"]


def read_manifest(root: str, version: int | None = None) -> dict | None:
    version = version if version is not None else current_version(root)
    if version is None:
        return None
    with open(os.path.join(_versions_dir(root), f"v{version}.json")) as f:
        return json.load(f)


def _claim_version(root: str, version: int) -> None:
    """O_EXCL claim of ``v{version}.json`` BEFORE any data is written
    (single-writer semantics): two concurrent writers that both read
    version N race to claim v{N+1} — the loser gets EEXIST and fails
    loudly before its parquet overwrite could clobber the winner's data
    dir, so the winner's committed rows are never silently discarded at
    the CURRENT swap.  A crashed claimant leaves an empty v{N}.json that
    blocks the next writer with this same error — delete the orphaned
    claim (no CURRENT.json points at it) to recover."""
    os.makedirs(_versions_dir(root), exist_ok=True)
    try:
        os.close(
            os.open(
                os.path.join(_versions_dir(root), f"v{version}.json"),
                os.O_CREAT | os.O_EXCL | os.O_WRONLY,
                0o644,
            )
        )
    except FileExistsError:
        raise RuntimeError(
            f"snapshot version v{version} already claimed under {root}: "
            "a concurrent writer won the race (or a crashed one left an "
            "orphaned claim) — re-read the manifest and retry on top of "
            "the new version"
        ) from None


def _release_claim(root: str, version: int) -> None:
    """Undo THIS writer's claim after an in-process failure, so a failed
    upsert/compact doesn't wedge the table (every retry would recompute the
    same next version and die on the orphaned claim).  CURRENT.json was
    never swapped, so deleting the claimed/partially-written v{N}.json is
    safe — no reader can have resolved it."""
    try:
        os.unlink(os.path.join(_versions_dir(root), f"v{version}.json"))
    except OSError:
        pass  # best effort: the loud already-claimed error remains the backstop


def _publish(root: str, manifest: dict) -> dict:
    os.makedirs(_versions_dir(root), exist_ok=True)
    v = manifest["version"]
    with open(os.path.join(_versions_dir(root), f"v{v}.json"), "w") as f:
        json.dump(manifest, f, indent=2, sort_keys=True)
    fd, tmp = tempfile.mkstemp(dir=root, prefix=".current_")
    with os.fdopen(fd, "w") as f:
        json.dump({"version": v}, f)
    os.rename(tmp, _current_path(root))  # atomic pointer swap
    return manifest


def _escape_part(spark: SparkSession, value) -> str:
    """Partition value -> the dir-name component Spark's ``partitionBy``
    actually writes (Hive path escaping: ':', '/', '%', ... become %XX).
    Uses Spark's own escaper so manifest entries can never drift from the
    on-disk layout."""
    return spark._jvm.org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils.escapePathName(
        str(value)
    )


def _write_partitioned(df: DataFrame, vdir: str, pcol: str) -> None:
    """ONE write job for all rewritten partitions: ``partitionBy`` on a
    duplicated ``_p`` column, so the dir layout is ``{vdir}/_p={val}`` while
    the real partition column stays IN the data files (per-dir manifest
    reads then need no partition-discovery basePath gymnastics)."""
    (
        df.withColumn("_p", F.col(pcol))
        .write.mode("overwrite")
        .partitionBy("_p")
        .parquet(vdir)
    )


def upsert_snapshot(
    spark: SparkSession,
    root: str,
    updates: DataFrame,
    key_cols: list[str],
    partition_col: str | None = None,
) -> dict:
    """Merge ``updates`` into the live snapshot; rows matching on
    ``key_cols`` are replaced, new keys are appended.  With
    ``partition_col``, only partitions present in ``updates`` are rewritten
    — every other partition's manifest entry (and its files) carries over
    untouched.  Updates MUST carry a row's partition value unchanged
    (cross-partition key moves would leave the old row live).  Returns the
    published manifest."""
    prev = read_manifest(root)
    version = (prev["version"] + 1 if prev else 1)
    # validate BEFORE claiming so a bad batch never leaves an orphan claim
    if partition_col is not None:
        # bounded collect: one row per partition value in the updates batch
        affected = [
            r[0] for r in updates.select(partition_col).distinct().collect()
        ]
        if any(p is None for p in affected):
            raise ValueError(
                f"NULL {partition_col!r} values in updates: NULL partitions "
                "are not supported by the snapshot layout"
            )
    _claim_version(root, version)  # fail loudly BEFORE writing any data
    try:
        vdir = os.path.join(root, f"v{version}")
        pcol = partition_col or _NO_PART
        if partition_col is None:
            affected = [_NO_PART]
            merged = updates
            if prev:
                cur = read_snapshot(spark, root)
                merged = updates.unionByName(cur.join(updates, key_cols, "left_anti"))
            merged.write.mode("overwrite").parquet(os.path.join(vdir, _NO_PART))
            parts = {_NO_PART: f"v{version}/{_NO_PART}"}
        else:
            prev_parts = dict(prev["partitions"]) if prev else {}
            live = [
                os.path.join(root, prev_parts[str(p)])
                for p in affected
                if str(p) in prev_parts
            ]
            merged = updates
            if live:
                cur = spark.read.parquet(*live)
                merged = updates.unionByName(cur.join(updates, key_cols, "left_anti"))
            _write_partitioned(merged, vdir, pcol)
            parts = prev_parts
            for p in affected:
                parts[str(p)] = f"v{version}/_p={_escape_part(spark, p)}"
        manifest = {
            "version": version,
            "partition_col": partition_col,
            "key_cols": key_cols,
            "partitions": parts,
            "rewritten": [str(p) for p in affected],
        }
        return _publish(root, manifest)
    except BaseException:
        _release_claim(root, version)
        raise


def read_snapshot(spark: SparkSession, root: str, version: int | None = None) -> DataFrame:
    """Assemble the live (or a pinned historical) snapshot from its manifest:
    one parquet read over all owning dirs.  Old versions stay readable until
    compacted away — time travel for free."""
    m = read_manifest(root, version)
    if m is None:
        raise FileNotFoundError(f"no snapshot published under {root}")
    paths = sorted({os.path.join(root, rel) for rel in m["partitions"].values()})
    return spark.read.parquet(*paths)


def compact_snapshot(
    spark: SparkSession, root: str, partition_col: str | None = None
) -> dict:
    """Collapse the version history: rewrite every live partition into one
    new version so reads touch a single dir tree again.  Superseded version
    dirs become garbage (safe to delete after readers drain — the vacuum
    step of the public table formats)."""
    m = read_manifest(root)
    if m is None:
        raise FileNotFoundError(f"no snapshot published under {root}")
    df = read_snapshot(spark, root)
    version = m["version"] + 1
    _claim_version(root, version)  # fail loudly BEFORE writing any data
    try:
        vdir = os.path.join(root, f"v{version}")
        pcol = partition_col or m["partition_col"]
        if pcol is None:
            df.write.mode("overwrite").parquet(os.path.join(vdir, _NO_PART))
            parts = {_NO_PART: f"v{version}/{_NO_PART}"}
        else:
            vals = [r[0] for r in df.select(pcol).distinct().collect()]
            _write_partitioned(df, vdir, pcol)
            parts = {str(p): f"v{version}/_p={_escape_part(spark, p)}" for p in vals}
        manifest = {
            "version": version,
            "partition_col": pcol,
            "key_cols": m["key_cols"],
            "partitions": parts,
            "rewritten": sorted(parts),
        }
        return _publish(root, manifest)
    except BaseException:
        _release_claim(root, version)
        raise


def diff_snapshots(
    spark: SparkSession,
    root: str,
    old_version: int,
    new_version: int | None = None,
    key_cols: list[str] | None = None,
) -> DataFrame:
    """Row-level diff between two snapshot versions: one row per key that
    was ``added``, ``removed``, or ``updated`` (``change`` column), with the
    new row's columns for added/updated and the old row's for removed.
    The audit primitive every incremental pipeline needs — "what did
    yesterday's upsert actually change?" — and the input to incremental
    downstream recomputation (re-embed only updated docs, re-index only
    changed keys).

    ``key_cols`` defaults to the manifest's recorded upsert keys.  Plan
    shape: both sides read partition-pruned parquet (version manifests),
    full outer join on the keys — ONE shuffle per side, or zero extra
    exchanges when both sides land co-partitioned — and ``updated`` is
    decided by comparing the non-key columns as a struct (JVM codegen, no
    row-wise Python).  At 100 TB, diff cost is bounded by the two
    snapshots read, not by history length."""
    new_m = read_manifest(root, new_version)
    if new_m is None:
        raise FileNotFoundError(f"no snapshot published under {root}")
    keys = key_cols or new_m["key_cols"]
    old = read_snapshot(spark, root, old_version)
    new = read_snapshot(spark, root, new_version)
    val_cols = [c for c in new.columns if c not in keys]
    o = old.select(
        *keys, F.struct(*[old[c] for c in val_cols]).alias("_old")
    )
    n = new.select(
        *keys, F.struct(*[new[c] for c in val_cols]).alias("_new")
    )
    joined = o.join(n, on=list(keys), how="full_outer")
    change = (
        F.when(F.col("_old").isNull(), F.lit("added"))
        .when(F.col("_new").isNull(), F.lit("removed"))
        .when(F.col("_old") != F.col("_new"), F.lit("updated"))
    )
    picked = F.coalesce(F.col("_new"), F.col("_old"))
    return (
        joined.withColumn("change", change)
        .where(F.col("change").isNotNull())  # unchanged rows drop out
        .select(
            "change", *keys,
            *[picked[c].alias(c) for c in val_cols],
        )
    )


def apply_cdc(
    spark: SparkSession,
    root: str,
    changes: DataFrame,
    key_cols: list[str],
    op_col: str = "_op",
    partition_col: str | None = None,
) -> dict:
    """Apply a CDC change batch — upserts AND deletes — as one snapshot
    version.  ``changes`` carries the table columns plus ``op_col`` with
    ``"upsert"`` or ``"delete"`` per row; the new version is
    ``(current ⟂ change-keys) ∪ upsert-rows``, so a delete removes the key
    and an upsert replaces-or-appends, exactly Delta/Iceberg MERGE's
    matched-delete / matched-update / not-matched-insert triple in one
    shape.  With ``partition_col`` only partitions present in the batch
    are rewritten (delete rows must carry the row's partition value, same
    contract as upsert).  Idempotent: re-applying the same batch onto the
    result is a no-op state-wise.  Returns the published manifest.
    """
    # one materialization of the change batch: op validation, key distinct,
    # and the merge all reuse it instead of recomputing the changes plan
    changes = changes.localCheckpoint(eager=True)
    ops = [r[0] for r in changes.select(op_col).distinct().collect()]
    bad = [o for o in ops if o not in ("upsert", "delete")]
    if bad:
        raise ValueError(f"unknown {op_col} values: {bad} (use upsert/delete)")
    prev = read_manifest(root)
    version = (prev["version"] + 1 if prev else 1)
    if partition_col is not None:
        affected = [
            r[0] for r in changes.select(partition_col).distinct().collect()
        ]
        if any(p is None for p in affected):
            raise ValueError(
                f"NULL {partition_col!r} values in changes: NULL partitions "
                "are not supported by the snapshot layout"
            )
    upserts = changes.where(F.col(op_col) == "upsert").drop(op_col)
    change_keys = changes.select(*key_cols).distinct()
    _claim_version(root, version)
    try:
        vdir = os.path.join(root, f"v{version}")
        if partition_col is None:
            affected = [_NO_PART]
            merged = upserts
            if prev:
                cur = read_snapshot(spark, root)
                merged = upserts.unionByName(
                    cur.join(change_keys, key_cols, "left_anti")
                )
            tdir = os.path.join(vdir, _NO_PART)
            merged.write.mode("overwrite").parquet(tdir)
            # post-write emptiness check (a dir listing, like the
            # partitioned branch) instead of a pre-write isEmpty() that
            # would execute the whole merge plan twice
            if not any(n.endswith(".parquet") for n in os.listdir(tdir)):
                # a fully-emptied table has no data files to anchor a
                # readable version; surface it instead of publishing a
                # manifest that cannot be assembled
                raise ValueError(
                    "apply_cdc would delete every row of the snapshot; "
                    "drop/recreate the table instead"
                )
            parts = {_NO_PART: f"v{version}/{_NO_PART}"}
        else:
            prev_parts = dict(prev["partitions"]) if prev else {}
            live = [
                os.path.join(root, prev_parts[str(p)])
                for p in affected
                if str(p) in prev_parts
            ]
            merged = upserts
            if live:
                cur = spark.read.parquet(*live)
                merged = upserts.unionByName(
                    cur.join(change_keys, key_cols, "left_anti")
                )
            _write_partitioned(merged, vdir, partition_col)
            parts = prev_parts
            for p in affected:
                pdir = f"v{version}/_p={_escape_part(spark, p)}"
                if os.path.isdir(os.path.join(root, pdir)):
                    parts[str(p)] = pdir
                else:
                    # every row of this partition was deleted: partitionBy
                    # wrote no dir — tombstone it out of the manifest
                    parts.pop(str(p), None)
            if not parts:
                raise ValueError(
                    "apply_cdc would delete every row of the snapshot; "
                    "drop/recreate the table instead"
                )
        manifest = {
            "version": version,
            "partition_col": partition_col,
            "key_cols": key_cols,
            "partitions": parts,
            "rewritten": [str(p) for p in affected],
        }
        return _publish(root, manifest)
    except BaseException:
        _release_claim(root, version)
        raise
