"""Training-data export sinks: sharded JSONL and WebDataset-style tar shards.

The reference's only output is an ES index (bundle or bulk); a training-data
engine also has to hand corpora to trainers, and the two lingua-franca
formats there are (a) sharded ``*.jsonl.gz`` and (b) WebDataset tar shards
(one tar member per sample component, samples grouped by basename).  Both
sinks here follow the bundle sink's protocol (stage under ``_tmp``, validate,
atomic rename) so a half-written export is never visible to a consumer.

Scale notes: both writers are embarrassingly parallel — every task writes
only its own shard files, the driver touches only the manifest.  Shard
assignment is a deterministic hash of the sample key, so retries and
re-runs produce identical shard membership (round-robin ``repartition(n)``
would not).  JSON serialization stays JVM-side (``to_json`` + the json text
source); only the tar writer drops to Python, via Arrow batches, because
tar framing is genuinely imperative.

Deployment caveat (tar writer): tasks open ``path`` with the local
``tarfile``/``os`` API, so on a multi-node cluster ``path`` MUST be a
shared mount (NFS/FUSE-mounted object store) — unlike the JSONL writer,
whose data AND manifest/publish steps all go through Hadoop's filesystem
layer (``_finalize`` resolves the scheme's FileSystem via the JVM), so any
hdfs/s3a URI works end-to-end.  The publish rename is atomic on posix and
HDFS; on S3-like stores pair it with a committer or treat the manifest as
the commit marker.
"""

from __future__ import annotations

import io
import json
import os
import tarfile
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _finalize(
    staging: str, dest: str, manifest: dict, overwrite: bool, spark=None
) -> dict:
    """Write the manifest into ``staging`` and publish staging -> dest.

    With a ``spark`` session the whole step goes through the Hadoop
    FileSystem resolved from the path's scheme (hdfs://, s3a://, file:/...),
    so the writer's any-URI contract holds for the publish too; without one
    (tar writer: local/shared-posix only by design) it uses the local
    ``os`` API."""
    if spark is not None:
        jvm = spark._jvm
        conf = spark._jsc.hadoopConfiguration()
        src = jvm.org.apache.hadoop.fs.Path(staging)
        dst = jvm.org.apache.hadoop.fs.Path(dest)
        fs = src.getFileSystem(conf)
        out = fs.create(jvm.org.apache.hadoop.fs.Path(src, "_MANIFEST.json"), True)
        try:
            out.write(bytearray(json.dumps(manifest, indent=2, sort_keys=True).encode()))
        finally:
            out.close()
        if fs.exists(dst):
            if not overwrite:
                # MUST pre-check: Hadoop rename(src, existing-dir) moves src
                # INSIDE dst and returns true — the export would land at
                # dest/<staging-name> while readers silently see stale data
                raise FileExistsError(
                    f"export destination exists and overwrite=False: {dest}"
                )
            fs.delete(dst, True)
        if not fs.rename(src, dst):  # atomic on posix/HDFS-like filesystems
            raise IOError(f"publish rename failed: {staging} -> {dest}")
        return manifest
    with open(os.path.join(staging, "_MANIFEST.json"), "w") as f:
        json.dump(manifest, f, indent=2, sort_keys=True)
    if overwrite and os.path.exists(dest):
        import shutil

        shutil.rmtree(dest)
    os.rename(staging, dest)  # atomic on posix/HDFS-like filesystems
    return manifest


def write_jsonl(
    df: DataFrame,
    path: str,
    num_shards: int,
    key_col: str,
    compression: str = "gzip",
    overwrite: bool = True,
    validate: str = "full",
) -> dict:
    """Export ``df`` as ``num_shards`` JSONL files (default gzip), staged and
    atomically published, returning a manifest with per-shard row counts.

    One shuffle: ``repartition(num_shards, hash(key_col))`` — deterministic
    shard membership under retries.  Rows serialize JVM-side (``to_json`` of
    the full struct; no Python in the data path) and each task writes
    exactly one shard file.

    ``validate`` picks the post-write guarantee (measured at sf0.1, 32
    cores: full = write 0.22 s + re-read 0.14 s; fast skips the re-read —
    see BENCH_DIAGNOSIS_r06.md):

    * ``"full"`` (default) — re-read what was written (one extra decompress
      pass, the bundle sink's doc-count gate) and record per-shard ROW
      counts; proves every file on disk parses back.
    * ``"fast"`` — count rows *during* the write via ``df.observe`` (rides
      the write action, no second pass) and inventory the shard files with
      a filesystem listing (names + byte sizes, all non-empty).  Proves
      row count and file presence, not re-readability.
    """
    if validate not in ("full", "fast"):
        raise ValueError(f"validate must be 'full' or 'fast', got {validate!r}")
    staging, dest = path + "_tmp", path
    spark = df.sparkSession
    out = df.repartition(num_shards, F.col(key_col)).select(
        F.to_json(F.struct(*df.columns)).alias("value")
    )
    obs = None
    if validate == "fast":
        from pyspark.sql import Observation

        obs = Observation()
        out = out.observe(obs, F.count(F.lit(1)).alias("n"))
    (
        out.write.mode("overwrite")
        .option("compression", compression)
        .text(staging)
    )
    manifest = {
        "format": "jsonl",
        "compression": compression,
        "num_shards": num_shards,
        "validation": validate,
    }
    if validate == "full":
        per_file = (
            spark.read.text(staging)
            .select(F.input_file_name().alias("f"))
            .groupBy("f")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        )
        counts = {os.path.basename(r["f"]): int(r["n"]) for r in per_file}
        manifest["row_count"] = sum(counts.values())
        manifest["shard_counts"] = counts
    else:
        jvm = spark._jvm
        fs_path = jvm.org.apache.hadoop.fs.Path(staging)
        fs = fs_path.getFileSystem(spark._jsc.hadoopConfiguration())
        sizes = {}
        for st in fs.listStatus(fs_path):
            name = st.getPath().getName()
            if name.startswith("part-"):
                sizes[name] = int(st.getLen())
        row_count = int(obs.get["n"])
        if row_count > 0 and sum(sizes.values()) == 0:
            raise IOError(f"{row_count} rows written but all shard files empty")
        manifest["row_count"] = row_count
        manifest["shard_bytes"] = sizes
    return _finalize(staging, dest, manifest, overwrite, spark=spark)


def read_jsonl(spark, path: str, schema=None) -> DataFrame:
    """Read a ``write_jsonl`` export (or any JSONL directory).  With a schema
    the read is single-pass; without, Spark samples for inference —
    acceptable for exploration, pass the schema in production."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.option("pathGlobFilter", "part-*").json(path)


def write_webdataset(
    df: DataFrame,
    path: str,
    key_col: str,
    members: dict[str, str],
    num_shards: int = 16,
    samples_per_tar: int | None = None,
    overwrite: bool = True,
) -> dict:
    """Export samples as WebDataset tar shards: for each row, one tar member
    per ``members`` entry — ``{"text": ".txt", "meta": ".json", "img": ".png"}``
    — all sharing the sample key as basename, the layout streaming trainers
    (and the public webdataset loader) consume sequentially.

    ``string`` columns write utf-8, ``binary`` columns write raw bytes, and
    anything else writes its JSON encoding.  Samples hash-shard on
    ``key_col`` (deterministic membership) and sort by key within the shard
    so shard content is byte-reproducible.  Each task streams its Arrow
    batches straight into tar files of at most ``samples_per_tar`` samples
    (unbounded = one tar per shard) — nothing is buffered beyond one batch,
    no driver data movement.  Returns the published manifest.
    """
    staging, dest = path + "_tmp", path
    os.makedirs(staging, exist_ok=True)
    cols = [key_col, *members.keys()]
    binary_cols = {c for c, t in df.dtypes if t == "binary"}
    string_cols = {c for c, t in df.dtypes if t == "string"}

    def write_partition(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        out: list[tuple[str, int, int]] = []
        tar = None
        tar_path = ""
        n_in_tar = 0
        n_tars = 0

        def roll() -> tarfile.TarFile:
            nonlocal tar, tar_path, n_in_tar, n_tars
            if tar is not None:
                tar.close()
                out.append((os.path.basename(tar_path), n_in_tar, os.path.getsize(tar_path)))
            tar_path = os.path.join(staging, f"shard-{pid:05d}-{n_tars:04d}.tar")
            n_tars += 1
            n_in_tar = 0
            tar = tarfile.open(tar_path, "w")
            return tar

        for pdf in batches:
            for row in pdf.itertuples(index=False):
                r = dict(zip(pdf.columns, row))
                if tar is None or (samples_per_tar and n_in_tar >= samples_per_tar):
                    roll()
                key = str(r[key_col])
                for col, ext in members.items():
                    v = r[col]
                    if col in binary_cols:
                        data = bytes(v) if v is not None else b""
                    elif col in string_cols:
                        data = (v or "").encode("utf-8")
                    else:
                        data = json.dumps(v, default=str).encode("utf-8")
                    info = tarfile.TarInfo(name=f"{key}{ext}")
                    info.size = len(data)
                    info.mtime = 0  # reproducible archives
                    tar.addfile(info, io.BytesIO(data))
                n_in_tar += 1
        if tar is not None:
            tar.close()
            out.append((os.path.basename(tar_path), n_in_tar, os.path.getsize(tar_path)))
        yield pd.DataFrame(out, columns=["tar", "n_samples", "n_bytes"])

    shards = (
        df.select(*cols)
        .repartition(num_shards, F.col(key_col))
        .sortWithinPartitions(key_col)
        .mapInPandas(write_partition, "tar string, n_samples long, n_bytes long")
        .collect()  # one row per tar file written — bounded by shard count
    )
    counts = {r["tar"]: int(r["n_samples"]) for r in shards}
    manifest = {
        "format": "webdataset",
        "members": members,
        "num_shards": num_shards,
        "sample_count": sum(counts.values()),
        "tar_counts": counts,
        "tar_bytes": {r["tar"]: int(r["n_bytes"]) for r in shards},
    }
    return _finalize(staging, dest, manifest, overwrite)
