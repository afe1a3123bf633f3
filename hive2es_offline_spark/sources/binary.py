"""Binary-file source: directories of raw media files -> payload rows.

The multimodal operators (``operators/multimodal.py`` / ``audio.py`` /
``video.py``) consume ``(doc_id, payload binary)`` rows.  The harness
synthesizes payloads, but a production corpus is a bucket of image/audio
files — Spark's built-in ``binaryFile`` source reads those distributed
(one row per file: path, modificationTime, length, content) with
pushed-down glob and size filtering.

Scale notes: listing parallelizes over the driver's file index;
``maxBytesPerFile`` guards a single huge file from blowing an executor
(oversized files are FILTERED with a loud marker column, not truncated —
a half-read JPEG is garbage).  Content bytes never route through the
driver.  The id is a deterministic function of the RELATIVE path (stable
across mounts/buckets), so re-ingest and incremental dedup keys agree
run-to-run.
"""

from __future__ import annotations

import posixpath

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = ["read_binary_dir"]


def read_binary_dir(
    spark: SparkSession,
    path: str,
    glob: str | None = None,
    max_bytes_per_file: int | None = 64 * 1024 * 1024,
    id_col: str = "doc_id",
) -> DataFrame:
    """Read a directory tree of binary files into payload rows:
    ``(doc_id, rel_path, length, payload, oversized)``.

    ``glob`` filters file names (e.g. ``"*.jpg"``); files larger than
    ``max_bytes_per_file`` keep their metadata row but carry a NULL
    payload and ``oversized=true`` — visible and countable, never a
    silently-truncated blob.  ``doc_id`` = xxhash64 of the relative path:
    deterministic, mount-independent, collision-safe at corpus scale
    (64-bit over file counts ≤ 10^9).
    """
    reader = spark.read.format("binaryFile")
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    reader = reader.option("recursiveFileLookup", "true")
    df = reader.load(path)
    # Strip the base as an EXACT prefix of the qualified URI Spark reports
    # in the path column (Hadoop's makeQualified — identical rendering),
    # not a regex search: a non-greedy '^.*?<base>/' can anchor at the
    # wrong occurrence when the base dir name recurs in an ancestor prefix
    # (e.g. /mnt/data/data), silently changing rel_path — and therefore
    # the xxhash64 doc_id — across mounts (ADVICE r6).
    jpath = spark._jvm.org.apache.hadoop.fs.Path(path)
    jfs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    qualified = jfs.makeQualified(jpath).toString().rstrip("/")
    rel = F.col("path").substr(F.lit(len(qualified) + 2), F.length("path"))
    out = df.select(
        F.xxhash64(rel).alias(id_col),
        rel.alias("rel_path"),
        F.col("length"),
        F.col("content").alias("payload"),
    )
    if max_bytes_per_file is not None:
        out = out.withColumn(
            "oversized", F.col("length") > F.lit(int(max_bytes_per_file))
        ).withColumn(
            "payload",
            F.when(~F.col("oversized"), F.col("payload")),
        )
    else:
        out = out.withColumn("oversized", F.lit(False))
    return out


