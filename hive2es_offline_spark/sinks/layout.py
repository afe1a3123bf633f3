"""Table-layout maintenance: small-file compaction and sort-clustered rewrite.

A 100 TB table that streaming ingest / per-shard jobs have fragmented into
millions of small files reads catastrophically (one task + one open per
file, footer overhead per file); the standard fix is a compaction job that
rewrites partitions into target-sized files, optionally range-clustering on
query columns so min/max footer stats prune scans.  The reference never
needs this (its output is Lucene segments, force-merged to 1 — the same
idea for its own storage: ``ESContainer.scala:226-240``); this is the
parquet-table equivalent.

Sizing comes from the SOURCE's actual bytes/row (Hadoop ContentSummary /
file listing — driver metadata calls, no data read), not a guess, so the
target holds across compression and schema width.  Modes:

* ``mode="coalesce"`` (default) — shuffle-free: merges existing partitions
  down to the target count.  The right choice when the input is merely
  fragmented.
* ``mode="range"`` — one range-partitioning shuffle on ``sort_cols`` +
  in-partition sort: produces globally clustered files whose min/max
  footer ranges are disjoint, so later predicates on the sort key scan
  only matching files.  The write-side half of predicate pushdown.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def table_stats(spark: SparkSession, path: str) -> dict:
    """(bytes, file count) of a table directory via driver metadata calls
    (Hadoop ContentSummary — works on HDFS/S3A/local alike, reads no data)."""
    jvm = spark._jvm
    p = jvm.org.apache.hadoop.fs.Path(path)
    fs = p.getFileSystem(spark._jsc.hadoopConfiguration())
    s = fs.getContentSummary(p)
    return {"bytes": int(s.getLength()), "files": int(s.getFileCount())}


def compact_parquet(
    spark: SparkSession,
    src: str,
    dest: str,
    target_file_bytes: int = 256 * 1024 * 1024,
    sort_cols: list[str] | None = None,
    mode: str = "coalesce",
    before_stats: dict | None = None,
) -> dict:
    """Rewrite ``src`` into ``dest`` as ~``target_file_bytes`` parquet files.

    Returns before/after stats.  ``mode="range"`` requires ``sort_cols`` and
    additionally clusters rows so each output file covers a disjoint
    ``sort_cols`` range (scan-pruning layout).  ``maxRecordsPerFile`` is
    derived from the source's measured bytes/row as a safety bound so one
    oversized task can't emit a multi-GB file.  ``before_stats`` lets a
    caller that already measured the source (e.g. to size
    ``target_file_bytes``) pass its ``table_stats`` result instead of
    paying a second metadata listing.
    """
    if mode not in ("coalesce", "range"):
        raise ValueError(f"mode must be 'coalesce' or 'range', got {mode!r}")
    if mode == "range" and not sort_cols:
        raise ValueError("mode='range' requires sort_cols")
    before = before_stats or table_stats(spark, src)
    df = spark.read.parquet(src)
    rows = df.count()  # parquet metadata count: footer reads, no data scan
    if rows == 0:
        df.coalesce(1).write.mode("overwrite").parquet(dest)
        return {"before": before, "after": table_stats(spark, dest), "rows": 0}
    bytes_per_row = max(before["bytes"] / rows, 1e-9)
    n_files = max(1, math.ceil(before["bytes"] / target_file_bytes))
    max_records = max(1, int(target_file_bytes / bytes_per_row))
    if mode == "range":
        out = df.repartitionByRange(n_files, *[F.col(c) for c in sort_cols])
        out = out.sortWithinPartitions(*sort_cols)
    else:
        out = df.coalesce(n_files)
        if sort_cols:
            out = out.sortWithinPartitions(*sort_cols)
    (
        out.write.mode("overwrite")
        .option("maxRecordsPerFile", max_records)
        .parquet(dest)
    )
    after = table_stats(spark, dest)
    return {
        "before": before,
        "after": after,
        "rows": rows,
        "target_file_bytes": target_file_bytes,
        "max_records_per_file": max_records,
        "mode": mode,
    }


def zorder_key(
    df: DataFrame, cols: list[str], bits: int = 8
) -> tuple[DataFrame, str]:
    """Attach a Z-order (Morton) key over ``cols`` — the multi-column
    clustering layout of the public table formats (Delta/Iceberg
    ``OPTIMIZE ZORDER``): range clustering on ONE column makes its file
    min/max ranges disjoint but leaves every other column's ranges full-
    width; interleaving the bit-planes of each column's normalized rank
    gives every participating column partially-disjoint file ranges, so a
    filter on ANY of them prunes files.

    Entirely JVM-side: one tiny min/max aggregate per column (driver
    literals), then the key is an equi-width bucket (``bits`` bits per
    column) with bit-plane interleave built from shiftleft/bitwise-or
    codegen expressions — no Python in the row path.  NULLs bucket to 0
    (cluster together at the low corner).

    Returns (df + key column, key column name).  Equi-width bucketing is
    deliberate — quantile buckets cluster marginally better on skewed data
    but cost a percentile sketch per column; min/max is a metadata-cheap
    aggregate and the pruning win is nearly identical at file granularity."""
    if not cols:
        raise ValueError("zorder_key needs at least one column")
    if not 1 <= bits <= 20:
        raise ValueError(f"bits must be in [1, 20], got {bits}")
    if bits * len(cols) > 63:
        # the interleaved key lives in one signed 64-bit long; Java shift
        # amounts wrap at 64 (shift & 63), so overflowing positions would
        # silently collide bit planes and corrupt the clustering order
        raise ValueError(
            f"bits * len(cols) must be <= 63 to fit a long Morton key, "
            f"got {bits} * {len(cols)} = {bits * len(cols)}; lower bits "
            f"(e.g. bits={63 // len(cols)} for {len(cols)} columns)"
        )
    stats = df.agg(
        *[F.min(F.col(c).cast("double")).alias(f"_min_{i}") for i, c in enumerate(cols)],
        *[F.max(F.col(c).cast("double")).alias(f"_max_{i}") for i, c in enumerate(cols)],
    ).first()
    nbuckets = (1 << bits) - 1
    bucket_cols = []
    for i, c in enumerate(cols):
        lo, hi = stats[f"_min_{i}"], stats[f"_max_{i}"]
        if lo is None or hi is None or hi <= lo:
            bucket_cols.append(F.lit(0).cast("long"))
            continue
        scaled = (F.col(c).cast("double") - F.lit(float(lo))) / F.lit(float(hi - lo))
        raw = F.least(F.floor(scaled * nbuckets), F.lit(nbuckets)).cast("long")
        # explicit NULL guard: least() SKIPS null operands (null floor ->
        # least(null, cap) = cap), which would z-cluster NULLs at the TOP
        # corner instead of the documented low corner
        bucket_cols.append(
            F.when(F.col(c).isNull(), F.lit(0).cast("long")).otherwise(raw)
        )
    key = F.lit(0).cast("long")
    for b in range(bits):
        for i, bc in enumerate(bucket_cols):
            bit = F.shiftright(bc, b).bitwiseAND(F.lit(1))
            key = key.bitwiseOR(F.shiftleft(bit, b * len(cols) + i))
    name = "_zorder_key"
    return df.withColumn(name, key), name


def zorder_parquet(
    spark: SparkSession,
    src: str,
    dest: str,
    cols: list[str],
    target_file_bytes: int = 256 * 1024 * 1024,
    bits: int = 8,
    before_stats: dict | None = None,
) -> dict:
    """Rewrite ``src`` Z-order-clustered on ``cols`` (the multi-column
    sibling of ``compact_parquet(mode="range")``): one range shuffle on the
    Morton key + in-partition sort, file count sized from measured source
    bytes.  The key column is dropped before the write — it is pure layout,
    not data.  ``before_stats`` as in ``compact_parquet``."""
    before = before_stats or table_stats(spark, src)
    df = spark.read.parquet(src)
    rows = df.count()
    if rows == 0:
        df.coalesce(1).write.mode("overwrite").parquet(dest)
        return {"before": before, "after": table_stats(spark, dest), "rows": 0}
    keyed, key = zorder_key(df, cols, bits)
    n_files = max(1, math.ceil(before["bytes"] / target_file_bytes))
    max_records = max(1, int(target_file_bytes / max(before["bytes"] / rows, 1e-9)))
    (
        keyed.repartitionByRange(n_files, F.col(key))
        .sortWithinPartitions(key)
        .drop(key)
        .write.mode("overwrite")
        .option("maxRecordsPerFile", max_records)
        .parquet(dest)
    )
    return {
        "before": before,
        "after": table_stats(spark, dest),
        "rows": rows,
        "cols": list(cols),
        "bits": bits,
    }


def file_range_overlap(path: str, col: str) -> float:
    """Diagnostic: fraction of file pairs whose [min, max] ranges of ``col``
    overlap (0.0 = perfectly clustered, 1.0 = every file overlaps every
    other).  Reads only parquet footers via pyarrow — a local/test helper;
    at cluster scale compute the same from ``input_file_name`` + min/max."""
    import glob as _glob
    import os

    import pyarrow.parquet as pq

    ranges = []
    for f in _glob.glob(os.path.join(path, "*.parquet")):
        md = pq.ParquetFile(f).metadata
        schema_idx = {md.schema.column(i).name: i for i in range(md.num_columns)}
        i = schema_idx[col]
        mins, maxs = [], []
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(i).statistics
            if st is None or not st.has_min_max:
                return 1.0  # no stats: assume worst
            mins.append(st.min)
            maxs.append(st.max)
        ranges.append((min(mins), max(maxs)))
    n = len(ranges)
    if n < 2:
        return 0.0
    overlaps = sum(
        1
        for i in range(n)
        for j in range(i + 1, n)
        if ranges[i][0] <= ranges[j][1] and ranges[j][0] <= ranges[i][1]
    )
    return overlaps / (n * (n - 1) / 2)
