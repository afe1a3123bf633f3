"""Small operator utilities."""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def explode_sum(partials: DataFrame, key_cols: Sequence[str] = ()) -> DataFrame:
    """Element-wise sum of per-partition vector partials, JVM-side: rows
    carry a flat double array ``m``; posexplode to (keys..., pos, x)
    scalars, then SUM per (keys..., pos) — Spark's partial aggregation
    map-side-combines, so each shuffle-map task emits at most
    |keys| x len(m) rows and NOTHING in the pipeline grows with the input
    partition count.  The shared core of the k-means mean step
    (``similarity._combine_cell_partials``) and the PCA moments pass
    (``embeddings._moment_flat``) — the scale fix for
    collect-one-row-per-partition driver combines."""
    return (
        partials.select(*key_cols, F.posexplode("m").alias("_p", "_x"))
        .groupBy(*key_cols, "_p")
        .agg(F.sum("_x").alias("_x"))
    )


def fan_out(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Ensure at least ``min_partitions`` (default: cluster parallelism)
    input partitions before a compute-heavy narrow stage.

    Small inputs often arrive as a single parquet file = a single task,
    serializing explode/signature work on one core.  At real scale inputs
    already have >= parallelism splits and this is a no-op.

    ``df.rdd.getNumPartitions()`` converts the analyzed plan to an RDD to
    read its partitioning — no job runs, but a Python-side RDD object is
    materialized per call.  That cost is accepted knowingly: there is no
    DataFrame-level partitioning probe, and the alternative (estimating
    from ``maxPartitionBytes``) misjudges compressed columnar inputs."""
    sc = df.sparkSession.sparkContext
    target = min_partitions or sc.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
