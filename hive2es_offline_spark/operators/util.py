"""Small operator utilities."""

from __future__ import annotations

from pyspark.sql import DataFrame


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
