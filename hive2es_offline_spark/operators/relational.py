"""Relational helpers where the naive plan collapses parallelism.

``grouped_topk`` — top-k per group when the group cardinality is LOW (a
handful of groups over millions of rows).  The direct window plan
(`row_number over (partition by g order by ...)`) shuffles every row to
one reducer per group and sorts there — 3 groups means 3 busy cores no
matter the cluster size.  The two-phase plan prunes first:

  phase 1: rank within (group, input-partition) — shuffle key cardinality
           is groups x partitions, fully parallel; keep local rank <= k.
  phase 2: exact rank over the survivors (<= k x partitions rows/group).

Correct for row_number-style top-k because a row in the global top-k is
necessarily in the top-k of its own input partition.  The pruning partition
id only affects WHICH superset survives phase 1, never the final result,
so output is deterministic given a deterministic ordering.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def grouped_topk(
    df: DataFrame,
    group_cols: list[str],
    order_exprs: list[Column],
    k: int,
    rank_col: str = "rn",
) -> DataFrame:
    local = Window.partitionBy(*group_cols, F.spark_partition_id()).orderBy(*order_exprs)
    pruned = (
        df.withColumn("_lr", F.row_number().over(local))
        .where(F.col("_lr") <= k)
        .drop("_lr")
    )
    exact = Window.partitionBy(*group_cols).orderBy(*order_exprs)
    return (
        pruned.withColumn(rank_col, F.row_number().over(exact))
        .where(F.col(rank_col) <= k)
    )
