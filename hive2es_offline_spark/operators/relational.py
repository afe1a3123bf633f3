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


def grouping_sets_preagg(
    df: DataFrame,
    dims: list[str],
    sets: list[list[str]],
    base_aggs: list[Column],
    final_aggs: list[Column],
) -> DataFrame:
    """Two-phase GROUPING SETS for algebraic aggregates.

    The direct ``groupingSets(...)`` plan puts Expand *below* the partial
    aggregate, so with S grouping sets every input row is replicated S
    times before the map-side combine — at 100 TB that is S× the data
    through the hottest stage.  When every aggregate is algebraic
    (sum/count/min/max — anything where agg(agg(parts)) == agg(whole)),
    the super-aggregates can instead be computed FROM the base grain:

      phase 1: ``groupBy(*dims).agg(*base_aggs)`` — one pass, no Expand,
               output is one row per base group (tiny).
      phase 2: ``groupingSets(sets, *dims).agg(*final_aggs)`` over the
               phase-1 result — Expand runs over the pre-aggregate only.

    ``final_aggs`` re-aggregate the phase-1 aliases (count → sum of
    counts, sum → sum of sums) and may use ``F.grouping(...)`` — grouping
    flags come from the phase-2 grouping sets exactly as in the direct
    plan.  avg/stddev must be decomposed by the caller (sum+count);
    count(DISTINCT x) is NOT algebraic and needs the direct plan.
    """
    base = df.groupBy(*dims).agg(*base_aggs)
    return base.groupingSets(sets, *dims).agg(*final_aggs)


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
