"""Temporal join operators Spark lacks as primitives: as-of join and
range join — composed from existing DataFrame ops (join + window), so
Catalyst still owns the physical strategy.

Scale notes:

* ``asof_join`` shuffles both sides once on the key, then a per-(left-row)
  window picks the latest right row — the join itself is an equi-join, so
  sort-merge/AQE/skew handling all apply.  For severely unbalanced key
  cardinalities, pre-bucket both tables on the key to make the shuffle a
  no-op.
* ``range_join`` against a small bands table is a broadcast non-equi join
  (nested-loop against the broadcast side) — the standard plan for
  value-banding dims.  Against two LARGE ranges, band the range into fixed
  buckets first (equi-join on bucket, then refine) — provided here as
  ``range_join_banded``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_time: str,
    right_time: str,
    right_cols: list[str] | None = None,
    how: str = "left",
) -> DataFrame:
    """For every left row, attach the LATEST right row with
    ``right_time <= left_time`` for the same key (classic as-of / backward
    join, e.g. order -> last event before the order).

    Implementation: equi-join on the key with the time predicate, then keep
    rank-1 per left row ordered by right_time desc (ties broken by the full
    right column tuple for determinism)."""
    right_cols = right_cols or [c for c in right.columns if c not in (on, right_time)]
    l, r = left.alias("l"), right.alias("r")
    joined = l.join(
        r,
        on=[F.col(f"l.{on}") == F.col(f"r.{on}"), F.col(f"r.{right_time}") <= F.col(f"l.{left_time}")],
        how="inner",
    )
    order = [F.col(f"r.{right_time}").desc()] + [F.col(f"r.{c}").desc() for c in right_cols]
    w = Window.partitionBy(*[F.col(f"l.{c}") for c in left.columns]).orderBy(*order)
    best = (
        joined.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .select(
            *[F.col(f"l.{c}") for c in left.columns],
            F.col(f"r.{right_time}").alias(f"asof_{right_time}"),
            *[F.col(f"r.{c}").alias(f"asof_{c}") for c in right_cols],
        )
    )
    if how == "left":
        return left.join(best, on=left.columns, how="left")
    return best


def range_join(
    facts: DataFrame,
    bands: DataFrame,
    value_col: str,
    lo_col: str = "lo",
    hi_col: str = "hi",
) -> DataFrame:
    """Attach the band row whose [lo, hi) interval contains ``value_col``.
    ``bands`` is broadcast (small dim): the non-equi predicate becomes a
    broadcast nested-loop join — the right plan for banding dims."""
    return facts.join(
        F.broadcast(bands),
        on=[facts[value_col] >= bands[lo_col], facts[value_col] < bands[hi_col]],
        how="left",
    )


def range_join_banded(
    facts: DataFrame,
    ranges: DataFrame,
    value_col: str,
    lo_col: str,
    hi_col: str,
    band_width: float,
) -> DataFrame:
    """Large-x-large range join: quantize both sides into fixed-width bands,
    equi-join on the band id, refine with the exact predicate.  A range row
    spanning k bands is replicated k times (``sequence`` + ``explode``) —
    shuffle volume scales with total band coverage, not |facts| x |ranges|."""
    fb = facts.withColumn("_band", F.floor(F.col(value_col) / band_width).cast("long"))
    rb = ranges.withColumn(
        "_band",
        F.explode(
            F.sequence(
                F.floor(F.col(lo_col) / band_width).cast("long"),
                F.floor((F.col(hi_col) - 1e-9) / band_width).cast("long"),
            )
        ),
    )
    return fb.join(rb, on="_band", how="inner").where(
        (F.col(value_col) >= F.col(lo_col)) & (F.col(value_col) < F.col(hi_col))
    ).drop("_band")
