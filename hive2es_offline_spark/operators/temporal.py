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
from pyspark.sql import types as T


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_time: str,
    right_time: str,
    right_cols: list[str] | None = None,
    how: str = "left",
    strategy: str = "auto",
) -> DataFrame:
    """For every left row, attach the LATEST right row with
    ``right_time <= left_time`` for the same key (classic as-of / backward
    join, e.g. event -> the user's last order at or before the event).

    ``strategy="auto"`` (default) picks ``"broadcast"`` when the right
    side's Catalyst size estimate fits under
    ``spark.sql.autoBroadcastJoinThreshold`` — the same signal Spark's own
    join planning uses — and ``"union"`` otherwise, so dim-sized lookups
    never shuffle the fact side by accident.

    ``strategy="union"`` (the scalable plan): tag and union both
    sides, sort each key's timeline once, and carry the latest right row
    forward with ``last(ignorenulls)`` — ONE shuffle, intermediate size
    |left| + |right|.  ``strategy="broadcast"`` is the dim-sized fast path:
    the right side collapses to one sorted array per key and broadcasts, so
    the LEFT side never shuffles at all (plan: BroadcastHashJoin) — use when
    the right table is small enough to broadcast (reference dims, band
    tables, slowly-changing lookup history).  ``strategy="join"``
    materializes every (left row x earlier right row) match before rank-1 —
    O(|left| x avg right rows per key) intermediate; kept for cross-checking.
    """
    right_cols = right_cols or [c for c in right.columns if c not in (on, right_time)]
    # a null right timestamp can never satisfy `rt <= lt`: drop those rows up
    # front so every strategy agrees (the union plan's nulls-first sort would
    # otherwise carry them into left rows that have no earlier match)
    right = right.where(F.col(right_time).isNotNull())
    if strategy == "auto":
        strategy = "broadcast" if _fits_broadcast(right) else "union"
    if strategy == "join":
        return _asof_join_via_join(left, right, on, left_time, right_time, right_cols, how)
    if strategy == "broadcast":
        return _asof_join_via_broadcast(left, right, on, left_time, right_time, right_cols, how)

    # union plan: right rows sort before left rows at equal timestamps so
    # the as-of is inclusive (rt == lt matches); later right rows overwrite
    # earlier ones in the running last().  The carried payload is ONE struct
    # so the whole right row travels atomically — per-column last() would
    # stitch values from different right rows when right columns are null.
    carried = [right_time] + right_cols
    carry_struct = F.struct(*[F.col(c) for c in carried])
    null_carry = F.lit(None).cast(
        T.StructType([right.schema[c] for c in carried])
    )
    r_tagged = right.select(
        F.col(on),
        F.col(right_time).alias("_t"),
        F.lit(0).alias("_side"),  # right first at equal _t
        carry_struct.alias("_carry"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(f"_left_{c}") for c in left.columns],
    )
    l_tagged = left.select(
        F.col(on),
        F.col(left_time).alias("_t"),
        F.lit(1).alias("_side"),
        null_carry.alias("_carry"),
        *[F.col(c).alias(f"_left_{c}") for c in left.columns],
    )
    # deterministic tie-break among right rows at identical _t: struct
    # ordering makes the max carried tuple win (matches the join strategy's
    # DESC rank-1 choice)
    w = (
        Window.partitionBy(on)
        .orderBy(F.col("_t"), F.col("_side"), F.col("_carry"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    timeline = r_tagged.unionByName(l_tagged).select(
        "*", F.last(F.col("_carry"), ignorenulls=True).over(w).alias("_asof")
    )
    out = timeline.where(F.col("_side") == 1).select(
        *[F.col(f"_left_{c}").alias(c) for c in left.columns],
        *[F.col("_asof").getField(c).alias(f"asof_{c}") for c in carried],
    )
    if how == "inner":
        return out.where(F.col(f"asof_{right_time}").isNotNull())
    return out


def _fits_broadcast(df: DataFrame) -> bool:
    """True when the plan's Catalyst size estimate is under
    ``spark.sql.autoBroadcastJoinThreshold`` (disabled/unparseable -> False).
    Reads the optimizer's own statistics rather than counting rows, so the
    decision costs no job."""
    raw = str(
        df.sparkSession.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    ).strip().lower()
    mult = 1
    for suffix, m in (("kb", 1024), ("mb", 1024**2), ("gb", 1024**3), ("b", 1),
                      ("k", 1024), ("m", 1024**2), ("g", 1024**3)):
        if raw.endswith(suffix):
            raw, mult = raw[: -len(suffix)], m
            break
    try:
        threshold = int(raw) * mult
    except ValueError:
        return False
    if threshold <= 0:  # -1 = broadcasting disabled
        return False
    try:
        # py4j hands back a plain int (Spark 4) or a Scala BigInt (older)
        size = int(str(df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()))
    except Exception:  # noqa: BLE001 — stats unavailable (e.g. Connect): stay safe
        return False
    return size <= threshold


def _asof_join_via_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_time: str,
    right_time: str,
    right_cols: list[str],
    how: str,
) -> DataFrame:
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


def _asof_join_via_broadcast(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_time: str,
    right_time: str,
    right_cols: list[str],
    how: str,
) -> DataFrame:
    """Small-right fast path: collapse the right side to one ascending-sorted
    array of (t, payload) structs per key, broadcast it, and pick the last
    element with ``t <= left_time`` per left row — a BroadcastHashJoin with
    zero shuffle on the left side.

    ``sort_array`` orders structs lexicographically (t first, payload as
    tiebreaker), and ``element_at(filter(...), -1)`` takes the max qualifying
    tuple — identical tie-breaking to the union strategy's running
    ``last()`` over (t, payload)-ordered rows."""
    carried = [right_time] + right_cols
    packed = right.groupBy(on).agg(
        F.sort_array(
            F.collect_list(F.struct(*[F.col(c) for c in carried]))
        ).alias("_timeline")
    )
    lt = F.col(left_time)
    # try_element_at: no qualifying element -> null (plain element_at throws
    # on the empty array under ANSI mode, Spark 4 default)
    best = F.try_element_at(
        F.filter(F.col("_timeline"), lambda x: x.getField(right_time) <= lt), F.lit(-1)
    )
    out = (
        left.join(F.broadcast(packed), on=on, how="left")
        .withColumn("_asof", best)
        .select(
            *[F.col(c) for c in left.columns],
            *[F.col("_asof").getField(c).alias(f"asof_{c}") for c in carried],
        )
    )
    if how == "inner":
        return out.where(F.col(f"asof_{right_time}").isNotNull())
    return out


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


def downsample(
    df: DataFrame,
    ts_col: str,
    interval: str,
    dims: list[str],
    metrics: list[str],
    labels: list[str] | None = None,
) -> DataFrame:
    """TSDB downsampling with ES's downsample-API semantics (round 12):
    one output row per (dimensions, fixed time bucket) carrying each
    metric's ``<m>_min`` / ``<m>_max`` / ``<m>_sum`` / ``<m>_value_count``
    and each label's LAST value by timestamp — the rollup shape ES's
    time-series downsampling writes for gauge metrics + labels.

    ``interval`` is a fixed interval (``"90s" | "30m" | "6h" | "7d"``);
    buckets are epoch-aligned like the date_histogram fixed_interval
    path.  Scale shape: ONE groupBy shuffle on (dims, bucket); sums are
    decimal-routed (order-exact, oracle-mirrorable); the last-by-ts
    label uses ``max_by`` — deterministic when timestamps are unique
    within a bucket (duplicate-ts label rows are tie-broken by Spark's
    max_by arbitrarily; pass a unique ts or pre-dedup if that matters).
    """
    import re as _re

    m = _re.fullmatch(r"(\d+)(s|m|h|d)", str(interval))
    if not m:
        raise ValueError(f"unsupported downsample interval: {interval!r}")
    secs = int(m.group(1)) * {"s": 1, "m": 60, "h": 3600,
                              "d": 86400}[m.group(2)]
    ts = F.col(ts_col)
    bucket = F.timestamp_seconds(
        F.floor(F.unix_timestamp(ts) / secs) * secs).alias("_tsid")
    exprs: list = []
    for mc in metrics:
        c = F.col(mc)
        exprs += [
            F.min(c).alias(f"{mc}_min"),
            F.max(c).alias(f"{mc}_max"),
            F.sum(c.cast("decimal(28,6)")).cast("double")
             .alias(f"{mc}_sum"),
            F.count(c).alias(f"{mc}_value_count"),
        ]
    for lb in labels or []:
        exprs.append(F.max_by(F.col(lb), ts).alias(f"{lb}_last"))
    return df.groupBy(*dims, bucket).agg(*exprs)
