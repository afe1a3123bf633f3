"""Skew-handling utilities for hot-key aggregations and joins.

At 100 TB a handful of hot keys (one viral document id, one default routing
value) can pin a single reducer for hours.  Two standard remedies, both
expressed declaratively so they compose with any plan:

* ``salted_agg`` — two-phase aggregation: salt the key into ``factor``
  sub-keys, partially aggregate, then merge.  Use when one groupBy key
  dominates; equivalent results for any algebraic aggregate (sum/count/
  min/max) supplied as (partial, merge) pairs.
* ``salted_left_join`` — replicate the small side ``factor`` times and salt
  the big side's key so one hot join key spreads over ``factor`` reducers.
  (For dims that simply fit in memory, prefer ``F.broadcast`` — this is for
  the awkward middle: too big to broadcast, too skewed to shuffle-join.)

AQE's skew-join splitting handles many cases automatically; these helpers
cover aggregations (where AQE does not re-split) and forced shuffle joins.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def with_salt(df: DataFrame, factor: int, salt_col: str = "_salt") -> DataFrame:
    """Deterministic salt 0..factor-1 derived from the row content hash of a
    uniformly-distributed existing column set (falls back to ``rand``-free
    round-robin via ``spark_partition_id + monotonically_increasing_id``).

    Determinism matters: retried tasks must salt a row identically or
    two-phase aggregation double-counts under speculative execution."""
    all_cols = [F.col(c) for c in df.columns]
    return df.withColumn(salt_col, F.pmod(F.xxhash64(*all_cols), F.lit(factor)).cast("int"))


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[Column, Column]],
    factor: int = 16,
) -> DataFrame:
    """Two-phase aggregation over skewed keys.

    ``aggs`` maps output name -> (partial aggregate over raw rows, merge
    aggregate over partials); e.g.::

        salted_agg(df, ["k"], {
            "n":       (F.count(F.lit(1)),      F.sum("n")),
            "sum_v":   (F.sum("v"),             F.sum("sum_v")),
            "max_v":   (F.max("v"),             F.max("max_v")),
        })

    Phase 1 groups on (keys + salt) — the hot key's rows spread over
    ``factor`` reducers; phase 2 merges the ``factor`` partials per key
    (tiny).  Both phases are map-side combined by Spark as usual.
    """
    salted = with_salt(df, factor)
    phase1 = salted.groupBy(*keys, "_salt").agg(
        *[p.alias(name) for name, (p, _) in aggs.items()]
    )
    return phase1.groupBy(*keys).agg(
        *[m.alias(name) for name, (_, m) in aggs.items()]
    )


def salted_left_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    factor: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-resistant join: salt the big side, explode the small side across
    all salt values, join on (key, salt)."""
    big_s = with_salt(big, factor)
    small_s = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(factor - 1)))
    )
    out = big_s.join(small_s, on=[on, "_salt"], how=how)
    return out.drop("_salt")
