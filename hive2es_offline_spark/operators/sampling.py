"""Dataset splitting and sampling for training pipelines.

``hash_split`` is the canonical train/val/test assignment at scale: a
deterministic pure function of the row id, so it is (a) reproducible across
runs/engines with no stored split table, (b) stable under re-partitioning
and task retries (unlike ``randomSplit``, whose assignment depends on
partition layout), and (c) join-free.  The split hashes the id with md5
and compares the fixed-length lowercase hex against precomputed thresholds
— hex strings of equal length order lexicographically exactly like the
underlying 128-bit integers, so the comparison is a uniform [0, 1) draw
that any engine with md5 reproduces bit-for-bit (DuckDB-oracled).

``stratified_sample`` wraps ``sampleBy`` for per-stratum rates (dataset
mixing / rebalancing); seeded and Spark-deterministic, but engine-specific
— unit-tested rather than oracled.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_HEX_SPACE = 16 ** 8  # compare on the first 8 hex chars (32 bits: plenty)


def _threshold(cum_fraction: float) -> str:
    """Cumulative fraction -> 8-char lower-hex threshold string."""
    return format(min(int(cum_fraction * _HEX_SPACE), _HEX_SPACE - 1), "08x")


def split_thresholds(weights: dict[str, float]) -> list[tuple[str, str]]:
    """(split_name, upper_threshold_hex) pairs in declaration order,
    normalized so the weights sum to 1."""
    total = sum(weights.values())
    out = []
    cum = 0.0
    for name, w in weights.items():
        cum += w / total
        out.append((name, _threshold(cum)))
    return out


def hash_split_col(
    id_col: Column | str,
    weights: dict[str, float],
    salt: str = "",
) -> Column:
    """The split-assignment expression: md5(salt + id) bucketed by the
    cumulative weight thresholds.  ``salt`` derives independent splits from
    the same ids (e.g. per-epoch holdouts)."""
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    h = F.substring(F.md5(F.concat(F.lit(salt), c.cast("string"))), 1, 8)
    pairs = split_thresholds(weights)
    # thresholds are cumulative: evaluate smallest-first; the last split
    # catches the rounding tail
    expr = None
    for name, upper in pairs[:-1]:
        cond = h < F.lit(upper)
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
    if expr is None:
        return F.lit(pairs[-1][0])
    return expr.otherwise(F.lit(pairs[-1][0]))


def hash_split(
    df: DataFrame,
    id_col: str,
    weights: dict[str, float] | None = None,
    salt: str = "",
    split_col: str = "split",
) -> DataFrame:
    """Attach a deterministic split column (default 90/5/5 train/val/test)."""
    weights = weights or {"train": 0.9, "val": 0.05, "test": 0.05}
    return df.withColumn(split_col, hash_split_col(id_col, weights, salt))


def stratified_sample(
    df: DataFrame,
    stratum_col: str,
    fractions: dict,
    seed: int = 42,
) -> DataFrame:
    """Per-stratum Bernoulli sampling (dataset mixing: e.g. downsample one
    source, keep another whole).  Seeded => reproducible within Spark;
    assignment is per-row hash-based, so it survives repartitioning."""
    return df.sampleBy(stratum_col, fractions, seed)
