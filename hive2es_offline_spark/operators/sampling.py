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

from pyspark.sql import Column, DataFrame, Window
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


def mix_rates(counts: dict, targets: dict) -> dict:
    """Per-stratum keep rates that reshape ``counts`` into the ``targets``
    mix while keeping as much data as possible: the binding stratum (the
    one that runs out first relative to its target share) keeps rate 1.0
    and every other stratum downsamples to match.

    ``targets`` are normalized to proportions; strata absent from
    ``targets`` get no rate (dropped by ``source_mix``).  Pure driver-side
    arithmetic on the (tiny) per-stratum count table."""
    total = sum(targets.values())
    p = {s: w / total for s, w in targets.items() if w > 0}
    present = [s for s in p if s in counts]
    if not present:
        return {}
    t = min(counts[s] / p[s] for s in present)
    return {s: min((t * p[s]) / counts[s], 1.0) for s in present}


def temperature_targets(counts: dict, temperature: float = 1.0) -> dict:
    """Target mixture proportions from corpus sizes via temperature scaling
    — the public multilingual/multi-corpus mixing rule (T5 / mT5 / PaLM):
    ``p_s ∝ n_s^(1/T)``.  T=1 reproduces natural proportions; T>1 flattens
    the mix toward uniform (up-weighting small sources — the usual choice,
    e.g. T=3.33 in mT5); T→∞ is uniform.  Compose with :func:`mix_rates` /
    :func:`source_mix`: ``source_mix(df, col, temperature_targets(counts,
    T), id)``.  Pure driver arithmetic on the per-stratum count table."""
    if temperature <= 0:
        raise ValueError(f"temperature must be > 0, got {temperature}")
    # sorted-key order so the float summation (non-associative) is
    # deterministic regardless of the caller's dict/collect order — the
    # proportions become plan literals, so run-to-run ulp drift would
    # otherwise flip boundary rows
    powed = {
        s: float(n) ** (1.0 / temperature)
        for s, n in sorted(counts.items())
        if n > 0
    }
    z = sum(powed.values())
    return {s: v / z for s, v in powed.items()}


def source_mix(
    df: DataFrame,
    stratum_col: str,
    targets: dict,
    id_col: str,
    salt: str = "",
) -> DataFrame:
    """Deterministic proportional resampling to a target source mix — the
    dataset-mixing step of a training pipeline ("50% web, 30% wiki, 20%
    books"), maximizing retained data (largest output with the exact mix).

    One tiny aggregate (``groupBy(stratum).count`` — map-side combined,
    one row per stratum; the collect is bounded by stratum cardinality,
    same class as the reference's per-field metadata lookup), then a pure
    hash-threshold filter: keep iff ``md5(salt + id)[:8] < hex(rate)``.
    The assignment is a deterministic function of the row id — stable
    under repartitioning/retries, reproducible in any engine with md5
    (DuckDB-oracled), and join-free: rates enter the plan as literals, so
    the corpus pass is a narrow filter with NO shuffle.  Strata not in
    ``targets`` are dropped."""
    counts = {
        r[stratum_col]: r["_n"]
        for r in df.groupBy(stratum_col).agg(F.count(F.lit(1)).alias("_n")).collect()
    }
    rates = mix_rates(counts, targets)
    if not rates:
        return df.where(F.lit(False))
    h = F.substring(F.md5(F.concat(F.lit(salt), F.col(id_col).cast("string"))), 1, 8)
    keep = None
    for s, rate in rates.items():
        # rate 1.0 keeps ALL rows of the stratum: a `h < "ffffffff"` compare
        # would drop the 1-in-2^32 hash at the top of the space
        cond = (F.col(stratum_col) == s) & (
            F.lit(True) if rate >= 1.0 else h < F.lit(_threshold(rate))
        )
        keep = cond if keep is None else keep | cond
    return df.where(keep)


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


def cap_per_group(
    df: DataFrame,
    group_col: str,
    order_cols: list,
    n: int,
    rank_col: str | None = None,
) -> DataFrame:
    """Keep at most ``n`` rows per group, best-first — the per-domain cap of
    a web-crawl curation pipeline ("at most 1000 docs per host, highest
    quality first"; the reference has no grouped operators at all, so this
    is north-star surface like topk_grouped in ``relational.py``).

    ``order_cols`` defines "best" and MUST be a total order (add the row id
    as the last key) or the kept set is nondeterministic under retries.

    One shuffle on ``group_col``, then ``row_number`` — the same two-phase
    shape as ``topk_grouped``: Spark plans a partial per-partition top-n
    under the window when the filter is ``row_number <= n`` (WindowGroupLimit
    pushdown), so a hot domain does NOT pull its full row set through the
    exchange, only n rows per upstream partition.  ``rank_col`` optionally
    exposes the rank in the output (dropped by default).
    """
    w = Window.partitionBy(group_col).orderBy(*order_cols)
    rc = rank_col or "_rn"
    out = df.withColumn(rc, F.row_number().over(w)).where(F.col(rc) <= n)
    return out if rank_col else out.drop(rc)


def quantile_filter(
    df: DataFrame,
    score_col: str,
    keep_frac: float,
    exact: bool = False,
    accuracy: int = 10_000,
) -> DataFrame:
    """Keep the best ``keep_frac`` fraction of rows by ``score_col`` (the
    "top 20% by quality score" cut of a curation pipeline): one tiny
    aggregate computes the (1 - keep_frac) percentile threshold, then the
    corpus pass is a narrow filter with the threshold as a plan literal —
    no join, no second shuffle.

    ``exact=False`` (default) uses ``approx_percentile`` — a mergeable
    sketch, map-side combined, the only sane choice at corpus scale;
    ``accuracy`` trades sketch size for error (~1/accuracy quantile error).
    ``exact=True`` uses ``percentile`` (exact sort-based interpolation,
    engine-portable semantics — DuckDB's ``quantile_cont``) for oracle
    parity and small inputs.  Rows >= threshold are kept, so marginally
    MORE than ``keep_frac`` survives under score ties — a deterministic
    superset, never a lossy undercut."""
    if not 0.0 < keep_frac <= 1.0:
        raise ValueError(f"keep_frac must be in (0, 1], got {keep_frac}")
    p = 1.0 - keep_frac
    # Column API, not f-string SQL: survives column names needing backticks
    # (dots/spaces/hyphens) and matches the Column style used everywhere else
    agg = (
        F.percentile(F.col(score_col), F.lit(p))
        if exact
        else F.percentile_approx(F.col(score_col), F.lit(p), F.lit(accuracy))
    )
    thr = df.select(agg.alias("t")).first()["t"]
    if thr is None:  # empty input or all-NULL scores
        return df.where(F.lit(False))
    return df.where(F.col(score_col) >= F.lit(thr))


def epoch_shuffle_key(id_col: Column | str, epoch: int = 0) -> Column:
    """Deterministic per-epoch shuffle key: md5(epoch || id).  A pure
    function of (epoch, id): reproducible across runs/engines, stable
    under repartition/retries, and a fresh independent permutation per
    epoch — the training-order shuffle without a stored permutation
    table."""
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    return F.md5(F.concat(F.lit(f"epoch{epoch}:"), c.cast("string")))


def epoch_shuffle(
    df: DataFrame,
    id_col: str,
    epoch: int = 0,
    key_col: str = "shuffle_key",
) -> DataFrame:
    """Attach the epoch-shuffle key.  To materialize a globally shuffled
    corpus for a sequential trainer, range-write on the key::

        epoch_shuffle(df, "doc_id", epoch) \\
            .repartitionByRange(n, "shuffle_key") \\
            .sortWithinPartitions("shuffle_key") \\
            .write.parquet(out)

    — shard i then holds keys entirely before shard i+1 (one range
    exchange; reading shards in name order streams the full permutation).
    """
    return df.withColumn(key_col, epoch_shuffle_key(id_col, epoch))
