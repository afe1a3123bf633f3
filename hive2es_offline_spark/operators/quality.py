"""Zero-extra-pass data-quality gates via ``df.observe``.

A pipeline that validates its stages the naive way (``count()`` here, a
null-rate aggregate there) re-scans the corpus once per check — at 100 TB
every validation pass is hours.  ``observe`` attaches aggregate metrics to
the EXISTING action: the metrics are computed by accumulators riding the
same tasks that produce the output, so a gated write costs exactly one
pass, metrics included.

The reference validates its output by re-reading what it wrote (bundle
manifest counts, ``ESContainer.scala:116,128`` partition counters); this is
the generalization: declarative row-count / null-rate / bound checks
evaluated as a side effect of the normal write.

Usage::

    gated, check = quality_gate(
        docs, "post_scrub",
        min_rows=1,
        max_null_frac={"text": 0.0, "lang": 0.05},
        bounds={"n_chars": (1, 1_000_000)},
    )
    gated.write.parquet(out)       # the one and only corpus pass
    check()                        # raises GateViolation with details

``check(strict=False)`` returns the violation list instead of raising.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F


class GateViolation(AssertionError):
    """One or more quality-gate checks failed; ``.violations`` holds
    (check, observed, limit) triples."""

    def __init__(self, name: str, violations: list[tuple[str, float, float]]):
        self.violations = violations
        lines = ", ".join(f"{c}: observed {o!r} vs limit {l!r}" for c, o, l in violations)
        super().__init__(f"quality gate {name!r} failed — {lines}")


def quality_gate(
    df: DataFrame,
    name: str,
    min_rows: int | None = None,
    max_rows: int | None = None,
    max_null_frac: dict[str, float] | None = None,
    bounds: dict[str, tuple[float | None, float | None]] | None = None,
):
    """Attach gate metrics to ``df``; returns ``(gated_df, check)``.

    ``check()`` must be called AFTER an action has run on the gated frame
    (``Observation.get`` blocks until the metrics exist).  Checks:

    * ``min_rows`` / ``max_rows`` — output row-count window
    * ``max_null_frac[col]`` — max fraction of NULLs per column
    * ``bounds[col] = (lo, hi)`` — observed min/max of a numeric column must
      stay inside (either end may be None)
    """
    max_null_frac = max_null_frac or {}
    bounds = bounds or {}
    metrics = [F.count(F.lit(1)).alias("_rows")]
    for c in max_null_frac:
        metrics.append(
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).alias(f"_nulls_{c}")
        )
    for c in bounds:
        metrics.append(F.min(F.col(c)).alias(f"_min_{c}"))
        metrics.append(F.max(F.col(c)).alias(f"_max_{c}"))
    obs = Observation(name)
    gated = df.observe(obs, *metrics)

    def check(strict: bool = True) -> list[tuple[str, float, float]]:
        got = obs.get
        rows = got["_rows"]
        bad: list[tuple[str, float, float]] = []
        if min_rows is not None and rows < min_rows:
            bad.append(("min_rows", rows, min_rows))
        if max_rows is not None and rows > max_rows:
            bad.append(("max_rows", rows, max_rows))
        for c, frac in max_null_frac.items():
            observed = (got[f"_nulls_{c}"] or 0) / rows if rows else 0.0
            if observed > frac:
                bad.append((f"null_frac[{c}]", observed, frac))
        for c, (lo, hi) in bounds.items():
            mn, mx = got[f"_min_{c}"], got[f"_max_{c}"]
            if lo is not None and mn is not None and mn < lo:
                bad.append((f"min[{c}]", mn, lo))
            if hi is not None and mx is not None and mx > hi:
                bad.append((f"max[{c}]", mx, hi))
        if bad and strict:
            raise GateViolation(name, bad)
        return bad

    return gated, check


def column_drift(
    df_old: DataFrame,
    df_new: DataFrame,
    col: str,
    bins: int = 10,
    eps: float = 1e-6,
) -> DataFrame:
    """Population Stability Index between two corpus versions for a numeric
    column — the standard drift monitor ("did yesterday's re-crawl shift
    the length/quality distribution?").  Returns one row per bin:
    ``(bin, n_old, n_new, p_old, p_new, psi_term)``; total PSI is the sum
    of ``psi_term`` (rule of thumb: < 0.1 stable, 0.1-0.25 moderate shift,
    > 0.25 investigate).

    Bin edges are equi-width over the OLD frame's [min, max] (the reference
    distribution defines the grid — standard PSI practice); new values
    outside the old range clamp into the edge bins, NULLs land in bin -1.
    Both binnings are single JVM-codegen aggregations (one exchange each,
    map-side combined), the per-bin join is ``bins + 2`` rows — cost at
    100 TB is two column scans, nothing more.  ``eps`` floors the ratios so
    an empty bin contributes a finite term (the textbook smoothing)."""
    if bins < 1:
        raise ValueError(f"bins must be >= 1, got {bins}")
    stats = df_old.agg(
        F.min(F.col(col).cast("double")).alias("lo"),
        F.max(F.col(col).cast("double")).alias("hi"),
    ).first()
    lo, hi = stats["lo"], stats["hi"]
    if lo is None or hi is None or hi <= lo:
        # degenerate reference (constant / all-NULL): one bin catches all
        lo, hi = (lo or 0.0), (lo or 0.0) + 1.0

    def binned(df: DataFrame, out: str) -> DataFrame:
        x = F.col(col).cast("double")
        b = F.least(
            F.greatest(
                F.floor((x - F.lit(lo)) / F.lit(hi - lo) * bins), F.lit(0)
            ),
            F.lit(bins - 1),
        ).cast("int")
        return (
            df.select(F.when(x.isNull(), F.lit(-1)).otherwise(b).alias("bin"))
            .groupBy("bin")
            .agg(F.count(F.lit(1)).alias(out))
        )

    o = binned(df_old, "n_old")
    n = binned(df_new, "n_new")
    joined = o.join(n, "bin", "full_outer").select(
        "bin",
        F.coalesce("n_old", F.lit(0)).alias("n_old"),
        F.coalesce("n_new", F.lit(0)).alias("n_new"),
    )
    from pyspark.sql.window import Window

    # global-total window over <= bins+2 rows: no scalable-shuffle concern
    w = Window.partitionBy()
    p_old = F.col("n_old") / F.sum("n_old").over(w)
    p_new = F.col("n_new") / F.sum("n_new").over(w)
    return joined.select(
        "bin",
        "n_old",
        "n_new",
        F.round(p_old, 6).alias("p_old"),
        F.round(p_new, 6).alias("p_new"),
        F.round(
            (p_new - p_old) * F.log((p_new + F.lit(eps)) / (p_old + F.lit(eps))),
            6,
        ).alias("psi_term"),
    )


def ks_drift(
    df_old: DataFrame,
    df_new: DataFrame,
    col: str,
    precision: int | None = None,
) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov drift statistic for a numeric
    column — the distribution-shape complement to ``column_drift``'s
    binned PSI: ``D = sup_x |F_old(x) - F_new(x)|``, EXACT over the
    column's distinct values.  Returns ONE row
    ``(n_old, n_new, ks, at_value)`` with ``at_value`` the smallest
    value achieving the supremum (deterministic tie-break).

    Scale shape (100 TB): ONE union+groupBy shuffle reduces BOTH samples
    to per-distinct-value counts — the corpus never sorts.  The
    cumulative pass is an ordered window over the DISTINCT VALUES only,
    so its single-partition state is bounded by column CARDINALITY, not
    corpus size (the n_chars/score/ratio columns this monitors have
    small cardinality by construction).  For continuous high-cardinality
    columns pass ``precision`` to round values first — the same
    accuracy/memory knob convention as percentiles' tdigest mode; the
    statistic is then exact for the rounded distribution.  Totals come
    from one 1-row broadcast aggregate; the argmax is a
    TakeOrderedAndProject."""
    from pyspark.sql.window import Window

    v = F.col(col).cast("double")
    if precision is not None:
        v = F.round(v, precision)
    a = df_old.select(v.alias("_v")).where(F.col("_v").isNotNull()) \
        .withColumn("_s", F.lit(1))
    b = df_new.select(v.alias("_v")).where(F.col("_v").isNotNull()) \
        .withColumn("_s", F.lit(2))
    counts = (
        a.unionByName(b)
        .groupBy("_v")
        .agg(
            F.sum((F.col("_s") == 1).cast("long")).alias("_a"),
            F.sum((F.col("_s") == 2).cast("long")).alias("_b"),
        )
    )
    totals = counts.agg(
        F.sum("_a").alias("_n"), F.sum("_b").alias("_m"))
    w = Window.orderBy("_v").rowsBetween(
        Window.unboundedPreceding, Window.currentRow)
    cum = counts.select(
        "_v",
        F.sum("_a").over(w).alias("_ca"),
        F.sum("_b").over(w).alias("_cb"),
    )
    d = F.abs(
        F.col("_ca").cast("double") / F.col("_n")
        - F.col("_cb").cast("double") / F.col("_m")
    )
    return (
        cum.crossJoin(F.broadcast(totals))
        .select(
            F.col("_n").alias("n_old"),
            F.col("_m").alias("n_new"),
            d.alias("_d"),
            F.col("_v").alias("at_value"),
        )
        .orderBy(F.col("_d").desc(), F.col("at_value").asc())
        .limit(1)
        .select("n_old", "n_new", F.round(F.col("_d"), 6).alias("ks"),
                "at_value")
    )
