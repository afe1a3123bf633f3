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
