"""Model-based text quality classification (round 13).

The heuristic quality scorers (operators/quality.py — length/punct/
stopword ratios) catch the obvious junk; production curation pipelines
additionally run a LEARNED filter (the fastText-style linear classifier
of the CCNet/GPT-3 lineage: bag-of-tokens features, logistic output).
This module provides both halves Spark-first:

- ``score_linear``: score = sigmoid(bias + Σ w[token]) over the
  ANALYZED token stream.  Two execution shapes, chosen by vocabulary
  size:

  * ``method="map"`` (default, vocab ≤ ``_MAP_LITERAL_MAX``): the
    weight table compiles to ONE plan-literal map and the score is a
    codegen ``aggregate(tokens, acc + w[token])`` — zero shuffle, zero
    UDF, the whole filter rides the scan.  The literal is part of the
    plan (broadcast with it), so this is the 100 TB shape for the
    vocabularies these filters actually use (10³–10⁴ terms).
  * ``method="join"``: tokens explode once, broadcast-join the weight
    frame, ONE groupBy(id) sums decimal-routed contributions — for
    vocabularies too large to inline.  Same math, one bounded shuffle
    of (id, weight) pairs.

  Out-of-vocabulary tokens contribute 0 (the fastText convention for
  an unk-less bag model).  Weight sums are decimal-routed in BOTH
  shapes, so the score is partition-order exact and an ANSI oracle can
  replay it hash-identically.

- ``train_logreg``: bounded-iteration batch gradient descent for
  logistic regression over the same features.  Each iteration is ONE
  aggregation pass (explode → per-token decimal gradient sums) driven
  from the driver with the current weights as plan literals — K
  iterations = K passes, no per-row Python.  Deterministic by
  construction: gradients are exact decimal sums (partition order
  cannot flip low bits) and the init is zeros, so the same data +
  hyperparameters give bit-identical weights on every run/retry.
  This is a curation-filter trainer (thousands of labeled docs, small
  vocab), not a deep-learning replacement — document-scale inference
  is where the 100 TB goes, and that path is the codegen scorer above.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, functions as F

from ..plans.analysis import analyze_col

__all__ = ["score_linear", "train_logreg"]

#: above this, a plan-literal map would bloat the plan/codegen — the
#: broadcast-join shape takes over
_MAP_LITERAL_MAX = 65_536


def _weight_lookup(weights: dict[str, float]) -> Column:
    ks = list(weights)
    return F.map_from_arrays(
        F.lit(ks), F.lit([float(weights[k]) for k in ks]))


def _sigmoid_col(total: Column, bias: float) -> Column:
    """One rounding/formula site for BOTH score_linear shapes — a
    change to one must reach the other (code-review r13)."""
    return F.round(
        F.lit(1.0) / (F.lit(1.0) + F.exp(-(F.lit(float(bias)) + total))), 6)


def _weighted_fold(toks: Column, wmap: Column) -> Column:
    """Decimal-routed Σ w[token] over a token array; NULL text folds
    like the empty document (sigmoid(bias)) so the map and join shapes
    agree — analyze_col propagates NULL and an unguarded aggregate
    would turn it into a NULL score (code-review r13, verified)."""
    return F.aggregate(
        F.coalesce(toks, F.array().cast("array<string>")),
        F.lit(0).cast("decimal(28,6)"),
        lambda acc, t: (acc + F.coalesce(
            wmap[t], F.lit(0.0)).cast("decimal(28,6)"))
        .cast("decimal(28,6)"),
    ).cast("double")


def score_linear(
    df: DataFrame,
    text_col: str,
    weights: dict[str, float],
    bias: float = 0.0,
    *,
    id_field: str | None = None,
    analyzer: str | None = None,
    out: str = "score",
    method: str | None = None,
) -> DataFrame:
    """Append ``out`` = sigmoid(bias + Σ weights[token]) per document.

    ``method`` defaults to "map" for vocabularies ≤ 65 536 entries and
    "join" beyond; pass it explicitly to pin a shape.  The "join" shape
    needs ``id_field`` (a unique document id) to reassemble scores."""
    if not weights:
        raise ValueError("score_linear needs a non-empty weight table")
    if method is None:
        method = "map" if len(weights) <= _MAP_LITERAL_MAX else "join"
    if method not in ("map", "join"):
        raise ValueError(f"unsupported method: {method!r} (map | join)")
    toks = analyze_col(text_col, analyzer)
    if method == "map":
        total = _weighted_fold(toks, _weight_lookup(weights))
        return df.withColumn(out, _sigmoid_col(total, bias))
    if id_field is None:
        raise ValueError("score_linear(method='join') needs id_field")
    spark = df.sparkSession
    wdf = spark.createDataFrame(
        [(k, float(v)) for k, v in weights.items()], "_tok string, _w double")
    tok_rows = df.select(F.col(id_field).alias("_sid"),
                         F.explode(toks).alias("_tok"))
    sums = (
        tok_rows.join(F.broadcast(wdf), "_tok")
        .groupBy("_sid")
        .agg(F.sum(F.col("_w").cast("decimal(28,6)")).cast("double")
             .alias("_wsum"))
    )
    joined = df.join(sums, df[id_field] == sums["_sid"], "left").drop("_sid")
    total = F.coalesce(F.col("_wsum"), F.lit(0.0))
    return joined.withColumn(out, _sigmoid_col(total, bias)).drop("_wsum")


def train_logreg(
    df: DataFrame,
    text_col: str,
    label_col: str,
    *,
    vocab_size: int = 2048,
    iters: int = 20,
    lr: float = 0.5,
    analyzer: str | None = None,
) -> tuple[dict[str, float], float]:
    """Batch gradient descent for logistic regression over bag-of-token
    counts; returns ``(weights, bias)`` for ``score_linear``.

    Vocabulary: the ``vocab_size`` most document-frequent tokens
    (count desc, token asc — deterministic), capped at the map-literal
    bound.  Each iteration runs ONE aggregation job: per-token gradient
    sums via explode + groupBy with exact decimal accumulation, with a
    sentinel token carrying the bias gradient — the returned
    weights are bit-identical across runs and partitionings.  Labels
    must be 0/1.  ``iters`` bounds the driver loop; this is the
    small-supervision curation-trainer shape (the 100 TB pass is the
    scorer, not the trainer)."""
    if iters < 1 or vocab_size < 1:
        raise ValueError("train_logreg needs iters >= 1 and vocab_size >= 1")
    if vocab_size > _MAP_LITERAL_MAX:
        # every iteration embeds the vocabulary as a plan literal —
        # past the map-literal bound that is exactly the codegen bloat
        # score_linear's join shape exists to avoid (code-review r13);
        # train larger models offline and hand the weights to
        # score_linear(method="join")
        raise ValueError(
            f"train_logreg vocab_size is capped at {_MAP_LITERAL_MAX} "
            "(the plan-literal trainer shape)")
    toks = analyze_col(text_col, analyzer)
    y = F.col(label_col).cast("double")
    # NULL text folds as the empty document EVERYWHERE (z, gradients,
    # doc count) — coalesced once here so the passes cannot disagree
    base = df.select(
        y.alias("_y"),
        F.coalesce(toks, F.array().cast("array<string>")).alias("_toks"),
    ).localCheckpoint()
    n = base.count()
    if n == 0:
        raise ValueError("train_logreg needs a non-empty frame")
    vocab_rows = (
        base.select(F.explode(F.array_distinct("_toks")).alias("_tok"))
        .groupBy("_tok").count()
        .orderBy(F.col("count").desc(), F.col("_tok").asc())
        .limit(int(vocab_size))
        .collect()
    )
    vocab = [r["_tok"] for r in vocab_rows]
    vset = set(vocab)
    weights = {t: 0.0 for t in vocab}
    bias = 0.0
    # the sentinel rides the exploded stream so the bias gradient and
    # every per-token gradient come out of ONE aggregation job per
    # iteration (code-review r13: a separate bias pass recomputed the
    # sigmoid over the whole frame a second time); "\x00" cannot be
    # emitted by any tokenizer, so it cannot collide with a real token
    sent = "\x00bias"
    for _ in range(int(iters)):
        wmap = _weight_lookup(weights)
        z = F.lit(bias) + _weighted_fold(F.col("_toks"), wmap)
        p = F.lit(1.0) / (F.lit(1.0) + F.exp(-z))
        # error rounds to 9 decimals BEFORE the decimal-routed sums so
        # the per-token gradient is an exact sum of exact terms
        err = F.round(p - F.col("_y"), 9).cast("decimal(19,9)")
        rows = base.select(
            err.alias("_err"),
            F.explode(F.concat(F.array(F.lit(sent)), F.col("_toks")))
            .alias("_tok"))
        grad_rows = (
            # in-vocab membership reuses the plan-literal weight map
            # instead of a second vocab-sized In-list
            rows.where((F.col("_tok") == sent)
                       | wmap[F.col("_tok")].isNotNull())
            .groupBy("_tok")
            .agg(F.sum(F.col("_err").cast("decimal(38,9)")).cast("double")
                 .alias("_g"))
            .collect()
        )
        grads = {r["_tok"]: r["_g"] for r in grad_rows}
        bias_g = grads.pop(sent, 0.0) or 0.0
        for t in vset:
            weights[t] -= lr * grads.get(t, 0.0) / n
        bias -= lr * bias_g / n
    # round for stable hand-off to plan literals / oracles
    return ({t: round(w, 9) for t, w in weights.items()},
            round(bias, 9))


def sigmoid(x: float) -> float:
    """Python twin for tests/goldens."""
    return 1.0 / (1.0 + math.exp(-x))
