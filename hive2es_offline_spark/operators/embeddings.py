"""Embedding-matrix analytics: distributed moments, PCA fit/transform,
whitening, L2 normalization.

The classic two-phase shape for covariance-based methods at scale: the
cluster computes the d×d second-moment matrix in ONE pass (per-batch numpy
``X.T @ X`` partials over Arrow batches, pre-combined JVM-side through a
map-side-combinable SUM so the driver transfer is O(d²) scalars — INDEPENDENT
of partition count), the driver does the O(d³) eigendecomposition (d is
embedding width, 64–4096: trivial), and the projection back over the corpus
is another narrow pass with the component matrix shipped in the UDF closure.
The moments pass is map-only + one tiny d²-row aggregate exchange.

This is how Spark MLlib's own PCA works internally (RowMatrix Gramian +
local eigen); re-implemented here over the DataFrame/Arrow path so it works
on a plain ``array<float>`` column without RDD/Vector conversions, and so
whitening and reduced-rank re-expansion compose with the rest of the
pipeline (quantization, ANN, dedup).
"""

from __future__ import annotations

import math
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _moment_flat(partials: DataFrame) -> DataFrame:
    """JVM pre-combine of per-partition flat moment vectors — the un-keyed
    case of ``util.explode_sum``: exactly one row per vector position
    regardless of how many partitions contributed.  Stays flat (no array
    reassembly) deliberately: at large d the d²+d+2 scalars spread over the
    reduce side instead of one reassembly buffer."""
    from .util import explode_sum

    return explode_sum(partials)


def embedding_moments(df: DataFrame, vec_col: str = "embedding") -> dict:
    """One corpus pass -> exact (n, mean[d], cov[d,d]) of the embedding
    column.  Rows with NULL vectors are skipped; all arithmetic in float64.

    Each partition emits ONE partial row holding the flat vector
    ``[n, d, sum_0..sum_{d-1}, gram_00..gram_{d-1,d-1}]``; the partials are
    then pre-combined JVM-SIDE — ``posexplode`` to (pos, x) scalars, SUM per
    pos (map-side partial aggregation, so each shuffle-map task emits at
    most d²+d+2 rows) — and the driver collects exactly d²+d+2 scalar rows
    regardless of partition count.  The old shape collected one d²-array
    row per partition (≈4.7 MB each at d=768: a driver OOM at 10^5+
    partitions); this one is O(d²) flat."""

    def partials(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        n = 0
        s = None
        ss = None
        for pdf in batches:
            vecs = [v for v in pdf[vec_col] if v is not None]
            if not vecs:
                continue
            x = np.asarray([np.asarray(v, dtype=np.float64) for v in vecs])
            n += x.shape[0]
            s = x.sum(axis=0) if s is None else s + x.sum(axis=0)
            g = x.T @ x
            ss = g if ss is None else ss + g
        if n:
            d = s.shape[0]
            m = np.concatenate(([float(n), float(d)], s, ss.ravel()))
            yield pd.DataFrame({"m": [m.tolist()]})

    flat = _moment_flat(
        df.select(vec_col).mapInPandas(partials, "m array<double>")
    ).collect()  # exactly d^2 + d + 2 scalar rows, partition-independent
    if not flat:
        raise ValueError(f"no non-null vectors in column {vec_col!r}")
    vals = np.zeros(len(flat), dtype=np.float64)
    for r in flat:
        vals[r["_p"]] = r["_x"]
    # element 0 summed across partials gives total n; d comes from the
    # row-count identity len = d^2 + d + 2 (element 1 is d x #partials,
    # kept only as a consistency sentinel)
    d = int(round(math.sqrt(len(flat) - 1.75) - 0.5))
    n = int(round(vals[0]))
    s = vals[2 : 2 + d]
    ss = vals[2 + d :]
    mean = s / n
    # unbiased covariance from raw second moments
    cov = (ss.reshape(d, d) - n * np.outer(mean, mean)) / max(n - 1, 1)
    return {"n": int(n), "mean": mean, "cov": cov}


def pca_fit(
    df: DataFrame,
    vec_col: str = "embedding",
    k: int = 16,
) -> dict:
    """Fit a k-component PCA: distributed moments + driver eigh.

    Components are sign-normalized (largest-magnitude coordinate positive)
    so the fit is deterministic.  Returns mean[d], components[k,d]
    (rows = principal axes, descending variance), explained_variance[k],
    and explained_ratio[k]."""
    m = embedding_moments(df, vec_col)
    evals, evecs = np.linalg.eigh(m["cov"])  # ascending
    order = np.argsort(evals)[::-1][:k]
    comps = evecs[:, order].T  # (k, d)
    for i in range(comps.shape[0]):
        j = int(np.argmax(np.abs(comps[i])))
        if comps[i, j] < 0:
            comps[i] = -comps[i]
    ev = np.maximum(evals[order], 0.0)
    total = float(np.sum(np.maximum(evals, 0.0))) or 1.0
    return {
        "n": m["n"],
        "mean": m["mean"],
        "components": comps,
        "explained_variance": ev,
        "explained_ratio": ev / total,
    }


def pca_transform(
    df: DataFrame,
    model: dict,
    vec_col: str = "embedding",
    out_col: str = "pca",
    whiten: bool = False,
    eps: float = 1e-12,
) -> DataFrame:
    """Project the corpus onto the fitted components (map-only pass).

    The (k, d) component matrix and mean ride in the pandas-UDF closure
    (pickled once per executor, broadcast-equivalent); each Arrow batch is
    one numpy matmul.  ``whiten=True`` scales scores to unit variance —
    what cosine-based downstream steps (ANN, near-dup) usually want after
    reduction."""
    mean = np.asarray(model["mean"], dtype=np.float64)
    comps = np.asarray(model["components"], dtype=np.float64)
    scale = (
        1.0 / np.sqrt(np.asarray(model["explained_variance"]) + eps)
        if whiten
        else None
    )

    @F.pandas_udf("array<double>")
    def project(v: pd.Series) -> pd.Series:
        # NULL vectors project to NULL (pca_fit skips them, so a model fit
        # on a corpus must be applicable to that same corpus)
        # element-wise None test (Series.notna is ambiguous for array cells)
        mask = np.fromiter((e is not None for e in v), dtype=bool, count=len(v))
        out = np.empty(len(v), dtype=object)
        if mask.any():
            x = np.asarray([np.asarray(e, dtype=np.float64) for e in v[mask]])
            y = (x - mean) @ comps.T
            if scale is not None:
                y = y * scale
            for idx, row in zip(np.nonzero(mask)[0], y):
                out[idx] = row
        return pd.Series(out)

    return df.withColumn(out_col, project(F.col(vec_col)))


def l2_normalize(vec: Column | str, eps: float = 0.0) -> Column:
    """Unit-norm an array column JVM-side (codegen, no Python): zero/near-zero
    vectors pass through unchanged rather than dividing by ~0."""
    c = F.col(vec) if isinstance(vec, str) else vec
    dd = F.aggregate(
        F.transform(c, lambda x: x.cast("double") * x.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    nrm = F.sqrt(dd)
    return F.when(nrm <= F.lit(eps), c.cast("array<double>")).otherwise(
        F.transform(c, lambda x: x.cast("double") / nrm)
    )
