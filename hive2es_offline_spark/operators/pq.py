"""Product quantization (PQ) for embedding compression + ANN search.

The memory math that makes billion-vector ANN possible (public recipe:
Jégou et al., "Product Quantization for Nearest Neighbor Search", IEEE
TPAMI 2011 — the FAISS IVF+PQ building block): split each d-dim vector
into ``m`` subspaces, k-means each subspace to 2^bits centroids, store a
vector as ``m`` uint8 codes — 64-dim float32 (256 B) becomes 8 B at
m=8/bits=8, a 32x reduction that turns a 100 TB embedding corpus into
~3 TB of codes.

Spark-first shapes:

* **train** — per-subspace Lloyd on a driver-side SAMPLE (bounded:
  ``sample_size`` × d floats; FAISS trains on samples too).  Codebooks are
  tiny (m × 256 × d/m floats) plan-side artifacts: persist them next to
  the codes, like the IVF centroids.
* **encode** — one ``mapInPandas`` pass: each Arrow batch argmins against
  each subspace codebook as a single numpy matmul.  Map-only, no shuffle.
* **search (ADC)** — asymmetric distance: the QUERY builds an m × 256
  lookup table driver-side; each row's score is ``m`` array lookups
  (``element_at`` on plan-literal LUT arrays) summed — pure JVM codegen
  over the codes column, no Python per row — then exact top-k via
  ``TakeOrderedAndProject``.  Vectors are L2-normalized at train/encode,
  so minimal L2 distance equals maximal cosine and ADC ranking matches
  the engine's cosine convention.

Compose with IVF (``similarity.ivf_assign``) for the full FAISS shape:
coarse cells prune the scan, PQ codes shrink what remains.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["pq_train", "opq_train", "pq_encode", "pq_search", "ivfpq_search"]


def _normalize(x: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(x, axis=1)
    norms[norms == 0] = 1.0
    return x / norms[:, None]


def _lloyd(x: np.ndarray, k: int, iters: int, rng: np.random.Generator) -> np.ndarray:
    """Plain numpy Lloyd (k-means) for one subspace sample.  Distances via
    the matmul identity (|x|² - 2x·c + |c|², one BLAS call) instead of an
    (n, k, d) broadcast — ~20x faster at n=10k, k=256; means via
    np.add.at scatter instead of a per-centroid mask loop."""
    k = min(k, len(x))
    cents = x[rng.choice(len(x), size=k, replace=False)].copy()
    for _ in range(iters):
        d = -2.0 * (x @ cents.T) + (cents**2).sum(axis=1)[None, :]
        assign = d.argmin(axis=1)
        sums = np.zeros_like(cents)
        np.add.at(sums, assign, x)
        counts = np.bincount(assign, minlength=k).astype(np.float64)
        nonzero = counts > 0
        cents[nonzero] = sums[nonzero] / counts[nonzero][:, None]
    return cents


def pq_train(
    df: DataFrame,
    num_subspaces: int = 8,
    bits: int = 8,
    sample_size: int = 10_000,
    iters: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
) -> list[list[list[float]]]:
    """Train PQ codebooks on a deterministic hash-ordered sample.

    Returns ``codebooks[m][c] = centroid`` (m = num_subspaces, c < 2^bits,
    centroid dim = d / m).  ``d`` must divide evenly by ``num_subspaces``.
    """
    rows = (
        df.select(vec_col)
        .orderBy(F.md5(F.col(id_col).cast("string")), F.col(id_col))
        .limit(sample_size)
        .collect()
    )
    x = _normalize(np.asarray([list(r[0]) for r in rows], dtype=np.float64))
    d = x.shape[1]
    if d % num_subspaces:
        raise ValueError(f"dim {d} not divisible by num_subspaces {num_subspaces}")
    sub = d // num_subspaces
    k = 1 << bits
    rng = np.random.default_rng(seed)
    books = []
    for mi in range(num_subspaces):
        cents = _lloyd(x[:, mi * sub : (mi + 1) * sub], k, iters, rng)
        books.append([[float(v) for v in c] for c in cents])
    return books


def pq_encode(
    df: DataFrame,
    codebooks: list[list[list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    rotation: list[list[float]] | None = None,
) -> DataFrame:
    """Vector -> ``m`` codes (smallint array), one numpy matmul per
    subspace per Arrow batch.  NULL/zero vectors encode against the zero
    vector (their codes are as meaningless as their cosines — compose with
    a quality filter upstream).  ``rotation`` (from :func:`opq_train`)
    applies the learned orthogonal rotation before quantizing — norms are
    preserved, so the cosine convention is unchanged."""
    books = [np.asarray(b, dtype=np.float64) for b in codebooks]
    r_mat = None if rotation is None else np.asarray(rotation, dtype=np.float64)
    sub = books[0].shape[1]
    m = len(books)

    def encode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            x = np.asarray([
                np.asarray(v, dtype=np.float64) if v is not None else np.zeros(m * sub)
                for v in pdf[vec_col]
            ])
            x = _normalize(x)
            if r_mat is not None:
                x = x @ r_mat
            codes = np.empty((len(x), m), dtype=np.int32)
            for mi, cb in enumerate(books):
                xs = x[:, mi * sub : (mi + 1) * sub]
                # |xs - c|^2 = |xs|^2 - 2 xs.c + |c|^2; |xs|^2 constant per row
                d = -2.0 * (xs @ cb.T) + (cb**2).sum(axis=1)[None, :]
                codes[:, mi] = d.argmin(axis=1)
            yield pd.DataFrame(
                {"_id": pdf[id_col], "codes": [list(map(int, c)) for c in codes]}
            )

    id_type = dict(df.dtypes)[id_col]
    return (
        df.select(id_col, vec_col)
        .mapInPandas(encode, f"_id {id_type}, codes array<int>")
        .withColumnRenamed("_id", id_col)
    )


def pq_search(
    codes_df: DataFrame,
    codebooks: list[list[list[float]]],
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    codes_col: str = "codes",
    rotation: list[list[float]] | None = None,
) -> DataFrame:
    """ADC top-k: the query's m x 256 distance LUT becomes plan-literal
    arrays; each row's distance is ``m`` ``element_at`` lookups summed —
    whole-stage codegen, no Python per row — then TakeOrderedAndProject.
    Returns (id, distance) ascending (smaller = closer; equals
    ``2 - 2 * cosine`` up to quantization error on normalized vectors)."""
    books = [np.asarray(b, dtype=np.float64) for b in codebooks]
    sub = books[0].shape[1]
    q = np.asarray(query_vec, dtype=np.float64)
    qn = np.linalg.norm(q)
    if qn > 0:
        q = q / qn
    if rotation is not None:
        q = q @ np.asarray(rotation, dtype=np.float64)
    luts = []
    for mi, cb in enumerate(books):
        qs = q[mi * sub : (mi + 1) * sub]
        luts.append(((cb - qs[None, :]) ** 2).sum(axis=1))
    dist = None
    for mi, lut in enumerate(luts):
        # F.lit(list) builds a true array Literal — F.array(lit, lit, ...)
        # is a per-row CreateArray that codegen re-materializes for every
        # row (measured 3x slower at m=16 over 200k rows)
        term = F.element_at(
            F.lit([float(v) for v in lut]),
            F.element_at(F.col(codes_col), mi + 1) + 1,
        )
        dist = term if dist is None else dist + term
    return (
        codes_df.select(id_col, F.round(dist, 6).alias("distance"))
        .orderBy(F.col("distance").asc(), F.col(id_col).asc())
        .limit(k)
    )


def ivfpq_search(
    codes_df: DataFrame,
    codebooks: list[list[list[float]]],
    centroids: list[list[float]],
    query_vec: list[float],
    k: int = 10,
    n_probe: int = 2,
    id_col: str = "vec_id",
    codes_col: str = "codes",
    cell_col: str = "_ivf_cell",
    rotation: list[list[float]] | None = None,
) -> DataFrame:
    """The full FAISS-shaped scale path — IVF coarse pruning + PQ ADC
    scoring: rank only the codes whose IVF cell is among the ``n_probe``
    cells nearest the query, with the same codegen LUT scoring as
    :func:`pq_search`.

    ``codes_df`` carries (id, codes, cell) — produce it ONCE per corpus
    version with ``similarity.ivf_assign`` + :func:`pq_encode` and persist
    it partitioned by the cell column, so the cell filter prunes FILES at
    scan time; the probed fraction of a 100 TB corpus then reads
    ~n_probe/len(centroids) of the data at 1/32 of the bytes.
    """
    qn = np.linalg.norm(query_vec) or 1.0
    sims = [
        (i, float(np.dot(query_vec, c)) / (qn * (np.linalg.norm(c) or 1.0)))
        for i, c in enumerate(np.asarray(centroids, dtype=np.float64))
    ]
    probe_cells = [i for i, _ in sorted(sims, key=lambda t: -t[1])[:n_probe]]
    pruned = codes_df.where(F.col(cell_col).isin(probe_cells))
    return pq_search(pruned, codebooks, query_vec, k, id_col, codes_col, rotation)


def opq_train(
    df: DataFrame,
    num_subspaces: int = 8,
    bits: int = 8,
    sample_size: int = 10_000,
    iters: int = 4,
    opq_iters: int = 6,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
) -> tuple[list[list[float]], list[list[list[float]]]]:
    """Optimized PQ (public recipe: Ge et al., "Optimized Product
    Quantization", CVPR 2013): learn an orthogonal rotation R that
    redistributes variance across subspaces before quantizing, closing
    most of plain PQ's recall gap on correlated/hard manifolds.

    Alternating minimization on the training sample: quantize the rotated
    sample, then solve the orthogonal Procrustes problem
    (R = U Vᵀ from SVD of Xᵀ X̂) for the rotation that best aligns data
    with its reconstruction.  Returns ``(rotation, codebooks)`` — pass
    both to :func:`pq_encode` / :func:`pq_search` via ``rotation=``.

    Honest caveat (measured, SCALE.md round 6): the best-iterate selection
    guarantees OPQ is never worse than plain PQ on the SAMPLE objective,
    but QUERY recall is data-dependent — on a hard synthetic manifold the
    rotation helped at m=8 and overfit at m=16.  Run a recall eval
    against :func:`~.similarity.cosine_topk` on your corpus before
    preferring the rotation.
    """
    rows = (
        df.select(vec_col)
        .orderBy(F.md5(F.col(id_col).cast("string")), F.col(id_col))
        .limit(sample_size)
        .collect()
    )
    x = _normalize(np.asarray([list(r[0]) for r in rows], dtype=np.float64))
    d = x.shape[1]
    if d % num_subspaces:
        raise ValueError(f"dim {d} not divisible by num_subspaces {num_subspaces}")
    sub = d // num_subspaces
    k = 1 << bits
    r_mat = np.eye(d)
    best: tuple[float, np.ndarray, list[np.ndarray]] | None = None
    for _ in range(opq_iters):
        # fresh same-seed rng per iteration: Lloyd inits stay comparable
        # across iterations, and iteration 1 (R = I) reproduces pq_train
        # exactly — so returning the best iterate by sample quantization
        # error guarantees OPQ is never worse than plain PQ on the sample
        rng = np.random.default_rng(seed)
        xr = x @ r_mat
        books = [
            _lloyd(xr[:, mi * sub : (mi + 1) * sub], k, iters, rng)
            for mi in range(num_subspaces)
        ]
        # reconstruct from codes
        recon = np.empty_like(xr)
        for mi, cb in enumerate(books):
            xs = xr[:, mi * sub : (mi + 1) * sub]
            dmat = -2.0 * (xs @ cb.T) + (cb**2).sum(axis=1)[None, :]
            recon[:, mi * sub : (mi + 1) * sub] = cb[dmat.argmin(axis=1)]
        err = float(((xr - recon) ** 2).sum())
        if best is None or err < best[0]:
            best = (err, r_mat.copy(), books)
        # orthogonal Procrustes: rotation aligning x with its reconstruction
        u, _, vt = np.linalg.svd(x.T @ recon)
        r_mat = u @ vt
    _, r_mat, books = best
    return (
        [[float(v) for v in row] for row in r_mat],
        [[[float(v) for v in c] for c in cb] for cb in books],
    )
