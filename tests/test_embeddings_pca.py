"""Distributed moments / PCA vs numpy ground truth."""

import numpy as np
import pytest

from hive2es_offline_spark.operators import embeddings as E


@pytest.fixture(scope="module")
def vec_df(spark):
    rng = np.random.default_rng(7)
    # anisotropic gaussian: known principal axes
    base = rng.normal(size=(400, 8)) * np.array([10, 5, 2, 1, 0.5, 0.2, 0.1, 0.05])
    rows = [(i, base[i].tolist()) for i in range(400)]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>"), base


def test_moments_match_numpy(vec_df):
    df, x = vec_df
    m = E.embedding_moments(df)
    assert m["n"] == 400
    np.testing.assert_allclose(m["mean"], x.mean(axis=0), atol=1e-9)
    np.testing.assert_allclose(m["cov"], np.cov(x, rowvar=False), atol=1e-9)


def test_moments_partition_invariant(vec_df):
    df, _ = vec_df
    a = E.embedding_moments(df.repartition(13))
    b = E.embedding_moments(df.coalesce(1))
    np.testing.assert_allclose(a["cov"], b["cov"], atol=1e-9)


def test_moments_driver_rows_partition_independent(vec_df):
    # the JVM pre-combine must hand the driver exactly d^2+d+2 scalar rows
    # (d=8 -> 74), never one d^2-array row per partition
    import pandas as pd

    df, _ = vec_df

    def partials(batches):
        import numpy as np

        n, s, ss = 0, None, None
        for pdf in batches:
            vecs = [v for v in pdf["embedding"] if v is not None]
            if not vecs:
                continue
            x = np.asarray([np.asarray(v, dtype=np.float64) for v in vecs])
            n += x.shape[0]
            s = x.sum(axis=0) if s is None else s + x.sum(axis=0)
            g = x.T @ x
            ss = g if ss is None else ss + g
        if n:
            d = s.shape[0]
            yield pd.DataFrame(
                {"m": [np.concatenate(([float(n), float(d)], s, ss.ravel())).tolist()]}
            )

    for parts in (1, 13):
        p = df.repartition(parts).select("embedding").mapInPandas(
            partials, "m array<double>"
        )
        assert E._moment_flat(p).count() == 8 * 8 + 8 + 2


def test_pca_fit_matches_numpy(vec_df):
    df, x = vec_df
    model = E.pca_fit(df, k=4)
    evals, evecs = np.linalg.eigh(np.cov(x, rowvar=False))
    order = np.argsort(evals)[::-1][:4]
    np.testing.assert_allclose(model["explained_variance"], evals[order], rtol=1e-9)
    for i, col in enumerate(order):
        v = evecs[:, col]
        got = model["components"][i]
        # eigenvectors match up to sign; fit sign-normalizes
        assert min(np.abs(got - v).max(), np.abs(got + v).max()) < 1e-9
    # descending variance, ratio sums under 1
    ev = model["explained_variance"]
    assert all(ev[i] >= ev[i + 1] for i in range(len(ev) - 1))
    assert 0.9 < model["explained_ratio"].sum() <= 1.0 + 1e-12


def test_pca_transform_and_whiten(vec_df):
    df, x = vec_df
    model = E.pca_fit(df, k=3)
    proj = (
        E.pca_transform(df, model, out_col="p")
        .orderBy("vec_id")
        .select("p")
        .toPandas()["p"]
    )
    y = np.asarray([np.asarray(v) for v in proj])
    expect = (x - x.mean(axis=0)) @ model["components"].T
    np.testing.assert_allclose(y, expect, atol=1e-9)
    w = (
        E.pca_transform(df, model, out_col="p", whiten=True)
        .select("p")
        .toPandas()["p"]
    )
    yw = np.asarray([np.asarray(v) for v in w])
    np.testing.assert_allclose(yw.std(axis=0, ddof=1), np.ones(3), rtol=1e-6)


def test_l2_normalize_builtin(spark):
    df = spark.createDataFrame(
        [(1, [3.0, 4.0]), (2, [0.0, 0.0]), (3, None)],
        "id long, v array<double>",
    )
    out = {r["id"]: r["n"] for r in df.select("id", E.l2_normalize("v").alias("n")).collect()}
    assert out[1] == [0.6, 0.8]
    assert out[2] == [0.0, 0.0]  # zero vector passes through
    assert out[3] is None
