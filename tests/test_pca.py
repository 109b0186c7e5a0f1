"""Contract tests for the distributed exact PCA (operators/pca) —
the pytest verification tier (no DuckDB oracle: eigendecomposition
is not SQL-expressible)."""

from __future__ import annotations

import numpy as np
import pytest


@pytest.fixture(scope="module")
def fitted(spark):
    from stream_spark.operators.pca import pca_fit
    from stream_spark.sources import load_table

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    X = np.array([np.asarray(r["embedding"], dtype=np.float64) for r in emb.collect()])
    mean, comps, vals = pca_fit(emb, k=8)
    return emb, X, np.asarray(mean), np.asarray(comps), np.asarray(vals)


def _numpy_pca(X, k):
    mu = X.mean(axis=0)
    cov = (X - mu).T @ (X - mu) / len(X)
    vals, vecs = np.linalg.eigh(cov)
    order = np.argsort(vals)[::-1][:k]
    C = vecs[:, order].T
    for i in range(C.shape[0]):
        j = int(np.argmax(np.abs(C[i])))
        if C[i, j] < 0:
            C[i] = -C[i]
    return mu, C, vals[order]


def test_pca_components_orthonormal(fitted):
    _, _, _, C, vals = fitted
    assert np.allclose(C @ C.T, np.eye(8), atol=1e-9)
    assert all(vals[i] >= vals[i + 1] - 1e-12 for i in range(7))
    assert (vals >= 0).all()


def test_pca_matches_numpy_reference(fitted):
    """Distributed moment combine == single-machine PCA on the same
    rows (same sign convention), to float tolerance."""
    _, X, mu, C, vals = fitted
    nmu, nC, nvals = _numpy_pca(X, 8)
    assert np.allclose(mu, nmu, atol=1e-9)
    assert np.allclose(vals, nvals, atol=1e-7)
    assert np.allclose(np.abs(C @ nC.T), np.eye(8), atol=1e-6)  # same subspace, aligned
    assert np.allclose(C, nC, atol=1e-6)                        # and same signs


def test_pca_projection_and_whitening(fitted, spark):
    from stream_spark.operators.pca import pca_transform

    emb, X, mu, C, vals = fitted
    proj = {
        r["vec_id"]: np.asarray(r["proj"])
        for r in pca_transform(emb, list(mu), [list(c) for c in C], list(vals)).collect()
    }
    ids = [r["vec_id"] for r in emb.select("vec_id").collect()]
    P = np.array([proj[i] for i in ids])
    want = (X - mu) @ C.T
    assert np.allclose(P, want, atol=1e-8)
    # whitened: per-component variance ~1 (biased /n variance, eps slack)
    white = {
        r["vec_id"]: np.asarray(r["proj"])
        for r in pca_transform(
            emb, list(mu), [list(c) for c in C], list(vals), whiten=True
        ).collect()
    }
    W = np.array([white[i] for i in ids])
    assert np.allclose(W.var(axis=0, ddof=0), 1.0, atol=1e-3)


def test_pca_registered_query_shape(spark):
    from stream_spark.queries import QUERIES

    out = QUERIES["embeddings_pca_project"](spark, "/root/testdata/sf0.001")
    rows = out.collect()
    assert len(rows) > 0 and len(rows[0]["proj"]) == 8
