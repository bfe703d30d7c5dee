"""Gram/covariance/PCA over embedding columns (similarity.gram_matrix,
pca_fit, pca_project) — pinned against direct numpy on the same data."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import Row

from feature_store_healthcare_spark.operators.similarity import (
    gram_matrix,
    pca_fit,
    pca_project,
)

DIM = 16
N = 400


@pytest.fixture(scope="module")
def xdata():
    rng = np.random.default_rng(7)
    # anisotropic data so PCA has a clear spectrum
    scales = np.linspace(4.0, 0.1, DIM)
    return (rng.normal(size=(N, DIM)) * scales).astype(np.float32)


@pytest.fixture(scope="module")
def xdf(spark, xdata):
    rows = [Row(vec_id=i, embedding=[float(v) for v in x]) for i, x in enumerate(xdata)]
    return spark.createDataFrame(rows).repartition(7)


def test_gram_matches_numpy(xdf, xdata):
    g, s, n = gram_matrix(xdf, "embedding", DIM)
    x = xdata.astype(np.float64)
    assert n == N
    np.testing.assert_allclose(g, x.T @ x, rtol=1e-9)
    np.testing.assert_allclose(s, x.sum(axis=0), rtol=1e-9)


def test_pca_fit_matches_numpy(xdf, xdata):
    comps, var, mean = pca_fit(xdf, "embedding", DIM, k=4)
    x = xdata.astype(np.float64)
    np.testing.assert_allclose(mean, x.mean(axis=0), rtol=1e-9, atol=1e-12)
    cov = np.cov(x, rowvar=False)
    w = np.sort(np.linalg.eigvalsh(cov))[::-1][:4]
    np.testing.assert_allclose(var, w, rtol=1e-7)
    # components are orthonormal eigenvectors of cov
    np.testing.assert_allclose(comps @ comps.T, np.eye(4), atol=1e-9)
    for c, lam in zip(comps, var):
        np.testing.assert_allclose(cov @ c, lam * c, atol=1e-7)


def test_pca_project_matches_numpy(xdf, xdata):
    comps, _, mean = pca_fit(xdf, "embedding", DIM, k=3)
    out = {
        r["vec_id"]: np.asarray(r["pca"])
        for r in pca_project(xdf, comps, mean).select("vec_id", "pca").collect()
    }
    x = xdata.astype(np.float64)
    want = (x - mean) @ comps.T
    got = np.asarray([out[i] for i in range(N)])
    np.testing.assert_allclose(got, want, atol=1e-9)
    # projection preserves centered variance along components
    np.testing.assert_allclose(
        got.var(axis=0, ddof=1),
        np.sort(np.linalg.eigvalsh(np.cov(x, rowvar=False)))[::-1][:3],
        rtol=1e-7,
    )


def test_pca_sign_deterministic(xdf):
    c1, _, _ = pca_fit(xdf, "embedding", DIM, k=4)
    c2, _, _ = pca_fit(xdf.repartition(3), "embedding", DIM, k=4)
    np.testing.assert_allclose(c1, c2, atol=1e-9)
    for c in c1:
        assert c[np.argmax(np.abs(c))] > 0
