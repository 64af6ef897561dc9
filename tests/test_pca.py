"""Tests for distributed PCA (operators/pca.py): one-pass moments,
covariance parity with numpy, projection parity with direct PCA."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import Row

from inception_eventstore_spark.operators.pca import (
    embedding_covariance,
    embedding_moments,
    pca_components,
    pca_project,
)


def _emb(spark, X):
    return spark.createDataFrame(
        [Row(vec_id=i, embedding=[float(v) for v in row])
         for i, row in enumerate(X)],
        "vec_id long, embedding array<double>",
    ).repartition(4)  # force multi-partition partial accumulation


@pytest.fixture(scope="module")
def X():
    rng = np.random.RandomState(11)
    # anisotropic: one dominant direction so PCA order is unambiguous
    base = rng.randn(200, 6)
    base[:, 0] *= 5.0
    base[:, 1] *= 2.0
    return base


class TestMoments:
    def test_match_numpy(self, spark, X):
        gram, colsum, n = embedding_moments(_emb(spark, X))
        assert n == len(X)
        np.testing.assert_allclose(gram, X.T @ X, rtol=1e-10)
        np.testing.assert_allclose(colsum, X.sum(axis=0), rtol=1e-10)

    def test_covariance_matches_numpy(self, spark, X):
        got = {
            (r.i, r.j): r.cov
            for r in embedding_covariance(_emb(spark, X)).collect()
        }
        want = np.cov(X, rowvar=False, ddof=1)
        for (i, j), c in got.items():
            assert i <= j  # upper triangle only
            assert c == pytest.approx(round(want[i, j], 6), abs=1e-6)
        assert len(got) == 6 * 7 // 2


class TestProjection:
    def test_matches_direct_numpy_pca(self, spark, X):
        W, mu = pca_components(_emb(spark, X), k=2)
        # reference: eigh on numpy covariance with the same sign fix
        vals, vecs = np.linalg.eigh(np.cov(X, rowvar=False, ddof=1))
        order = np.argsort(vals)[::-1][:2]
        Wref = vecs[:, order].T
        for r in range(2):
            lead = np.argmax(np.abs(Wref[r]))
            if Wref[r, lead] < 0:
                Wref[r] = -Wref[r]
        np.testing.assert_allclose(W, Wref, atol=1e-8)
        np.testing.assert_allclose(mu, X.mean(axis=0), atol=1e-10)

        out = pca_project(_emb(spark, X), k=2).orderBy("vec_id").collect()
        Y = np.array([r.pca for r in out])
        np.testing.assert_allclose(Y, (X - X.mean(0)) @ Wref.T, atol=1e-8)

    def test_projection_variance_ordered(self, spark, X):
        out = pca_project(_emb(spark, X), k=3).collect()
        Y = np.array([r.pca for r in out])
        v = Y.var(axis=0)
        assert v[0] > v[1] > v[2]

    def test_reuse_fitted_components(self, spark, X):
        emb = _emb(spark, X)
        comps = pca_components(emb, k=2)
        fresh = spark.createDataFrame(
            [Row(vec_id=999, embedding=[1.0] * 6)],
            "vec_id long, embedding array<double>",
        )
        out = pca_project(fresh, k=2, components=comps).collect()[0]
        W, mu = comps
        np.testing.assert_allclose(
            np.array(out.pca), W @ (np.ones(6) - mu), atol=1e-10
        )

    def test_empty_input_raises(self, spark):
        empty = spark.createDataFrame(
            [], "vec_id long, embedding array<double>"
        )
        with pytest.raises(ValueError):
            pca_components(empty, k=2)
