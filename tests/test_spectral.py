"""Spectral embedding tests (PCA family, KernelPCA, PHATE)."""

import numpy as np
import pytest

import torchdr_tpu as tdr


@pytest.fixture(scope="module")
def X():
    rng = np.random.default_rng(0)
    return rng.normal(size=(200, 20)).astype(np.float32)


class TestPCA:
    def test_matches_sklearn(self, X):
        from sklearn.decomposition import PCA as SkPCA

        Z = tdr.PCA(n_components=5).fit_transform(X)
        Zs = SkPCA(n_components=5).fit_transform(X)
        assert np.abs(np.abs(np.asarray(Z)) - np.abs(Zs)).max() < 1e-3

    def test_covariance_method_matches_svd(self, X):
        Z1 = tdr.PCA(n_components=5, method="svd").fit_transform(X)
        Z2 = tdr.PCA(n_components=5, method="covariance").fit_transform(X)
        assert np.abs(np.abs(np.asarray(Z1)) - np.abs(np.asarray(Z2))).max() < 1e-2

    def test_transform_new_data(self, X):
        pca = tdr.PCA(n_components=3)
        pca.fit(X)
        Z_new = pca.transform(X[:7])
        assert np.asarray(Z_new).shape == (7, 3)

    def test_deterministic(self, X):
        Z1 = tdr.PCA(n_components=2).fit_transform(X)
        Z2 = tdr.PCA(n_components=2).fit_transform(X)
        assert np.allclose(Z1, Z2)
