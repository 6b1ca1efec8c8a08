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


class TestKernelPCA:
    def test_shapes_and_quality(self):
        from sklearn.datasets import make_moons

        X, y = make_moons(n_samples=100, noise=0.05, random_state=0)
        X = X.astype(np.float32)
        Z = tdr.KernelPCA(n_components=2).fit_transform(X)
        assert np.asarray(Z).shape == (100, 2)
        assert np.isfinite(np.asarray(Z)).all()

    def test_matches_sklearn_gaussian(self):
        rng = np.random.default_rng(0)
        X = rng.normal(size=(80, 5)).astype(np.float32)
        from sklearn.decomposition import KernelPCA as SkKPCA

        from torchdr_tpu.affinity import NormalizedGaussianAffinity

        Z = tdr.KernelPCA(
            affinity=NormalizedGaussianAffinity(
                sigma=2.0, normalization_dim=None, zero_diag=False
            ),
            n_components=3,
        ).fit_transform(X)
        Zs = SkKPCA(kernel="rbf", gamma=0.5, n_components=3).fit_transform(X)
        assert np.abs(np.abs(np.asarray(Z)) - np.abs(Zs)).max() < 1e-2

    def test_lobpcg_matches_eigh(self):
        rng = np.random.default_rng(1)
        X = rng.normal(size=(120, 8)).astype(np.float32)
        Z1 = np.abs(np.asarray(tdr.KernelPCA(n_components=2, solver="eigh").fit_transform(X)))
        Z2 = np.abs(np.asarray(tdr.KernelPCA(n_components=2, solver="lobpcg", random_state=0).fit_transform(X)))
        assert np.abs(Z1 - Z2).max() < 1e-2

    def test_lobpcg_mesh_matches_single_device(self):
        """shard_map matvec over an 8-device mesh matches the single-device
        matrix-free path (same operator, rows split across chips)."""
        import jax

        if len(jax.devices()) < 8:
            pytest.skip("needs 8 devices")
        from torchdr_tpu.parallel.mesh import make_mesh

        rng = np.random.default_rng(3)
        X = rng.normal(size=(200, 8)).astype(np.float32)
        Z1 = np.abs(np.asarray(
            tdr.KernelPCA(n_components=2, solver="lobpcg", random_state=0).fit_transform(X)
        ))
        Z2 = np.abs(np.asarray(
            tdr.KernelPCA(
                n_components=2, solver="lobpcg", random_state=0, mesh=make_mesh(8)
            ).fit_transform(X)
        ))
        assert np.abs(Z1 - Z2).max() < 1e-3

    def test_matfree_lobpcg_eigenpairs_match_dense(self):
        """Matrix-free streamed operator vs dense eigh at n=2k (≤1e-4)."""
        rng = np.random.default_rng(2)
        centers = rng.normal(scale=4.0, size=(5, 6))
        X = np.concatenate(
            [c + rng.normal(size=(400, 6)) for c in centers]
        ).astype(np.float32)  # n=2000: several streamed blocks
        from torchdr_tpu.affinity import NormalizedGaussianAffinity

        kw = dict(
            affinity=NormalizedGaussianAffinity(
                sigma=4.0, normalization_dim=None, zero_diag=False
            ),
            n_components=3,
        )
        m1 = tdr.KernelPCA(solver="eigh", **kw)
        Z1 = m1.fit_transform(X)
        kw["affinity"] = NormalizedGaussianAffinity(
            sigma=4.0, normalization_dim=None, zero_diag=False
        )
        m2 = tdr.KernelPCA(solver="lobpcg", random_state=0, **kw)
        Z2 = m2.fit_transform(X)
        ev1 = np.asarray(m1.eigenvalues_[:3])
        ev2 = np.asarray(m2.eigenvalues_[:3])
        assert np.abs(ev1 - ev2).max() < 1e-4 * max(1.0, ev1.max())
        assert np.abs(np.abs(np.asarray(Z1)) - np.abs(np.asarray(Z2))).max() < 1e-2

    def test_matfree_global_normalization_scales_eigvals(self):
        rng = np.random.default_rng(3)
        X = rng.normal(size=(300, 5)).astype(np.float32)
        from torchdr_tpu.affinity import NormalizedGaussianAffinity

        m1 = tdr.KernelPCA(
            affinity=NormalizedGaussianAffinity(sigma=3.0, normalization_dim=(0, 1)),
            n_components=2, solver="eigh",
        )
        Z1 = m1.fit_transform(X)
        m2 = tdr.KernelPCA(
            affinity=NormalizedGaussianAffinity(sigma=3.0, normalization_dim=(0, 1)),
            n_components=2, solver="lobpcg", random_state=0,
        )
        Z2 = m2.fit_transform(X)
        assert np.abs(
            np.asarray(m1.eigenvalues_[:2]) - np.asarray(m2.eigenvalues_[:2])
        ).max() < 1e-6 + 1e-3 * float(m1.eigenvalues_[0])
        assert np.abs(np.abs(np.asarray(Z1)) - np.abs(np.asarray(Z2))).max() < 1e-2

    def test_lobpcg_dense_fallback_unsupported_affinity(self):
        """Affinities without a matrix-free form still work via dense LOBPCG."""
        rng = np.random.default_rng(4)
        X = rng.normal(size=(150, 5)).astype(np.float32)
        from torchdr_tpu.affinity import SelfTuningAffinity

        m = tdr.KernelPCA(
            affinity=SelfTuningAffinity(normalization_dim=None),
            n_components=2, solver="lobpcg", random_state=0,
        )
        Z = m.fit_transform(X)
        assert np.isfinite(np.asarray(Z)).all()


class TestPHATE:
    def test_quality(self):
        from sklearn.datasets import make_moons

        X, y = make_moons(n_samples=100, noise=0.05, random_state=0)
        X = X.astype(np.float32)
        Z = tdr.PHATE(k=5, t=50, max_iter=300, random_state=0).fit_transform(X)
        from torchdr_tpu import silhouette_score

        assert silhouette_score(Z, y) > 0.15


class TestIncrementalPCA:
    def test_matches_sklearn(self):
        rng = np.random.default_rng(0)
        X = rng.normal(size=(300, 12)).astype(np.float32)
        from sklearn.decomposition import IncrementalPCA as SkIPCA

        Z = tdr.IncrementalPCA(n_components=4, batch_size=64).fit_transform(X)
        Zs = SkIPCA(n_components=4, batch_size=64).fit_transform(X)
        assert np.abs(np.abs(np.asarray(Z)) - np.abs(Zs)).max() < 1e-2

    def test_partial_fit_streaming(self):
        rng = np.random.default_rng(1)
        X = rng.normal(size=(200, 8)).astype(np.float32)
        ipca = tdr.IncrementalPCA(n_components=3)
        for i in range(0, 200, 50):
            ipca.partial_fit(X[i : i + 50])
        Z = ipca.transform(X)
        assert np.asarray(Z).shape == (200, 3)

    def test_batch_iterable_input(self):
        rng = np.random.default_rng(2)
        batches = [rng.normal(size=(40, 6)).astype(np.float32) for _ in range(5)]
        Z = tdr.IncrementalPCA(n_components=2).fit_transform(iter(batches))
        assert np.asarray(Z).shape == (200, 2)


class TestExactIncrementalPCA:
    def test_matches_full_pca(self):
        rng = np.random.default_rng(0)
        X = rng.normal(size=(300, 12)).astype(np.float32)
        Z1 = np.abs(np.asarray(tdr.ExactIncrementalPCA(n_components=4, batch_size=64).fit_transform(X)))
        Z2 = np.abs(np.asarray(tdr.PCA(n_components=4).fit_transform(X)))
        assert np.abs(Z1 - Z2).max() < 1e-2

    def test_explained_variance(self):
        rng = np.random.default_rng(0)
        X = rng.normal(size=(500, 6)).astype(np.float32) * np.array([5, 3, 1, 1, 1, 1], np.float32)
        m = tdr.ExactIncrementalPCA(n_components=2, batch_size=100)
        m.fit(X)
        assert m.explained_variance_[0] > m.explained_variance_[1]
