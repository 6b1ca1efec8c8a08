"""IncrementalPCA / ExactIncrementalPCA depth tests.

Mirrors the reference suite's coverage themes (reference:
torchdr/tests/test_incremental_pca.py, 718 LoC): sklearn agreement across
batch sizes, projection checks, statistics accuracy, validation errors,
partial_fit equivalence, dtype handling, and mesh execution.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import torchdr_tpu as tdr

needs_8 = pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")


@pytest.fixture(scope="module")
def X():
    rng = np.random.default_rng(42)
    # anisotropic so components are well separated
    scales = np.array([10, 5, 3, 2, 1, 1, 0.5, 0.5, 0.2, 0.1], np.float32)
    return (rng.normal(size=(400, 10)) * scales).astype(np.float32)


class TestIncrementalPCAvsSklearn:
    @pytest.mark.parametrize("batch_size", [30, 64, 100, 400])
    def test_components_match_across_batch_sizes(self, X, batch_size):
        from sklearn.decomposition import IncrementalPCA as SkIPCA

        m = tdr.IncrementalPCA(n_components=4, batch_size=batch_size)
        Z = np.asarray(m.fit_transform(X))
        sk = SkIPCA(n_components=4, batch_size=batch_size)
        Zs = sk.fit_transform(X)
        assert np.abs(np.abs(Z) - np.abs(Zs)).max() < 1e-2
        # components agree up to sign
        dots = np.abs(np.sum(m.components_ * sk.components_, axis=1))
        assert np.all(dots > 0.999)

    @pytest.mark.parametrize("batch_size", [50, 128])
    def test_singular_values_and_variance(self, X, batch_size):
        from sklearn.decomposition import IncrementalPCA as SkIPCA

        m = tdr.IncrementalPCA(n_components=5, batch_size=batch_size)
        m.fit(X)
        sk = SkIPCA(n_components=5, batch_size=batch_size).fit(X)
        assert np.allclose(m.singular_values_, sk.singular_values_, rtol=1e-3)
        assert np.allclose(
            m.explained_variance_, sk.explained_variance_, rtol=1e-3
        )
        assert np.allclose(
            m.explained_variance_ratio_, sk.explained_variance_ratio_, rtol=1e-3
        )

    def test_mean_and_var_accuracy(self, X):
        m = tdr.IncrementalPCA(n_components=2, batch_size=37)  # ragged batches
        m.fit(X)
        assert np.allclose(m.mean_, X.mean(axis=0), atol=1e-5)
        assert np.allclose(m.var_, X.var(axis=0), rtol=1e-4)
        assert m.n_samples_seen_ == X.shape[0]

    def test_projection_identity(self, X):
        """transform(X) must equal (X - mean) @ components.T."""
        m = tdr.IncrementalPCA(n_components=3, batch_size=80)
        Z = np.asarray(m.fit_transform(X))
        Z_manual = (X - m.mean_) @ m.components_.T
        assert np.abs(Z - Z_manual).max() < 1e-4

    def test_partial_fit_matches_fit(self, X):
        a = tdr.IncrementalPCA(n_components=3, batch_size=100)
        a.fit(X)
        b = tdr.IncrementalPCA(n_components=3)
        for i in range(0, X.shape[0], 100):
            b.partial_fit(X[i : i + 100])
        assert np.allclose(np.abs(a.components_), np.abs(b.components_), atol=1e-5)

    def test_transform_new_data_matches_sklearn(self, X):
        from sklearn.decomposition import IncrementalPCA as SkIPCA

        m = tdr.IncrementalPCA(n_components=3, batch_size=100)
        m.fit(X[:300])
        sk = SkIPCA(n_components=3, batch_size=100).fit(X[:300])
        Z = np.asarray(m.transform(X[300:]))
        Zs = sk.transform(X[300:])
        assert np.abs(np.abs(Z) - np.abs(Zs)).max() < 1e-2

    def test_components_orthonormal(self, X):
        m = tdr.IncrementalPCA(n_components=4, batch_size=64)
        m.fit(X)
        G = m.components_ @ m.components_.T
        assert np.abs(G - np.eye(4)).max() < 1e-4

    @pytest.mark.parametrize("dtype", [np.float64, np.int32])
    def test_input_dtypes(self, dtype):
        rng = np.random.default_rng(0)
        Xd = (rng.normal(size=(100, 6)) * 10).astype(dtype)
        Z = tdr.IncrementalPCA(n_components=2, batch_size=50).fit_transform(Xd)
        assert np.isfinite(np.asarray(Z)).all()


class TestIncrementalPCAValidation:
    def test_n_components_exceeds_features(self):
        X = np.zeros((50, 4), np.float32)
        with pytest.raises(ValueError, match="n_components"):
            tdr.IncrementalPCA(n_components=8).fit(X)

    def test_first_batch_smaller_than_components(self):
        X = np.random.default_rng(0).normal(size=(3, 8)).astype(np.float32)
        with pytest.raises(ValueError, match="fewer"):
            tdr.IncrementalPCA(n_components=6).partial_fit(X)

    def test_feature_count_change(self):
        rng = np.random.default_rng(0)
        m = tdr.IncrementalPCA(n_components=2)
        m.partial_fit(rng.normal(size=(50, 8)).astype(np.float32))
        with pytest.raises(ValueError, match="features"):
            m.partial_fit(rng.normal(size=(50, 5)).astype(np.float32))

    def test_transform_before_fit(self):
        with pytest.raises(ValueError):
            tdr.IncrementalPCA(n_components=2).transform(np.zeros((4, 3), np.float32))

    def test_non_2d_batch(self):
        with pytest.raises(ValueError, match="2D"):
            tdr.IncrementalPCA(n_components=2).partial_fit(np.zeros(7, np.float32))


class TestExactIncrementalPCADepth:
    @pytest.mark.parametrize("batch_size", [30, 100, 400])
    def test_matches_full_pca_across_batches(self, X, batch_size):
        Z1 = np.abs(np.asarray(
            tdr.ExactIncrementalPCA(n_components=4, batch_size=batch_size).fit_transform(X)
        ))
        Z2 = np.abs(np.asarray(tdr.PCA(n_components=4).fit_transform(X)))
        assert np.abs(Z1 - Z2).max() < 1e-2

    def test_projection_identity(self, X):
        m = tdr.ExactIncrementalPCA(n_components=3, batch_size=64)
        Z = np.asarray(m.fit_transform(X))
        Z_manual = (X - np.asarray(m.mean_)) @ np.asarray(m.components_).T
        assert np.abs(Z - Z_manual).max() < 1e-3

    def test_batch_iterable(self):
        rng = np.random.default_rng(3)
        batches = [rng.normal(size=(64, 6)).astype(np.float32) for _ in range(4)]
        full = np.concatenate(batches)
        Z1 = np.abs(np.asarray(
            tdr.ExactIncrementalPCA(n_components=2).fit_transform(iter(batches))
        ))
        Z2 = np.abs(np.asarray(tdr.PCA(n_components=2).fit_transform(full)))
        assert np.abs(Z1 - Z2).max() < 1e-2

    def test_reconstruction_quality(self, X):
        m = tdr.ExactIncrementalPCA(n_components=10, batch_size=100)
        Z = np.asarray(m.fit_transform(X))
        X_rec = Z @ np.asarray(m.components_) + np.asarray(m.mean_)
        rel = np.linalg.norm(X - X_rec) / np.linalg.norm(X)
        assert rel < 1e-3  # full-rank reconstruction

    def test_float64_input(self):
        rng = np.random.default_rng(1)
        Xd = rng.normal(size=(150, 5))
        Z = tdr.ExactIncrementalPCA(n_components=2, batch_size=64).fit_transform(Xd)
        assert np.isfinite(np.asarray(Z)).all()


@needs_8
class TestIncrementalPCAMesh:
    def test_exact_ipca_on_sharded_rows(self, X):
        """Covariance accumulation runs under GSPMD with row-sharded input."""
        from torchdr_tpu.parallel.mesh import make_mesh, shard_rows

        mesh = make_mesh(8)
        Xs = shard_rows(jnp.asarray(X), mesh)
        m = tdr.ExactIncrementalPCA(n_components=3, batch_size=X.shape[0])
        Z1 = np.abs(np.asarray(m.fit_transform(np.asarray(Xs))))
        Z2 = np.abs(np.asarray(tdr.PCA(n_components=3).fit_transform(X)))
        assert np.abs(Z1 - Z2).max() < 1e-2

    def test_exact_ipca_explicit_mesh_psum(self, X):
        """mesh= path: per-batch stats run as shard_map + psum over 8 devices
        and must match the single-device result to 1e-5
        (reference distributed path: incremental_pca.py:845-1090)."""
        from torchdr_tpu.parallel.mesh import make_mesh

        mesh = make_mesh(8)
        m_mesh = tdr.ExactIncrementalPCA(n_components=3, batch_size=64, mesh=mesh)
        Z_mesh = np.asarray(m_mesh.fit_transform(X))
        m_one = tdr.ExactIncrementalPCA(n_components=3, batch_size=64)
        Z_one = np.asarray(m_one.fit_transform(X))
        assert np.abs(np.asarray(m_mesh.mean_) - np.asarray(m_one.mean_)).max() < 1e-5
        assert np.abs(np.abs(Z_mesh) - np.abs(Z_one)).max() < 1e-5

    def test_exact_ipca_set_fit_mesh_protocol(self, X):
        """_set_fit_mesh after construction takes effect on the next fit."""
        from torchdr_tpu.parallel.mesh import make_mesh

        m = tdr.ExactIncrementalPCA(n_components=2, batch_size=50)
        m._set_fit_mesh(make_mesh(8))
        Z = np.asarray(m.fit_transform(X))
        Z_ref = np.asarray(
            tdr.ExactIncrementalPCA(n_components=2, batch_size=50).fit_transform(X)
        )
        assert np.abs(np.abs(Z) - np.abs(Z_ref)).max() < 1e-5
