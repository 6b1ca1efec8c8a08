"""Affinity property tests (mirrors reference test_affinity.py:63-414).

Checks shapes, marginals, entropies, symmetry, and dense-vs-sparse
consistency for every affinity.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from torchdr_tpu.affinity import (
    EntropicAffinity,
    NormalizedGaussianAffinity,
    NormalizedStudentAffinity,
    SinkhornAffinity,
    SymmetricEntropicAffinity,
)


@pytest.fixture(scope="module")
def X():
    rng = np.random.default_rng(0)
    return rng.normal(size=(120, 10)).astype(np.float32)


class TestEntropicAffinity:
    def test_entropy_constraint_dense(self, X):
        perp = 20
        aff = EntropicAffinity(perplexity=perp, sparsity=False)
        logP = aff(X, log=True, return_indices=False)
        P = np.exp(np.asarray(logP)) * X.shape[0]  # undo 1/n
        H = -np.sum(P * (np.log(P + 1e-30) - 1.0), axis=1)
        assert np.abs(H - (np.log(perp) + 1)).max() < 1e-3
        assert np.abs(P.sum(1) - 1.0).max() < 1e-4

    def test_sparse_entropy_constraint(self, X):
        # Sparse mode calibrates on the 3·perplexity-NN support; the entropy
        # and marginal constraints must hold on that support.
        perp = 10
        vals, idx = EntropicAffinity(perplexity=perp, sparsity=True)(
            X, log=False, return_indices=True
        )
        P = np.asarray(vals) * X.shape[0]
        assert idx.shape == (X.shape[0], 3 * perp)
        assert np.abs(P.sum(1) - 1.0).max() < 1e-4
        H = -np.sum(P * (np.log(P + 1e-30) - 1.0), axis=1)
        assert np.abs(H - (np.log(perp) + 1)).max() < 1e-3

    def test_perplexity_clamped(self, X):
        aff = EntropicAffinity(perplexity=1000, sparsity=False)
        logP = aff(X, log=True, return_indices=False)
        assert np.isfinite(np.asarray(logP)).all()


class TestSinkhorn:
    @pytest.mark.parametrize("base_kernel", ["gaussian", "student"])
    def test_doubly_stochastic(self, X, base_kernel):
        aff = SinkhornAffinity(eps=1.0, base_kernel=base_kernel)
        P = np.asarray(aff(X)) * X.shape[0]
        assert np.abs(P.sum(1) - 1.0).max() < 1e-3
        assert np.abs(P - P.T).max() < 1e-5


class TestSEA:
    def test_marginals_and_entropy(self, X):
        perp = 20
        aff = SymmetricEntropicAffinity(perplexity=perp, lr=1e-1, max_iter=800)
        P = np.asarray(aff(X)) * X.shape[0]
        assert np.abs(P - P.T).max() < 1e-5
        assert np.abs(P.sum(1) - 1.0).max() < 5e-3
        H = -np.sum(P * (np.log(P + 1e-30) - 1.0), axis=1)
        assert np.abs(H - (np.log(perp) + 1)).max() < 0.2


class TestNormalized:
    def test_gaussian_total_mass(self, X):
        aff = NormalizedGaussianAffinity(normalization_dim=(0, 1))
        P = np.asarray(aff(X))
        assert abs(P.sum() - 1.0) < 1e-4

    def test_gaussian_row_norm(self, X):
        aff = NormalizedGaussianAffinity(normalization_dim=1)
        P = np.asarray(aff(X)) * X.shape[0]
        assert np.abs(P.sum(1) - 1.0).max() < 1e-4

    def test_student_total_mass(self, X):
        aff = NormalizedStudentAffinity(normalization_dim=(0, 1))
        P = np.asarray(aff(X))
        assert abs(P.sum() - 1.0) < 1e-4

    def test_unnormalized_gaussian(self, X):
        aff = NormalizedGaussianAffinity(normalization_dim=None, sigma=2.0)
        P = np.asarray(aff(X))
        assert P.max() <= 1.0 + 1e-6


class TestKnnNormalized:
    def test_umap_affinity_marginal(self, X):
        from torchdr_tpu.affinity import UMAPAffinity

        k = 15
        aff = UMAPAffinity(n_neighbors=k, symmetrize=False)
        P, idx = aff(X, return_indices=True)
        # before symmetrization: row sums equal log2(k)
        assert np.abs(np.asarray(P).sum(1) - np.log2(k)).max() < 1e-3

    def test_umap_affinity_symmetrized(self, X):
        from torchdr_tpu.affinity import UMAPAffinity
        from torchdr_tpu.ops import sparse_to_dense

        aff = UMAPAffinity(n_neighbors=15)
        P, idx = aff(X, return_indices=True)
        dense = np.asarray(sparse_to_dense(P, idx, X.shape[0]))
        assert np.abs(dense - dense.T).max() < 1e-5
        assert dense.max() <= 1.0 + 1e-5  # fuzzy union stays in [0, 1]

    def test_self_tuning(self, X):
        from torchdr_tpu.affinity import SelfTuningAffinity

        P = np.asarray(SelfTuningAffinity(normalization_dim=1)(X))
        assert np.abs(P.sum(1) - 1.0).max() < 1e-4

    def test_magic(self, X):
        from torchdr_tpu.affinity import MAGICAffinity

        P = np.asarray(MAGICAffinity()(X))
        assert np.abs(P.sum(1) - 1.0).max() < 1e-4
        assert (P >= 0).all()

    def test_phate_affinity(self, X):
        from torchdr_tpu.affinity import PHATEAffinity

        A = np.asarray(PHATEAffinity(k=5, t=3)(X[:60]))
        assert A.shape == (60, 60)
        assert np.isfinite(A).all()
        assert (A <= 1e-6).all()  # negative potential distances
        assert np.abs(A - A.T).max() < 1e-3

    def test_pacmap_indices(self, X):
        from torchdr_tpu.affinity import PACMAPAffinity

        vals, idx = PACMAPAffinity(n_neighbors=8)(X, return_indices=True)
        assert vals is None
        assert idx.shape == (X.shape[0], 8)
        # no self index
        assert not (np.asarray(idx) == np.arange(X.shape[0])[:, None]).any()


class TestQuadratic:
    def test_doubly_stochastic(self, X):
        from torchdr_tpu.affinity import DoublyStochasticQuadraticAffinity

        aff = DoublyStochasticQuadraticAffinity(eps=1.0, lr=1e-1, max_iter=2000)
        P = np.asarray(aff(X[:60])) * 60
        assert np.abs(P - P.T).max() < 1e-5
        assert np.abs(P.sum(1) - 1.0).max() < 5e-2
        assert (P >= 0).all()


class TestConsistency:
    def test_dense_sparse_entropic_support(self, X):
        # the dense-vs-sparse consistency check (replaces the reference's
        # torch-vs-keops check, validation.py:31-85): sparse values must
        # match a dense calibration restricted to the same support
        from torchdr_tpu.affinity import EntropicAffinity
        from torchdr_tpu.utils.validation import check_similarity_dense_sparse
        from torchdr_tpu.affinity.entropic import solve_entropic_affinity
        from torchdr_tpu.ops.distance import knn_graph
        import jax.numpy as jnp

        k = 30
        C, idx = knn_graph(jnp.asarray(X), k=k)
        log_P, _ = solve_entropic_affinity(C, 10.0)
        vals, idx2 = EntropicAffinity(perplexity=10, sparsity=True)(
            X, log=False, return_indices=True
        )
        assert np.array_equal(np.asarray(idx), np.asarray(idx2))
        # rebuild a dense matrix from the solver output and compare support
        dense = np.zeros((X.shape[0], X.shape[0]), np.float32)
        rows = np.arange(X.shape[0])[:, None]
        dense[rows, np.asarray(idx)] = np.exp(np.asarray(log_P))
        check_similarity_dense_sparse(dense, vals, idx2, tol=1e-5)


class TestDeterminism:
    def test_umap_same_seed_identical(self, X):
        import torchdr_tpu as tdr

        Z1 = tdr.UMAP(n_neighbors=10, max_iter=50, random_state=7).fit_transform(X)
        Z2 = tdr.UMAP(n_neighbors=10, max_iter=50, random_state=7).fit_transform(X)
        assert np.allclose(np.asarray(Z1), np.asarray(Z2), atol=1e-6)

    def test_umap_different_seed_differs(self, X):
        import torchdr_tpu as tdr

        Z1 = tdr.UMAP(n_neighbors=10, max_iter=50, random_state=1, init="normal").fit_transform(X)
        Z2 = tdr.UMAP(n_neighbors=10, max_iter=50, random_state=2, init="normal").fit_transform(X)
        assert not np.allclose(np.asarray(Z1), np.asarray(Z2), atol=1e-3)
