"""Deeper affinity coverage: cross-affinity invariants, scale/shift
behavior, duplicate/degenerate inputs, metric variants, solver knobs
(reference themes: torchdr/tests/test_affinity.py, 414 LoC)."""

import jax.numpy as jnp
import numpy as np
import pytest

from torchdr_tpu.affinity import (
    DoublyStochasticQuadraticAffinity,
    EntropicAffinity,
    MAGICAffinity,
    NormalizedGaussianAffinity,
    NormalizedStudentAffinity,
    PACMAPAffinity,
    PHATEAffinity,
    SelfTuningAffinity,
    SinkhornAffinity,
    SymmetricEntropicAffinity,
    UMAPAffinity,
)


@pytest.fixture(scope="module")
def X():
    rng = np.random.default_rng(7)
    centers = rng.normal(scale=5.0, size=(3, 8))
    return np.concatenate(
        [c + rng.normal(size=(40, 8)) for c in centers]
    ).astype(np.float32)


DENSE_AFFINITIES = [
    lambda: EntropicAffinity(perplexity=12, sparsity=False),
    lambda: SinkhornAffinity(eps=1.0),
    lambda: DoublyStochasticQuadraticAffinity(eps=1.0, max_iter=300),
    lambda: NormalizedGaussianAffinity(sigma=1.0),
    lambda: NormalizedStudentAffinity(),
    lambda: SelfTuningAffinity(K=7),
    lambda: MAGICAffinity(K=7),
]


def _dense_P(aff, X):
    out = aff(X)
    P = out[0] if isinstance(out, tuple) else out
    return np.asarray(P)


@pytest.mark.parametrize("make", DENSE_AFFINITIES)
class TestDenseInvariants:
    def test_shape_finite_nonnegative(self, make, X):
        P = _dense_P(make(), X)
        n = X.shape[0]
        assert P.shape == (n, n)
        assert np.isfinite(P).all()
        assert P.min() >= -1e-8

    def test_translation_invariance(self, make, X):
        """Distance-based affinities must be unchanged by a global shift."""
        P1 = _dense_P(make(), X)
        P2 = _dense_P(make(), X + 100.0)
        assert np.abs(P1 - P2).max() < 5e-2 * max(P1.max(), 1e-9)

    def test_row_permutation_equivariance(self, make, X):
        perm = np.random.default_rng(0).permutation(X.shape[0])
        P1 = _dense_P(make(), X)
        P2 = _dense_P(make(), X[perm])
        assert np.abs(P1[np.ix_(perm, perm)] - P2).max() < 5e-3 * max(
            P1.max(), 1e-9
        )


class TestSEAInvariance:
    """SEA's dual-ascent trajectory is sensitive to f32 noise at finite
    tol, so its invariance tolerances are looser; the un-clamped kernel
    used to NaN outright past ~1000 steps (regression test)."""

    def test_long_run_stays_finite_and_converges(self, X):
        a = SymmetricEntropicAffinity(perplexity=12, max_iter=4000)
        P = _dense_P(a, X)
        assert np.isfinite(P).all()
        assert abs(P.sum() - 1.0) < 5e-3  # global mass (rows are P/n)

    def test_permutation_equivariance_loose(self, X):
        perm = np.random.default_rng(0).permutation(X.shape[0])
        P1 = _dense_P(SymmetricEntropicAffinity(perplexity=12, max_iter=4000), X)
        P2 = _dense_P(
            SymmetricEntropicAffinity(perplexity=12, max_iter=4000), X[perm]
        )
        assert np.abs(P1[np.ix_(perm, perm)] - P2).max() < 0.2 * P1.max()


class TestSymmetryContracts:
    @pytest.mark.parametrize(
        "make",
        [
            lambda: SymmetricEntropicAffinity(perplexity=12, max_iter=400),
            lambda: SinkhornAffinity(eps=1.0),
            lambda: DoublyStochasticQuadraticAffinity(eps=1.0, max_iter=400),
        ],
    )
    def test_symmetric(self, make, X):
        P = _dense_P(make(), X)
        assert np.abs(P - P.T).max() < 1e-4 * max(P.max(), 1e-9)


class TestMAGICContract:
    def test_row_stochastic_not_symmetric(self, X):
        """MAGIC symmetrizes by mean THEN row-normalizes: the result is a
        row-stochastic diffusion operator, not a symmetric matrix
        (reference: knn_normalized.py:221-244)."""
        P = _dense_P(MAGICAffinity(K=7), X)
        assert np.abs(P.sum(1) - 1.0).max() < 1e-4


class TestUMAPAffinityDepth:
    def test_fuzzy_union_bounds(self, X):
        vals, idx = UMAPAffinity(n_neighbors=10)(X, return_indices=True)
        v = np.asarray(vals)
        assert v.min() >= 0.0 and v.max() <= 1.0 + 1e-6  # fuzzy membership
        assert (np.asarray(idx) < X.shape[0]).all()

    def test_symmetrized_graph_is_symmetric(self, X):
        from torchdr_tpu.ops.sparse import sparse_to_dense

        vals, idx = UMAPAffinity(n_neighbors=10)(X, return_indices=True)
        D = np.asarray(sparse_to_dense(vals, idx, X.shape[0]))
        assert np.abs(D - D.T).max() < 1e-5

    def test_k_scaling(self, X):
        """More neighbors → wider support, never narrower."""
        _, idx1 = UMAPAffinity(n_neighbors=5)(X, return_indices=True)
        _, idx2 = UMAPAffinity(n_neighbors=20)(X, return_indices=True)
        deg1 = (np.asarray(idx1) >= 0).sum(1)
        deg2 = (np.asarray(idx2) >= 0).sum(1)
        assert deg2.mean() > deg1.mean()


class TestPACMAPAffinityDepth:
    def test_indices_only_and_rho_scaling(self, X):
        vals, idx = PACMAPAffinity(n_neighbors=8)(X, return_indices=True)
        idx = np.asarray(idx)
        assert idx.shape == (X.shape[0], 8)
        assert (idx >= 0).all() and (idx < X.shape[0]).all()
        # no self neighbors
        assert not (idx == np.arange(X.shape[0])[:, None]).any()


class TestPHATEAffinityDepth:
    def test_alpha_decay_and_t_steps(self, X):
        P1 = _dense_P(PHATEAffinity(k=6, t=2), X)
        P2 = _dense_P(PHATEAffinity(k=6, t=16), X)
        # potential distances stay finite and t changes the operator
        assert np.isfinite(P1).all() and np.isfinite(P2).all()
        assert np.abs(P1 - P2).max() > 1e-6

    def test_f32_stability_large_t(self, X):
        P = _dense_P(PHATEAffinity(k=6, t=150), X)
        assert np.isfinite(P).all()


class TestSelfTuningDepth:
    def test_local_bandwidth_adapts(self):
        rng = np.random.default_rng(0)
        dense = rng.normal(scale=0.05, size=(60, 4))
        sparse = np.array([10.0, 0, 0, 0]) + rng.normal(scale=2.0, size=(60, 4))
        Xd = np.concatenate([dense, sparse]).astype(np.float32)
        aff = SelfTuningAffinity(K=7)
        P = _dense_P(aff, Xd)
        # within-cluster affinities should be comparable across the two
        # densities (that's the point of per-point bandwidths)
        within_dense = P[:60, :60].sum(1).mean()
        within_sparse = P[60:, 60:].sum(1).mean()
        assert within_sparse > 0.1 * within_dense


class TestSolverKnobs:
    def test_sea_eps_square_variants_agree(self, X):
        P1 = _dense_P(
            SymmetricEntropicAffinity(perplexity=12, eps_square=True, max_iter=600), X
        )
        P2 = _dense_P(
            SymmetricEntropicAffinity(
                perplexity=12, eps_square=False, max_iter=1500, lr=5e-2
            ),
            X,
        )
        assert np.abs(P1 - P2).max() < 1e-1 * P1.max()

    def test_sinkhorn_eps_monotone_entropy(self, X):
        """Bigger eps → more diffuse (higher-entropy) plan."""

        def ent(P):
            P = P / P.sum()
            return -np.sum(P * np.log(P + 1e-30))

        P1 = _dense_P(SinkhornAffinity(eps=0.3), X)
        P2 = _dense_P(SinkhornAffinity(eps=3.0), X)
        assert ent(P2) > ent(P1)

    def test_quadratic_sparser_than_sinkhorn(self, X):
        """L2-regularized OT yields sparse plans; entropic yields dense."""
        Pq = _dense_P(DoublyStochasticQuadraticAffinity(eps=1.0, max_iter=500), X)
        Ps = _dense_P(SinkhornAffinity(eps=1.0), X)
        frac_zero_q = np.mean(Pq <= 1e-12)
        frac_zero_s = np.mean(Ps <= 1e-12)
        assert frac_zero_q > frac_zero_s


class TestDegenerateInputs:
    def test_duplicate_rows_entropic(self):
        rng = np.random.default_rng(0)
        X = rng.normal(size=(50, 6)).astype(np.float32)
        Xd = np.concatenate([X, X[:1] + 1e-9])  # near-duplicate pair
        P = _dense_P(EntropicAffinity(perplexity=8, sparsity=False), Xd)
        assert np.isfinite(P).all()

    def test_constant_feature_column(self, X):
        Xc = X.copy()
        Xc[:, 0] = 3.0
        P = _dense_P(NormalizedGaussianAffinity(sigma=1.0), Xc)
        assert np.isfinite(P).all()

    def test_single_cluster_tight(self):
        rng = np.random.default_rng(1)
        Xt = (rng.normal(size=(80, 5)) * 1e-3).astype(np.float32)
        P = _dense_P(EntropicAffinity(perplexity=10, sparsity=False), Xt)
        assert np.isfinite(P).all()
        assert np.abs(P.sum() - 1.0) < 1e-3  # global mass 1 (P/n rows)
