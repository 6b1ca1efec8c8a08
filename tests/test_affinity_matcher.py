"""Engine unit tests (mirrors reference test_affinity_matcher.py:15-385)."""

import jax.numpy as jnp
import numpy as np
import pytest

import torchdr_tpu as tdr
from torchdr_tpu import AffinityMatcher, NormalizedGaussianAffinity, NormalizedStudentAffinity


@pytest.fixture
def X():
    rng = np.random.default_rng(0)
    return rng.normal(size=(60, 5)).astype(np.float32)


class TestValidationErrors:
    def test_invalid_loss(self, X):
        with pytest.raises(ValueError, match="Loss function"):
            AffinityMatcher(
                affinity_in=NormalizedGaussianAffinity(), loss_fn="bogus_loss"
            )

    def test_invalid_affinity_in(self, X):
        with pytest.raises(ValueError, match="affinity_in"):
            AffinityMatcher(affinity_in="not_precomputed")

    def test_invalid_affinity_out(self, X):
        with pytest.raises(ValueError, match="affinity_out"):
            AffinityMatcher(
                affinity_in=NormalizedGaussianAffinity(), affinity_out="bogus"
            )

    def test_missing_affinity_out_and_loss(self, X):
        model = AffinityMatcher(
            affinity_in=NormalizedGaussianAffinity(), max_iter=3
        )
        with pytest.raises(ValueError, match="affinity_out is not set"):
            model.fit_transform(X)

    def test_invalid_scheduler(self, X):
        model = AffinityMatcher(
            affinity_in=NormalizedGaussianAffinity(),
            affinity_out=NormalizedStudentAffinity(),
            scheduler="Bogus",
            max_iter=3,
        )
        with pytest.raises(ValueError, match="Scheduler"):
            model.fit_transform(X)


class TestGenericMatching:
    def test_square_loss_path(self, X):
        model = AffinityMatcher(
            affinity_in=NormalizedGaussianAffinity(),
            affinity_out=NormalizedStudentAffinity(),
            loss_fn="square_loss",
            max_iter=20,
            random_state=0,
        )
        Z = model.fit_transform(X)
        assert np.asarray(Z).shape == (60, 2)

    def test_cross_entropy_log_domain(self, X):
        model = AffinityMatcher(
            affinity_in=NormalizedGaussianAffinity(),
            affinity_out=NormalizedStudentAffinity(),
            loss_fn="cross_entropy_loss",
            max_iter=20,
            random_state=0,
        )
        Z = model.fit_transform(X)
        assert np.isfinite(np.asarray(Z)).all()

    def test_custom_loss_subclass(self, X):
        class Custom(AffinityMatcher):
            def _loss(self, Z, consts, carry, it, key, ee_coeff):
                D = jnp.sum((Z[:, None] - Z[None]) ** 2, -1)
                return jnp.sum((consts["P"] - 1.0 / (1.0 + D)) ** 2), carry

        model = Custom(
            affinity_in=NormalizedGaussianAffinity(), max_iter=10, random_state=0
        )
        Z = model.fit_transform(X)
        assert np.asarray(Z).shape == (60, 2)

    def test_convergence_short_circuit(self, X):
        # huge min_grad_norm → stop at first check interval
        model = AffinityMatcher(
            affinity_in=NormalizedGaussianAffinity(),
            affinity_out=NormalizedStudentAffinity(),
            min_grad_norm=1e12,
            check_interval=1,
            max_iter=500,
            random_state=0,
        )
        model.fit_transform(X)
        assert model.n_iter_ < 5

    def test_tensor_init(self, X):
        init = np.random.default_rng(1).normal(size=(60, 2)).astype(np.float32)
        model = AffinityMatcher(
            affinity_in=NormalizedGaussianAffinity(),
            affinity_out=NormalizedStudentAffinity(),
            init=init,
            max_iter=5,
            random_state=0,
        )
        Z = model.fit_transform(X)
        assert np.asarray(Z).shape == (60, 2)

    def test_n_iter_reported(self, X):
        model = AffinityMatcher(
            affinity_in=NormalizedGaussianAffinity(),
            affinity_out=NormalizedStudentAffinity(),
            max_iter=17,
            min_grad_norm=0.0,  # disable convergence short-circuit
            random_state=0,
        )
        model.fit_transform(X)
        assert model.n_iter_ == 17


class TestHooks:
    def test_lifecycle_hooks_called(self, X):
        calls = []

        class Hooked(AffinityMatcher):
            def on_affinity_computation_start(self):
                calls.append("aff_start")

            def on_affinity_computation_end(self):
                calls.append("aff_end")

        model = Hooked(
            affinity_in=NormalizedGaussianAffinity(),
            affinity_out=NormalizedStudentAffinity(),
            max_iter=3,
            random_state=0,
        )
        model.fit_transform(X)
        assert calls == ["aff_start", "aff_end"]


class TestSchedulersInFit:
    @pytest.mark.parametrize("sched", ["LinearLR", "ExponentialLR", "CosineAnnealingLR", "ConstantLR"])
    def test_all_schedulers_run(self, X, sched):
        model = AffinityMatcher(
            affinity_in=NormalizedGaussianAffinity(),
            affinity_out=NormalizedStudentAffinity(),
            scheduler=sched,
            max_iter=10,
            random_state=0,
        )
        Z = model.fit_transform(X)
        assert np.isfinite(np.asarray(Z)).all()

    @pytest.mark.parametrize("opt", ["SGD", "Adam", "AdamW", "NAdam"])
    def test_all_optimizers_run(self, X, opt):
        model = AffinityMatcher(
            affinity_in=NormalizedGaussianAffinity(),
            affinity_out=NormalizedStudentAffinity(),
            optimizer=opt,
            lr=1e-2,
            max_iter=10,
            random_state=0,
        )
        Z = model.fit_transform(X)
        assert np.isfinite(np.asarray(Z)).all()


class TestCustomAffinityExtension:
    """User-defined Affinity subclass through the engine — the pattern in
    examples/basics/demo_pca_via_affinity_matcher.py (reference demo:
    examples/basics/demo_pca_via_affinity_matcher.py)."""

    def test_scalar_product_affinity_recovers_pca_subspace(self, X):
        from torchdr_tpu.affinity import Affinity

        class ScalarProductAffinity(Affinity):
            def __init__(self):
                super().__init__(zero_diag=False)

            def _compute_affinity(self, Xa, **kwargs):
                return Xa @ Xa.T

        Xc = X - X.mean(axis=0)
        Z_pca = np.asarray(tdr.PCA(n_components=2, random_state=0).fit_transform(Xc))
        model = AffinityMatcher(
            affinity_in=ScalarProductAffinity(),
            affinity_out=ScalarProductAffinity(),
            loss_fn="square_loss",
            init="normal",
            lr=1e1,
            # The iid-normal fixture has a small PC2/PC3 eigen-gap
            # (67.6 vs 63.5), so subspace convergence needs the longer run.
            max_iter=3000,
            random_state=0,
        )
        Z_am = np.asarray(model.fit_transform(Xc))

        Qa, _ = np.linalg.qr(Z_pca)
        Qb, _ = np.linalg.qr(Z_am)
        s = np.linalg.svd(Qa.T @ Qb, compute_uv=False)
        assert s.mean() > 0.99
