"""API conformance tests (mirrors reference test_estimators.py scope)."""

import numpy as np
import pytest

import torchdr_tpu as tdr

ALL_ESTIMATORS = [
    lambda: tdr.TSNE(perplexity=5, max_iter=5),
    lambda: tdr.SNE(perplexity=5, max_iter=5),
    lambda: tdr.UMAP(n_neighbors=5, max_iter=5),
    lambda: tdr.LargeVis(perplexity=5, max_iter=5),
    lambda: tdr.InfoTSNE(perplexity=5, n_negatives=10, max_iter=5),
    lambda: tdr.TSNEkhorn(perplexity=5, max_iter=5, lr=1e-1),
    lambda: tdr.PACMAP(n_neighbors=5, max_iter=5),
    lambda: tdr.COSNE(perplexity=5, max_iter=5, lr=1e-1),
    lambda: tdr.PCA(),
    lambda: tdr.IncrementalPCA(),
    lambda: tdr.ExactIncrementalPCA(),
    lambda: tdr.KernelPCA(),
    lambda: tdr.PHATE(k=3, t=5, max_iter=5),
]


@pytest.fixture(scope="module")
def X():
    rng = np.random.default_rng(0)
    return rng.normal(size=(40, 6)).astype(np.float32)


@pytest.mark.parametrize("make", ALL_ESTIMATORS)
class TestSklearnConformance:
    def test_get_set_params_roundtrip(self, make, X):
        model = make()
        params = model.get_params()
        assert isinstance(params, dict) and len(params) > 0
        model.set_params(**{k: v for k, v in params.items()})

    def test_fit_returns_self_and_sets_embedding(self, make, X):
        model = make()
        out = model.fit(X)
        assert out is model
        assert model.is_fitted_
        assert np.asarray(model.transform()).shape[0] == X.shape[0]

    def test_unfitted_transform_raises(self, make, X):
        model = make()
        with pytest.raises(ValueError, match="not fitted"):
            model.transform()

    def test_repr(self, make, X):
        assert type(make()).__name__ in repr(make())


class TestPrecomputedAffinity:
    def test_precomputed_path(self, X):
        from torchdr_tpu import AffinityMatcher, NormalizedStudentAffinity

        n = X.shape[0]
        P = np.abs(np.random.default_rng(0).normal(size=(n, n))).astype(np.float32)
        P = (P + P.T) / P.sum()
        model = AffinityMatcher(
            affinity_in="precomputed",
            affinity_out=NormalizedStudentAffinity(),
            loss_fn="cross_entropy_loss",
            max_iter=10,
            random_state=0,
        )
        Z = model.fit_transform(P)
        assert np.asarray(Z).shape == (n, 2)

    def test_precomputed_must_be_square(self, X):
        from torchdr_tpu import AffinityMatcher, NormalizedStudentAffinity

        model = AffinityMatcher(
            affinity_in="precomputed", affinity_out=NormalizedStudentAffinity(), max_iter=5
        )
        with pytest.raises(ValueError, match="n_samples"):
            model.fit_transform(X)

    def test_negative_precomputed_rejected(self):
        from torchdr_tpu import AffinityMatcher, NormalizedStudentAffinity

        P = -np.ones((10, 10), np.float32)
        model = AffinityMatcher(
            affinity_in="precomputed", affinity_out=NormalizedStudentAffinity(), max_iter=5
        )
        with pytest.raises(ValueError, match="negative"):
            model.fit_transform(P)


class TestCheckpoint:
    def test_save_load_roundtrip(self, X, tmp_path):
        from torchdr_tpu.utils.checkpoint import load_estimator, save_estimator

        model = tdr.PCA(n_components=3)
        Z = model.fit_transform(X)
        save_estimator(model, str(tmp_path / "pca"))
        model2 = tdr.PCA(n_components=3)
        load_estimator(model2, str(tmp_path / "pca"))
        Z2 = model2.transform(X)
        assert np.allclose(np.asarray(Z), np.asarray(Z2), atol=1e-5)

    def test_class_mismatch_raises(self, X, tmp_path):
        from torchdr_tpu.utils.checkpoint import load_estimator, save_estimator

        model = tdr.PCA().fit(X)
        save_estimator(model, str(tmp_path / "m"))
        with pytest.raises(ValueError, match="checkpoint"):
            load_estimator(tdr.KernelPCA(), str(tmp_path / "m"))


@pytest.mark.parametrize("make", ALL_ESTIMATORS)
class TestCloneAndDeterminism:
    def test_clone_from_params_refits(self, make, X):
        """sklearn clone contract: a new instance built from get_params()
        behaves like the original (reference: test_estimators.py:96)."""
        model = make()
        clone = type(model)(**model.get_params())
        Z1 = np.asarray(model.fit_transform(X))
        Z2 = np.asarray(clone.fit_transform(X))
        assert Z1.shape == Z2.shape
        assert np.isfinite(Z2).all()

    def test_same_seed_same_embedding(self, make, X):
        model = make()
        if "random_state" not in model.get_params():
            pytest.skip("no seed param")
        model.set_params(random_state=0)
        Z1 = np.asarray(model.fit_transform(X))
        model2 = type(model)(**model.get_params())
        Z2 = np.asarray(model2.fit_transform(X))
        assert np.allclose(Z1, Z2, atol=1e-5)


class TestFormatRoundTrip:
    def test_torch_input_returns_torch(self):
        import torch

        X = torch.randn(40, 6)
        Z = tdr.PCA(n_components=2).fit_transform(X)
        assert isinstance(Z, torch.Tensor) and Z.shape == (40, 2)

    def test_numpy_input_returns_numpy(self):
        X = np.random.default_rng(0).normal(size=(40, 6)).astype(np.float32)
        Z = tdr.UMAP(n_neighbors=5, max_iter=10, random_state=0).fit_transform(X)
        assert isinstance(Z, np.ndarray)

    def test_float64_numpy_accepted(self):
        X = np.random.default_rng(0).normal(size=(40, 6))
        Z = tdr.PCA(n_components=2).fit_transform(X)
        assert np.isfinite(np.asarray(Z)).all()
