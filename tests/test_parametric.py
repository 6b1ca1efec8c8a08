"""Parametric (encoder) estimator tests (mirrors reference test_parametric.py)."""

import numpy as np
import pytest

import torchdr_tpu as tdr
from torchdr_tpu.utils.encoders import make_mlp_encoder


@pytest.fixture
def data():
    rng = np.random.default_rng(0)
    return rng.normal(size=(50, 10)).astype(np.float32)


class TestParametricTSNE:
    def test_fit_transform_shape(self, data):
        enc = make_mlp_encoder(2, (32,))
        model = tdr.TSNE(
            perplexity=5, max_iter=10, optimizer="Adam", lr=1e-3,
            encoder=enc, random_state=0,
        )
        Z = model.fit_transform(data)
        assert np.asarray(Z).shape == (50, 2)

    def test_transform_new_data(self, data):
        enc = make_mlp_encoder(2, (32,))
        model = tdr.TSNE(
            perplexity=5, max_iter=10, optimizer="Adam", lr=1e-3,
            encoder=enc, random_state=0,
        )
        model.fit_transform(data)
        out = model.transform(np.random.default_rng(1).normal(size=(5, 10)).astype(np.float32))
        assert np.asarray(out).shape == (5, 2)

    def test_encoder_output_dim_mismatch(self, data):
        enc = make_mlp_encoder(3, (16,))
        with pytest.raises(ValueError, match="n_components"):
            tdr.TSNE(perplexity=5, max_iter=5, encoder=enc, n_components=2).fit_transform(data)


class TestParametricUMAP:
    def test_closed_form_gradient_path(self, data):
        enc = make_mlp_encoder(2, (32,))
        model = tdr.UMAP(
            n_neighbors=5, max_iter=10, optimizer="Adam", lr=1e-3,
            encoder=enc, random_state=0,
        )
        Z = model.fit_transform(data)
        assert np.isfinite(np.asarray(Z)).all()
        out = model.transform(data[:3])
        assert np.asarray(out).shape == (3, 2)


class TestParametricLargeVis:
    def test_fit(self, data):
        enc = make_mlp_encoder(2, (16,))
        model = tdr.LargeVis(
            perplexity=5, max_iter=10, optimizer="Adam", lr=1e-3,
            encoder=enc, random_state=0,
        )
        Z = model.fit_transform(data)
        assert np.asarray(Z).shape == (50, 2)


class TestParametricDepth:
    """Contract depth: quality gate, fit/transform consistency,
    determinism, encoder checkpoint round-trip (reference:
    torchdr/tests/test_parametric.py:29-207)."""

    def _blobs(self, n=120, d=8):
        rng = np.random.default_rng(3)
        centers = rng.normal(scale=8.0, size=(3, d)).astype(np.float32)
        lab = np.repeat(np.arange(3), n // 3)
        X = centers[lab] + rng.normal(size=(n, d)).astype(np.float32)
        return X, lab

    def test_parametric_umap_quality(self):
        X, y = self._blobs()
        enc = make_mlp_encoder(2, (64,))
        Z = tdr.UMAP(
            n_neighbors=10, max_iter=300, optimizer="Adam", lr=1e-2,
            encoder=enc, random_state=0,
        ).fit_transform(X)
        assert float(tdr.silhouette_score(Z, y)) > 0.15

    def test_fit_embedding_is_encoder_output(self, data):
        """embedding_ must equal encoder(X) at the final weights — the
        parametric contract that transform(train) reproduces the fit."""
        enc = make_mlp_encoder(2, (16,))
        model = tdr.UMAP(
            n_neighbors=5, max_iter=10, optimizer="Adam", lr=1e-3,
            encoder=enc, random_state=0,
        )
        Z = np.asarray(model.fit_transform(data))
        Z2 = np.asarray(model.transform(data))
        assert np.allclose(Z, Z2, atol=1e-5)

    def test_seed_determinism(self, data):
        def run():
            enc = make_mlp_encoder(2, (16,))
            return np.asarray(
                tdr.TSNE(
                    perplexity=5, max_iter=10, optimizer="Adam", lr=1e-3,
                    encoder=enc, random_state=7,
                ).fit_transform(data)
            )

        assert np.allclose(run(), run(), atol=1e-6)

    def test_encoder_checkpoint_roundtrip(self, data, tmp_path):
        from torchdr_tpu.utils.checkpoint import load_estimator, save_estimator

        enc = make_mlp_encoder(2, (16,))
        model = tdr.UMAP(
            n_neighbors=5, max_iter=10, optimizer="Adam", lr=1e-3,
            encoder=enc, random_state=0,
        )
        model.fit_transform(data)
        ref = np.asarray(model.transform(data[:7]))
        save_estimator(model, str(tmp_path / "pumap"))

        enc2 = make_mlp_encoder(2, (16,))
        fresh = tdr.UMAP(
            n_neighbors=5, max_iter=10, optimizer="Adam", lr=1e-3,
            encoder=enc2, random_state=0,
        )
        load_estimator(fresh, str(tmp_path / "pumap"))
        out = np.asarray(fresh.transform(data[:7]))
        assert np.allclose(out, ref, atol=1e-5)
