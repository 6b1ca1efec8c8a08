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
