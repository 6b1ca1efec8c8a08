"""Smoke tier: every estimator + every parallel path, tiny shapes.

Run with ``pytest -m smoke`` (< 3 min on 1 CPU). This is the fast gate the
full suite is too slow for on a 1-CPU box (the reference's CI-vs-nightly
split, SURVEY.md §4); the slow quality gates stay in the per-feature test
modules. Everything here asserts SHAPE/FINITENESS/WIRING, not embedding
quality — quality belongs to the slow tier.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import torchdr_tpu as tdr

pytestmark = pytest.mark.smoke


@pytest.fixture(scope="module")
def tiny():
    rng = np.random.default_rng(0)
    centers = rng.normal(scale=8.0, size=(4, 12)).astype(np.float32)
    lab = rng.integers(0, 4, 240)
    X = (centers[lab] + rng.normal(size=(240, 12))).astype(np.float32)
    return X, lab


@pytest.fixture(scope="module")
def mesh():
    from torchdr_tpu.parallel import make_mesh

    return make_mesh()


def _fits(model, X, n=240, d=2):
    Z = np.asarray(model.fit_transform(X))
    assert Z.shape == (n, d)
    assert np.isfinite(Z).all()
    return Z


NE_MODELS = {
    "UMAP": lambda: tdr.UMAP(n_neighbors=8, max_iter=25, random_state=0),
    "TSNE": lambda: tdr.TSNE(perplexity=12, max_iter=25, random_state=0),
    "SNE": lambda: tdr.SNE(perplexity=12, max_iter=25, random_state=0),
    "LargeVis": lambda: tdr.LargeVis(n_neighbors=8, max_iter=25, random_state=0),
    "InfoTSNE": lambda: tdr.InfoTSNE(perplexity=12, max_iter=25,
                                     n_negatives=50, random_state=0),
    "TSNEkhorn": lambda: tdr.TSNEkhorn(perplexity=12, max_iter=25, lr=1e-1,
                                       random_state=0),
    "PACMAP": lambda: tdr.PACMAP(n_neighbors=8, max_iter=30, iter_per_phase=10,
                                 random_state=0),
    "COSNE": lambda: tdr.COSNE(perplexity=12, max_iter=25, lr=1e-1,
                               random_state=0),
}


@pytest.mark.parametrize("name", sorted(NE_MODELS))
def test_neighbor_estimator(tiny, name):
    X, _ = tiny
    _fits(NE_MODELS[name](), X)


SPECTRAL_MODELS = {
    "PCA": lambda: tdr.PCA(n_components=2, random_state=0),
    "IncrementalPCA": lambda: tdr.IncrementalPCA(n_components=2,
                                                 batch_size=64),
    "ExactIncrementalPCA": lambda: tdr.ExactIncrementalPCA(n_components=2,
                                                           batch_size=64),
    "KernelPCA": lambda: tdr.KernelPCA(n_components=2, random_state=0),
    "PHATE": lambda: tdr.PHATE(n_components=2, k=6, t=5, max_iter=25,
                               random_state=0),
}


@pytest.mark.parametrize("name", sorted(SPECTRAL_MODELS))
def test_spectral_estimator(tiny, name):
    X, _ = tiny
    _fits(SPECTRAL_MODELS[name](), X)


def test_knn_tiers(tiny):
    X, _ = tiny
    d0, i0 = tdr.knn_graph(X, k=6)
    d1, i1 = tdr.knn_graph(X, k=6, mode="approx")
    d2, i2 = tdr.ivf_knn(X, k=6, nprobe=4, n_clusters=8)
    for d, i in ((d0, i0), (d1, i1), (d2, i2)):
        assert i.shape == (240, 6)
        assert np.isfinite(np.asarray(d)).all()
    idx8 = tdr.ivf_knn(X, k=6, nprobe=4, n_clusters=8, storage="int8")
    assert idx8[1].shape == (240, 6)


def test_eval_suite(tiny):
    X, lab = tiny
    Z = np.asarray(tdr.PCA(n_components=2).fit_transform(X))
    assert np.isfinite(float(tdr.silhouette_score(Z, lab)))
    assert 0 <= float(tdr.knn_label_accuracy(Z, lab, k=5)) <= 1
    assert 0 <= float(tdr.neighborhood_preservation(X, Z, K=5)) <= 1
    ari, _ = tdr.kmeans_ari(Z, lab, n_clusters=4)
    assert np.isfinite(float(ari))


# --- parallel paths (8-virtual-device CPU mesh, real collectives) ---


def test_parallel_sharded_knn(tiny, mesh):
    from torchdr_tpu.parallel import knn_graph_ring, knn_graph_sharded

    X, _ = tiny
    _, i_ring = knn_graph_ring(X, 6, mesh)
    _, i_sh = knn_graph_sharded(X, 6, mesh)
    assert i_ring.shape == (240, 6) and i_sh.shape == (240, 6)


def test_parallel_ivf(tiny, mesh):
    from torchdr_tpu.parallel.ivf import ivf_knn_sharded

    X, _ = tiny
    _, ids = ivf_knn_sharded(X, mesh, k=6, nprobe=4, n_clusters=8)
    assert ids.shape == (240, 6)


def test_parallel_fit_umap(tiny, mesh):
    X, _ = tiny
    m = tdr.UMAP(n_neighbors=8, max_iter=25, random_state=0,
                 distributed=True, mesh=mesh)
    _fits(m, X)


def test_parallel_fit_largevis(tiny, mesh):
    X, _ = tiny
    m = tdr.LargeVis(n_neighbors=8, max_iter=25, random_state=0,
                     distributed=True, mesh=mesh)
    _fits(m, X)


def test_parallel_eval(tiny, mesh):
    X, lab = tiny
    Z = np.asarray(tdr.PCA(n_components=2).fit_transform(X))
    a = float(tdr.knn_label_accuracy(Z, lab, k=5, mesh=mesh))
    b = float(tdr.knn_label_accuracy(Z, lab, k=5))
    assert abs(a - b) < 1e-6


def test_parallel_eipca(tiny, mesh):
    X, _ = tiny
    m = tdr.ExactIncrementalPCA(n_components=2, batch_size=64)
    m._set_fit_mesh(mesh)
    _fits(m, X)


def test_parallel_sparse_symmetrize(tiny, mesh):
    from torchdr_tpu.parallel.sparse import distributed_symmetrize_sparse
    from torchdr_tpu.ops.sparse import symmetrize_sparse

    X, _ = tiny
    d, i = tdr.knn_graph(X, k=6)
    P = jnp.exp(-jnp.asarray(d))
    v1, i1 = symmetrize_sparse(P, jnp.asarray(i))
    v2, i2 = distributed_symmetrize_sparse(P, jnp.asarray(i), mesh)
    # same edge set regardless of path
    s1 = {(r, int(c)) for r, row in enumerate(np.asarray(i1)) for c in row if c >= 0}
    s2 = {(r, int(c)) for r, row in enumerate(np.asarray(i2)) for c in row if c >= 0}
    assert s1 == s2


def test_streaming_tier(tiny):
    from torchdr_tpu.ops import knn_graph_from_batches

    X, _ = tiny
    batches = [X[a:a + 60] for a in range(0, 240, 60)]
    d, i = knn_graph_from_batches(batches, k=6)
    assert i.shape == (240, 6)


def test_parametric_encoder(tiny):
    from torchdr_tpu.utils.encoders import make_mlp_encoder

    X, _ = tiny
    enc = make_mlp_encoder(2, hidden=(16,))
    m = tdr.UMAP(n_neighbors=8, max_iter=25, random_state=0, encoder=enc,
                 optimizer="Adam", lr=1e-3)
    m.fit(X)
    Z = np.asarray(m.transform(X[:50]))
    assert Z.shape == (50, 2) and np.isfinite(Z).all()
