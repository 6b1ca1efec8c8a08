"""k-means (the Faiss KMeans replacement) — quality and contract tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from torchdr_tpu.ops.kmeans import kmeans_fit


def blobs(n=600, k=6, d=8, seed=0, scale=10.0):
    rng = np.random.default_rng(seed)
    centers = rng.normal(scale=scale, size=(k, d)).astype(np.float32)
    lab = rng.integers(0, k, n)
    return (
        jnp.asarray(centers[lab] + rng.normal(size=(n, d)).astype(np.float32)),
        lab,
        centers,
    )


class TestKMeans:
    def test_recovers_separated_centers(self):
        X, lab, centers = blobs()
        cen, labels, inertia = kmeans_fit(X, 6, jax.random.PRNGKey(0), max_iter=50)
        # every true center has a learned center within noise distance
        d = np.linalg.norm(
            np.asarray(cen)[None, :, :] - centers[:, None, :], axis=-1
        ).min(axis=1)
        assert d.max() < 1.5

    def test_labels_match_partition(self):
        X, lab, _ = blobs()
        _, labels, _ = kmeans_fit(X, 6, jax.random.PRNGKey(0), max_iter=50)
        labels = np.asarray(labels)
        from sklearn.metrics import adjusted_rand_score

        assert adjusted_rand_score(lab, labels) > 0.99

    def test_inertia_decreases_with_k(self):
        X, _, _ = blobs()
        inertias = []
        for k in (2, 4, 8):
            _, _, inertia = kmeans_fit(X, k, jax.random.PRNGKey(0), max_iter=50)
            inertias.append(float(inertia))
        assert inertias[0] > inertias[1] > inertias[2]

    def test_deterministic_given_key(self):
        X, _, _ = blobs()
        c1, l1, _ = kmeans_fit(X, 5, jax.random.PRNGKey(3), max_iter=30)
        c2, l2, _ = kmeans_fit(X, 5, jax.random.PRNGKey(3), max_iter=30)
        assert np.array_equal(np.asarray(l1), np.asarray(l2))
        assert np.allclose(np.asarray(c1), np.asarray(c2))

    def test_k_equals_n(self):
        X = jax.random.normal(jax.random.PRNGKey(0), (16, 4))
        cen, labels, inertia = kmeans_fit(X, 16, jax.random.PRNGKey(0), max_iter=10)
        assert float(inertia) < 1e-3  # every point its own center

    def test_more_clusters_than_modes_no_nan(self):
        X, _, _ = blobs(k=3)
        cen, labels, _ = kmeans_fit(X, 24, jax.random.PRNGKey(1), max_iter=30)
        assert bool(jnp.isfinite(cen).all())

    def test_random_init_usable_in_coarse_regime(self):
        """init='random' is the coarse-quantizer path (ivf_build uses it at
        nlist >= 2048, where ++'s sequential seeding loop dominates build
        time). Its regime is n_clusters >> data modes: random rows seed
        proportionally to mass, so inertia lands near ++'s. (At small k it
        can merge blob pairs — which is why small-k builds keep ++.)"""
        X, lab, _ = blobs(n=2000, k=6)
        _, labels, inertia = kmeans_fit(
            X, 64, jax.random.PRNGKey(0), max_iter=40, init="random"
        )
        _, _, inertia_pp = kmeans_fit(
            X, 64, jax.random.PRNGKey(0), max_iter=40, init="++"
        )
        assert float(inertia) < 1.5 * float(inertia_pp)
        # quantizer cells are coherent: points of one blob share cells
        from sklearn.metrics import homogeneity_score

        # (true classes, predicted cells): each cell holds a single blob
        assert homogeneity_score(lab, np.asarray(labels)) > 0.95

    def test_random_init_centers_are_rows(self):
        X, _, _ = blobs(n=64)
        cen, _, _ = kmeans_fit(X, 8, jax.random.PRNGKey(2), max_iter=0, init="random")
        Xn = np.asarray(X)
        for c in np.asarray(cen):
            assert np.min(np.linalg.norm(Xn - c, axis=1)) < 1e-6
