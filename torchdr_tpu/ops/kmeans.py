"""K-means clustering (Lloyd's algorithm), k-means++ init.

From-scratch replacement for the reference's Faiss KMeans dependency
(reference: torchdr/eval/kmeans.py:13-177). Each Lloyd iteration is one
MXU distance matmul + a segment mean, in a ``lax.while_loop`` with an
inertia-based convergence check. Fully jit-compatible; shard rows over a
mesh for multi-chip.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax import lax

from .metrics import sq_dists_from_gram


def _assign(X, x_norm, centers):
    c_norm = jnp.sum(centers * centers, axis=-1)
    # HIGH (3-pass bf16): assignment only needs argmin rank fidelity, and
    # points near a cell boundary are interchangeable for clustering — the
    # 2x MXU saving matters at IVF-build scale (e.g. 0.5M x 8k centroids)
    gram = jnp.matmul(
        X, centers.T, preferred_element_type=jnp.float32,
        precision=lax.Precision.HIGH,
    )
    D = sq_dists_from_gram(x_norm, c_norm, gram)
    labels = jnp.argmin(D, axis=1)
    inertia = jnp.sum(jnp.min(D, axis=1))
    return labels, inertia


def _plus_plus_init(X, x_norm, n_clusters, key):
    """k-means++ seeding: greedy D²-weighted sampling."""
    n = X.shape[0]
    first = jax.random.randint(key, (), 0, n)
    centers0 = jnp.zeros((n_clusters, X.shape[1]), X.dtype).at[0].set(X[first])
    d2_0 = jnp.sum((X - X[first]) ** 2, axis=1)

    def body(i, carry):
        centers, d2, key = carry
        key, sub = jax.random.split(key)
        probs = d2 / jnp.maximum(jnp.sum(d2), 1e-12)
        idx = jax.random.choice(sub, n, p=probs)
        centers = centers.at[i].set(X[idx])
        d2 = jnp.minimum(d2, jnp.sum((X - X[idx]) ** 2, axis=1))
        return centers, d2, key

    centers, _, _ = lax.fori_loop(1, n_clusters, body, (centers0, d2_0, key))
    return centers


@functools.partial(jax.jit, static_argnames=("n_clusters", "max_iter", "init"))
def kmeans_fit(
    X: jnp.ndarray,
    n_clusters: int,
    key: jax.Array,
    max_iter: int = 100,
    tol: float = 1e-4,
    init: str = "++",
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Run k-means; returns (centers, labels, inertia).

    ``init='++'`` is k-means++ (quality default); ``init='random'`` seeds
    from a uniform row sample — the Faiss coarse-quantizer convention,
    and much cheaper when n_clusters is in the thousands (++ is a
    sequential n_clusters-step loop).
    """
    if X.shape[0] < n_clusters:
        raise ValueError(
            f"[TorchDR-TPU] ERROR : kmeans_fit needs n >= n_clusters "
            f"({X.shape[0]} < {n_clusters})."
        )
    x_norm = jnp.sum(X * X, axis=-1)
    if init == "random":
        n = X.shape[0]
        # distinct rows without a full permutation: stride the row space
        # from a random offset (rows have no meaningful order)
        stride = max(1, n // n_clusters)
        start = jax.random.randint(key, (), 0, jnp.asarray(stride))
        centers0 = X[start + stride * jnp.arange(n_clusters)]
    else:
        centers0 = _plus_plus_init(X, x_norm, n_clusters, key)

    def cond(carry):
        it, centers, labels, prev_inertia, inertia = carry
        return jnp.logical_and(
            it < max_iter, jnp.abs(prev_inertia - inertia) > tol * jnp.abs(inertia)
        )

    def body(carry):
        it, centers, labels, _, inertia = carry
        # centroid update via scatter-add segment sums: the one-hot matmul
        # form materializes an (n, n_clusters) f32 block — 17 GB at the
        # 0.5M x 8k IVF-build scale. One assignment pass per iteration:
        # labels ride the carry from the previous assign.
        counts = jnp.zeros((n_clusters,), jnp.float32).at[labels].add(1.0)
        sums = jnp.zeros((n_clusters, X.shape[1]), jnp.float32).at[labels].add(X)
        new_centers = jnp.where(
            counts[:, None] > 0, sums / jnp.maximum(counts, 1.0)[:, None], centers
        )
        new_labels, new_inertia = _assign(X, x_norm, new_centers)
        return it + 1, new_centers, new_labels, inertia, new_inertia

    labels0, init_inertia = _assign(X, x_norm, centers0)
    _, centers, labels, _, inertia = lax.while_loop(
        cond, body, (0, centers0, labels0, jnp.inf, init_inertia)
    )
    return centers, labels, inertia
