"""Silhouette score / samples.

TPU-native silhouette (reference: torchdr/eval/silhouette.py:21-262).
Single fused implementation: one pairwise-distance pass, per-cluster mean
distances via a one-hot matmul (MXU) instead of per-cluster Python loops.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

from ..ops.metrics import pairwise_block
from ..utils.wrappers import to_jax


@functools.partial(
    jax.jit, static_argnames=("metric", "n_clusters", "block_size")
)
def _silhouette_samples(
    X, labels, weights, metric: str, n_clusters: int, block_size: int = 4096
):
    n = X.shape[0]
    onehot = (labels[None, :] == jnp.arange(n_clusters)[:, None]).astype(X.dtype)  # (c, n)
    w = weights if weights is not None else jnp.ones((n,), X.dtype)
    wc = onehot * w[None, :]
    cluster_mass = jnp.sum(wc, axis=1)  # (c,)

    # Per-point summed distance to each cluster, streamed in row blocks so
    # the n×n matrix never materializes (the reference iterates per-cluster
    # blocks instead, torchdr/eval/silhouette.py:21-200; one matmul per row
    # block is the MXU-friendly form).
    if n <= block_size:
        C = pairwise_block(X, X, metric)
        dist_to_cluster = jnp.matmul(C, wc.T, preferred_element_type=jnp.float32)
    else:
        from jax import lax

        block = block_size
        n_pad = -(-n // block) * block
        Xp = jnp.zeros((n_pad, X.shape[1]), X.dtype).at[:n].set(X)

        def process(b):
            Xb = lax.dynamic_slice_in_dim(Xp, b * block, block, axis=0)
            Cb = pairwise_block(Xb, X, metric)
            return jnp.matmul(Cb, wc.T, preferred_element_type=jnp.float32)

        dist_to_cluster = lax.map(process, jnp.arange(n_pad // block)).reshape(
            n_pad, n_clusters
        )[:n]
    own = labels  # (n,)
    own_mass = cluster_mass[own]
    own_weight = w
    # intra: exclude self (distance 0 contributes nothing but mass counts)
    intra_denom = jnp.maximum(own_mass - own_weight, 1e-12)
    a = dist_to_cluster[jnp.arange(n), own] / intra_denom
    mean_other = dist_to_cluster / jnp.maximum(cluster_mass[None, :], 1e-12)
    mean_other = jnp.where(
        jnp.arange(n_clusters)[None, :] == own[:, None], jnp.inf, mean_other
    )
    b = jnp.min(mean_other, axis=1)
    sil = (b - a) / jnp.maximum(jnp.maximum(a, b), 1e-12)
    # single-member clusters get 0 by convention
    return jnp.where(own_mass - own_weight <= 0, 0.0, sil)


def silhouette_samples(
    X, labels, weights=None, metric: str = "sqeuclidean", device: str = "auto"
):
    """Per-sample silhouette coefficients."""
    X, _ = to_jax(X)
    labels = jnp.asarray(labels)
    uniq, inv = jnp.unique(jnp.asarray(labels), return_inverse=True)
    if int(uniq.shape[0]) < 2:
        raise ValueError(
            "[TorchDR-TPU] ERROR : silhouette requires at least 2 labels "
            f"(got {int(uniq.shape[0])})."
        )
    w = None if weights is None else jnp.asarray(weights, X.dtype)
    return _silhouette_samples(X, inv.reshape(-1), w, metric, int(uniq.shape[0]))


def silhouette_score(
    X, labels, weights=None, metric: str = "sqeuclidean", device: str = "auto", sample_size: Optional[int] = None, random_state: Optional[int] = None
):
    """Mean silhouette coefficient (optionally on a subsample)."""
    X, _ = to_jax(X)
    labels = jnp.asarray(labels)
    if sample_size is not None and sample_size < X.shape[0]:
        key = jax.random.PRNGKey(random_state or 0)
        idx = jax.random.choice(key, X.shape[0], (sample_size,), replace=False)
        X, labels = X[idx], labels[idx]
        if weights is not None:
            weights = jnp.asarray(weights)[idx]
    return float(jnp.mean(silhouette_samples(X, labels, weights, metric)))
