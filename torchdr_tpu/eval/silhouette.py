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


@functools.partial(jax.jit, static_argnames=("metric", "n_clusters"))
def _silhouette_samples(X, labels, weights, metric: str, n_clusters: int):
    n = X.shape[0]
    C = pairwise_block(X, X, metric)
    onehot = (labels[None, :] == jnp.arange(n_clusters)[:, None]).astype(C.dtype)  # (c, n)
    w = weights if weights is not None else jnp.ones((n,), C.dtype)
    wc = onehot * w[None, :]
    cluster_mass = jnp.sum(wc, axis=1)  # (c,)
    # sum of distances from each point to each cluster: (n, c)
    dist_to_cluster = jnp.matmul(C, wc.T, preferred_element_type=jnp.float32)
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
