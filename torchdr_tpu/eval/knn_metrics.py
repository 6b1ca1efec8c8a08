"""kNN-based evaluation metrics.

TPU-native counterparts of the reference's eval package
(reference: torchdr/eval/knn_labels.py:17-196,
torchdr/eval/neighborhood_preservation.py:17-187). Both run on the
from-scratch kNN graph (ops/distance.py) — no Faiss. Pass ``mesh`` for the
distributed per-chunk variant (reference: eval/knn_labels.py:54-64,
eval/neighborhood_preservation.py:51-62): the kNN build row-shards the
queries over the mesh via shard_map and the per-sample scores stay
row-sharded until the final mean — no gather of the full graph.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..ops.distance import knn_graph
from ..utils.wrappers import to_jax


def _knn_indices(X, k, metric, exclude_diag, mesh):
    if mesh is not None:
        from ..parallel.knn import knn_graph_sharded

        _, idx = knn_graph_sharded(
            X, k, mesh, metric=metric, exclude_diag=exclude_diag
        )
        return idx
    _, idx = knn_graph(X, k=k, metric=metric, exclude_diag=exclude_diag)
    return idx


def knn_label_accuracy(
    X,
    labels,
    k: int = 10,
    metric: str = "euclidean",
    exclude_self: bool = True,
    return_per_sample: bool = False,
    mesh=None,
):
    """Fraction of each point's k nearest neighbors sharing its label."""
    X, _ = to_jax(X)
    labels = jnp.asarray(labels)
    idx = _knn_indices(X, k, metric, exclude_self, mesh)
    same = (labels[idx] == labels[:, None]).astype(jnp.float32)
    per_sample = jnp.mean(same, axis=1)
    return per_sample if return_per_sample else float(jnp.mean(per_sample))


def neighborhood_preservation(
    X,
    Z,
    K: int,
    metric: str = "euclidean",
    return_per_sample: bool = False,
    mesh=None,
):
    """K-ary neighborhood overlap between input X and embedding Z.

    For each point: |kNN_X ∩ kNN_Z| / K.
    """
    X, _ = to_jax(X)
    Z, _ = to_jax(Z)
    idx_X = _knn_indices(X, K, metric, True, mesh)
    idx_Z = _knn_indices(Z, K, metric, True, mesh)
    # vectorized membership: broadcast compare (n, K, K); fine at eval-scale K
    member = jnp.any(idx_Z[:, :, None] == idx_X[:, None, :], axis=2)
    per_sample = jnp.sum(member, axis=1).astype(jnp.float32) / K
    return per_sample if return_per_sample else float(jnp.mean(per_sample))


def neighborhood_preservation_sampled(
    X,
    Z,
    K: int,
    n_queries: int = 2048,
    seed: int = 0,
    metric: str = "euclidean",
):
    """K-ary neighborhood preservation on a query subsample vs the FULL data.

    The large-n variant: exact cross kNN of ``n_queries`` sampled rows
    against all n rows in both spaces (two matmuls of (q, n) — tractable
    at millions of rows where the full (n, n) graph is not), then the
    per-query overlap. The reference evaluates distributed per-chunk the
    same way (reference: torchdr/eval/neighborhood_preservation.py:51-62).
    """
    import numpy as np

    X, _ = to_jax(X)
    Z, _ = to_jax(Z)
    n = X.shape[0]
    q = min(n_queries, n)
    rng = np.random.default_rng(seed)
    sel = np.sort(rng.choice(n, q, replace=False))
    sel_j = jnp.asarray(sel)

    def sampled_knn(A):
        _, idx = knn_graph(A[sel_j], A, k=K + 1, metric=metric, exclude_diag=False)
        # strip self matches, keep K columns
        is_self = idx == sel_j[:, None]
        order = jnp.argsort(jnp.where(is_self, 1, 0), axis=1, stable=True)
        return jnp.take_along_axis(idx, order, axis=1)[:, :K]

    idx_X = sampled_knn(X)
    idx_Z = sampled_knn(Z)
    member = jnp.any(idx_Z[:, :, None] == idx_X[:, None, :], axis=2)
    return float(jnp.mean(jnp.sum(member, axis=1).astype(jnp.float32) / K))


def knn_recall(indices_pred, indices_true, return_per_sample: bool = False):
    """Recall@k of a predicted kNN index set vs ground truth (bench helper)."""
    indices_pred = jnp.asarray(indices_pred)
    indices_true = jnp.asarray(indices_true)
    member = jnp.any(
        indices_pred[:, :, None] == indices_true[:, None, :], axis=2
    )
    per_sample = jnp.mean(member.astype(jnp.float32), axis=1)
    return per_sample if return_per_sample else float(jnp.mean(per_sample))
