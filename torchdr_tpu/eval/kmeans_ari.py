"""K-means + Adjusted Rand Index evaluation.

Replacement for the reference's Faiss-KMeans + torchmetrics ARI
(reference: torchdr/eval/kmeans.py:21-177): native Lloyd k-means
(ops/kmeans.py) and a closed-form ARI from the contingency table.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np

from ..ops.kmeans import kmeans_fit
from ..utils.wrappers import to_jax


def adjusted_rand_index(labels_true, labels_pred) -> float:
    """ARI from the contingency table (Hubert & Arabie 1985)."""
    lt = np.asarray(labels_true)
    lp = np.asarray(labels_pred)
    _, ti = np.unique(lt, return_inverse=True)
    _, pi = np.unique(lp, return_inverse=True)
    n = lt.shape[0]
    C = np.zeros((ti.max() + 1, pi.max() + 1), np.int64)
    np.add.at(C, (ti, pi), 1)

    def comb2(x):
        return x * (x - 1) / 2.0

    sum_comb = comb2(C).sum()
    sum_a = comb2(C.sum(axis=1)).sum()
    sum_b = comb2(C.sum(axis=0)).sum()
    expected = sum_a * sum_b / comb2(n)
    max_index = 0.5 * (sum_a + sum_b)
    denom = max_index - expected
    if denom == 0:
        return 1.0
    return float((sum_comb - expected) / denom)


def kmeans_ari(
    X,
    labels,
    n_clusters: Optional[int] = None,
    max_iter: int = 100,
    random_state: Optional[int] = None,
    n_init: int = 3,
):
    """Cluster X with k-means and score agreement with ``labels`` via ARI.

    Returns (ari, predicted_labels). ``n_init`` restarts keep the best
    inertia (Faiss KMeans redo-equivalent).
    """
    X, _ = to_jax(X)
    labels_np = np.asarray(labels)
    if n_clusters is None:
        n_clusters = int(np.unique(labels_np).shape[0])
    key = jax.random.PRNGKey(random_state or 0)

    best = None
    for i in range(n_init):
        key, sub = jax.random.split(key)
        centers, pred, inertia = kmeans_fit(X, n_clusters, sub, max_iter=max_iter)
        inertia = float(inertia)
        if best is None or inertia < best[0]:
            best = (inertia, pred)
    pred = np.asarray(best[1])
    return adjusted_rand_index(labels_np, pred), pred
