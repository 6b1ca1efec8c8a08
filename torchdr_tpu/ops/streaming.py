"""Streaming (batch-fed) kNN graph construction.

Replacement for the reference's DataLoader-fed Faiss index build
(reference: torchdr/distance/faiss.py:477-867): the database is assembled
on device from an iterable of host batches (two passes over the loader:
build, then search batch-by-batch), so host RAM never needs to hold the
full dataset at once. Self-matches are removed with the k+1/strip trick
(reference: torchdr/distance/base.py:186-206).
"""

from __future__ import annotations

from typing import Iterable, Tuple

import jax.numpy as jnp
import numpy as np

from .distance import knn_graph


def _to_device_batches(batches) -> list:
    out = []
    for batch in batches:
        if isinstance(batch, (list, tuple)):
            batch = batch[0]
        if hasattr(batch, "detach"):
            batch = batch.detach().cpu().numpy()
        out.append(jnp.asarray(np.asarray(batch, np.float32)))
    return out


def knn_graph_from_batches(
    batches: Iterable,
    k: int = 15,
    metric: str = "sqeuclidean",
    exclude_self: bool = True,
    precision: str = "highest",
    mode: str = "exact",
    block_size: int = 1024,
    mesh=None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Exact kNN over a dataset delivered as row batches.

    ``batches`` may be a list/generator of arrays or a torch DataLoader
    (possibly yielding (data, target) tuples). Returns (dists, indices)
    of shape (n, k) in the dataset's row order.

    With ``mesh``, each batch's query rows are sharded over the mesh and
    searched against the replicated database via shard_map — the analog of
    the reference's distributed per-chunk DataLoader search
    (reference: torchdr/distance/faiss.py:786-867).

    Note: a generator is consumed once — the device keeps the database, so
    only one pass over the loader is needed (unlike the reference's 2-pass
    IVF train+add, faiss.py:594-738; the Flat tier needs no training pass).
    """
    dev = _to_device_batches(batches)
    if not dev:
        raise ValueError("[TorchDR-TPU] ERROR : empty batch iterable.")
    DB = jnp.concatenate(dev, axis=0)
    n = DB.shape[0]

    k_search = k + 1 if exclude_self else k
    dists_out, idx_out = [], []
    offset = 0
    for Qb in dev:
        if mesh is not None:
            from ..parallel.knn import knn_graph_sharded_queries

            d, idx = knn_graph_sharded_queries(
                Qb, DB, k_search, mesh, metric=metric, block_size=block_size
            )
        else:
            d, idx = knn_graph(
                Qb, DB, k=k_search, metric=metric, exclude_diag=False,
                block_size=block_size, precision=precision, mode=mode,
            )
        if exclude_self:
            rows = offset + jnp.arange(Qb.shape[0])
            is_self = idx == rows[:, None]
            # push self matches to the end, then drop the last column
            order = jnp.argsort(jnp.where(is_self, 1, 0), axis=1, stable=True)
            d = jnp.take_along_axis(d, order, axis=1)[:, :k]
            idx = jnp.take_along_axis(idx, order, axis=1)[:, :k]
        dists_out.append(d)
        idx_out.append(idx)
        offset += Qb.shape[0]
    return jnp.concatenate(dists_out, axis=0), jnp.concatenate(idx_out, axis=0)
