"""Multi-chip kNN-graph construction over the ICI mesh.

Replaces the reference's distributed chunked kNN (queries = local chunk,
database = full matrix on every rank, reference: torchdr/distance/
base.py:160-211) and adds the memory-scaled tier the reference lacks:

- :func:`knn_graph_sharded` — queries row-sharded, database replicated.
  One ``shard_map``; each chip runs the streaming-block exact kNN on its
  chunk. O(n·d) memory per chip for the database.
- :func:`knn_graph_ring` — queries AND database row-sharded; database
  shards rotate around the ring via ``ppermute`` while each chip merges a
  running top-k. Exact kNN with O(n/p · d) memory per chip — the
  ring-attention analog for distance computation (SURVEY.md §5).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import PartitionSpec as P
from jax import shard_map

from ..ops.metrics import MASK_VALUE, check_metric, pairwise_block
from .mesh import pad_to_multiple


def _pad_rows_to(X: jnp.ndarray, total: int) -> jnp.ndarray:
    pad = total - X.shape[0]
    if pad:
        X = jnp.concatenate([X, jnp.zeros((pad, X.shape[1]), X.dtype)], axis=0)
    return X


def knn_graph_sharded(
    X: jnp.ndarray,
    k: int,
    mesh,
    metric: str = "sqeuclidean",
    exclude_diag: bool = True,
    block_size: int = 1024,
    mode: str = "exact",
    precision: str = "highest",
    recall_target: float = 0.95,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """kNN with row-sharded queries and a replicated database.

    ``mode``/``precision``/``recall_target`` mirror ops/distance.knn_graph:
    "exact" = per-chip lax.top_k, "approx" = the PartialReduce tier.
    """
    check_metric(metric)
    axis = mesh.axis_names[0]
    world = mesh.devices.size
    n = X.shape[0]
    n_pad = pad_to_multiple(n, world)
    Xq = _pad_rows_to(X, n_pad)
    chunk = n_pad // world

    def local_knn(Xq_local, X_full):
        offset = lax.axis_index(axis) * chunk
        rows = offset + jnp.arange(chunk)
        block = min(block_size, chunk)
        n_blocks = -(-chunk // block)
        Xq_pad = _pad_rows_to(Xq_local, n_blocks * block)

        def process(b):
            Xb = lax.dynamic_slice_in_dim(Xq_pad, b * block, block, axis=0)
            C = pairwise_block(Xb, X_full, metric, precision)
            brows = offset + b * block + jnp.arange(block)
            cols = jnp.arange(X_full.shape[0])
            if exclude_diag:
                C = C + MASK_VALUE * (brows[:, None] == cols[None, :]).astype(C.dtype)
            if mode == "approx":
                d, idx = lax.approx_min_k(C, k, recall_target=recall_target)
                return d, idx
            neg_topk, idx = lax.top_k(-C, k)
            return -neg_topk, idx

        d, i = lax.map(process, jnp.arange(n_blocks))
        return d.reshape(-1, k)[:chunk], i.reshape(-1, k)[:chunk]

    f = shard_map(
        local_knn,
        mesh=mesh,
        in_specs=(P(axis, None), P(None, None)),
        out_specs=(P(axis, None), P(axis, None)),
    )
    d, idx = jax.jit(f)(Xq, X)
    return d[:n], idx[:n]


def knn_graph_sharded_queries(
    Q: jnp.ndarray,
    DB: jnp.ndarray,
    k: int,
    mesh,
    metric: str = "sqeuclidean",
    block_size: int = 1024,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Cross kNN (queries vs a separate database), queries row-sharded.

    The per-chunk distributed-search analog of the reference's DataLoader
    path (reference: torchdr/distance/faiss.py:786-867): each device
    searches its query chunk against the replicated database.
    """
    check_metric(metric)
    axis = mesh.axis_names[0]
    world = mesh.devices.size
    nq = Q.shape[0]
    n_pad = pad_to_multiple(nq, world)
    Qp = _pad_rows_to(Q, n_pad)
    chunk = n_pad // world
    m = DB.shape[0]

    def local_knn(Q_local, DB_full):
        block = min(block_size, chunk)
        n_blocks = -(-chunk // block)
        Qb_pad = _pad_rows_to(Q_local, n_blocks * block)

        def process(b):
            Xb = lax.dynamic_slice_in_dim(Qb_pad, b * block, block, axis=0)
            C = pairwise_block(Xb, DB_full, metric)
            neg_topk, idx = lax.top_k(-C, k)
            return -neg_topk, idx

        d, i = lax.map(process, jnp.arange(n_blocks))
        return d.reshape(-1, k)[:chunk], i.reshape(-1, k)[:chunk]

    f = shard_map(
        local_knn,
        mesh=mesh,
        in_specs=(P(axis, None), P(None, None)),
        out_specs=(P(axis, None), P(axis, None)),
    )
    d, idx = jax.jit(f)(Qp, DB)
    return d[:nq], idx[:nq]


def knn_graph_ring(
    X: jnp.ndarray,
    k: int,
    mesh,
    metric: str = "sqeuclidean",
    exclude_diag: bool = True,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Exact kNN with O(n/p) memory: ppermute the database around the ring.

    Each step computes the (chunk × chunk) distance block between the local
    queries and the visiting database shard, and merges it into a running
    top-k buffer — the DR analog of ring attention.
    """
    check_metric(metric)
    axis = mesh.axis_names[0]
    world = mesh.devices.size
    n = X.shape[0]
    n_pad = pad_to_multiple(n, world)
    Xp = _pad_rows_to(X, n_pad)
    chunk = n_pad // world
    perm = [(i, (i + 1) % world) for i in range(world)]

    def local_ring(X_local):
        my = lax.axis_index(axis)
        rows = my * chunk + jnp.arange(chunk)

        def step(s, carry):
            db, best_d, best_i = carry
            src = (my - s) % world  # origin rank of the visiting shard
            cols = src * chunk + jnp.arange(chunk)
            C = pairwise_block(X_local, db, metric)
            mask = cols[None, :] >= n  # database padding rows
            if exclude_diag:
                mask = mask | (rows[:, None] == cols[None, :])
            C = C + MASK_VALUE * mask.astype(C.dtype)
            cand_d = jnp.concatenate([best_d, C], axis=1)
            cand_i = jnp.concatenate(
                [best_i, jnp.broadcast_to(cols[None, :], C.shape)], axis=1
            )
            neg_topk, sel = lax.top_k(-cand_d, k)
            best_d = -neg_topk
            best_i = jnp.take_along_axis(cand_i, sel, axis=1)
            # rotate the database shard to the next neighbor
            db = lax.ppermute(db, axis, perm)
            return db, best_d, best_i

        # mark constants as device-varying so the fori carry types match
        def varying(x):
            return lax.pcast(x, (axis,), to="varying")

        init = (
            X_local,
            varying(jnp.full((chunk, k), MASK_VALUE, X_local.dtype)),
            varying(jnp.full((chunk, k), -1, jnp.int32)),
        )
        _, best_d, best_i = lax.fori_loop(0, world, step, init)
        return best_d, best_i

    f = shard_map(
        local_ring,
        mesh=mesh,
        in_specs=(P(axis, None),),
        out_specs=(P(axis, None), P(axis, None)),
    )
    d, idx = jax.jit(f)(Xp)
    return d[:n], idx[:n]
