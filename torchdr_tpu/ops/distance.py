"""Pairwise distance and kNN-graph primitives.

TPU-native replacement for the reference's distance dispatch layer
(reference: torchdr/distance/base.py:22-405) and the Faiss Flat kNN tier
(reference: torchdr/distance/faiss.py:225-473). Instead of routing between
torch / KeOps / Faiss backends, a single set of primitives is provided:

- :func:`pairwise_distances` — dense distances, optional top-k selection.
- :func:`knn_graph` — memory-efficient exact kNN by streaming query blocks
  (O(block · m) memory) with XLA ``top_k`` selection; the Pallas tier in
  ``ops/pallas/knn_kernel.py`` plugs in behind the same signature.
- :func:`pairwise_distances_indexed` — gather-based distances to explicit
  neighbor / negative indices; the per-iteration hot kernel of every sparse
  training loop.

Everything is shape-static and jit-safe. Self-exclusion is done by adding
``MASK_VALUE`` on the diagonal (reference: torchdr/distance/torch.py:110-116).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from ..utils.compile_cache import enable_compile_cache
from .metrics import MASK_VALUE, check_metric, indexed_block, pairwise_block


def _pad_rows(X: jnp.ndarray, multiple: int) -> Tuple[jnp.ndarray, int]:
    n = X.shape[0]
    n_pad = (-n) % multiple
    if n_pad:
        X = jnp.concatenate([X, jnp.zeros((n_pad,) + X.shape[1:], X.dtype)], axis=0)
    return X, n_pad


def pairwise_distances(
    X: jnp.ndarray,
    Y: Optional[jnp.ndarray] = None,
    metric: str = "sqeuclidean",
    k: Optional[int] = None,
    exclude_diag: bool = False,
):
    """Dense pairwise distances, optionally reduced to the k smallest per row.

    Returns ``(C, indices)`` where ``indices`` is None when ``k`` is None.
    Mirrors the reference dispatch contract (torchdr/distance/base.py:22-249)
    with a single XLA implementation.
    """
    check_metric(metric)
    self_mode = Y is None
    Yc = X if self_mode else Y
    C = pairwise_block(X, Yc, metric)
    if exclude_diag and self_mode:
        C = C + MASK_VALUE * jnp.eye(C.shape[0], dtype=C.dtype)
    if k is None:
        return C, None
    neg_topk, indices = lax.top_k(-C, k)
    return -neg_topk, indices


@functools.partial(
    jax.jit,
    static_argnames=(
        "metric", "k", "exclude_diag", "block_size", "precision", "mode",
        "recall_target", "db_block",
    ),
)
def knn_graph(
    X: jnp.ndarray,
    Y: Optional[jnp.ndarray] = None,
    k: int = 15,
    metric: str = "sqeuclidean",
    exclude_diag: bool = True,
    block_size: int = 1024,
    precision: str = "highest",
    mode: str = "exact",
    recall_target: float = 0.95,
    db_block: int = 65_536,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """kNN graph: for each row of X, the k nearest rows of Y (or X).

    Streams query blocks with ``lax.map`` so peak memory is
    O(block_size · m) instead of O(n · m); each block is one MXU matmul
    followed by k-selection. This is the from-scratch replacement for the
    Faiss tiers (reference: torchdr/distance/faiss.py:225-404):

    - ``mode="exact"``: ``lax.top_k`` — the IndexFlat tier, 100% recall.
    - ``mode="approx"``: ``lax.approx_min_k`` — the TPU PartialReduce
      hardware path (Chern et al. 2022, "TPU-KNN at Peak FLOP/s"); ~5-6x
      faster selection at ``recall_target`` recall. This is the IVF-role
      tier, but with a *tunable, data-independent* recall guarantee instead
      of Faiss's data-dependent nprobe behavior.

    Returns ``(dists, indices)`` of shape ``(n, k)``.
    """
    enable_compile_cache()
    check_metric(metric)
    self_mode = Y is None
    Yc = X if self_mode else Y
    n = X.shape[0]
    m = Yc.shape[0]
    block = min(block_size, max(8, n))

    Xp, n_pad = _pad_rows(X, block)
    n_blocks = Xp.shape[0] // block
    row_base = jnp.arange(block)

    # For large databases the distance block AND the per-row k-selection are
    # chunked along columns with a running top-k merge: keeps every live
    # buffer ≤ block·db_block and top_k's sort buffers bounded (top_k over
    # millions of columns otherwise exhausts HBM).
    chunk_db = m > db_block
    if chunk_db:
        mp = -(-m // db_block) * db_block
        Yp = jnp.concatenate(
            [Yc, jnp.zeros((mp - m, Yc.shape[1]), Yc.dtype)], axis=0
        ) if mp != m else Yc
        n_db_blocks = mp // db_block

    def select(C, cols, rows):
        if exclude_diag and self_mode:
            C = C + MASK_VALUE * (rows[:, None] == cols[None, :]).astype(C.dtype)
        if mode == "approx":
            d, loc = lax.approx_min_k(C, k, recall_target=recall_target)
            return d, cols[loc]
        # NOTE: a two-stage "tournament" top-k (256-wide slots, as in
        # ops/ivf.py) was measured HERE at +28% vs the plain wide top_k
        # (44 ms vs 34 ms per 1024x65536 block on v5e) — XLA's top_k is
        # already bandwidth-bound at this geometry and the extra (B,
        # nsl, k) index materialization only adds traffic. Keep plain.
        neg_topk, loc = lax.top_k(-C, k)
        return -neg_topk, cols[loc]

    def process_block(b):
        Xb = lax.dynamic_slice_in_dim(Xp, b * block, block, axis=0)
        rows = b * block + row_base
        if not chunk_db:
            C = pairwise_block(Xb, Yc, metric, precision)
            return select(C, jnp.arange(m), rows)

        def db_step(j, carry):
            best_d, best_i = carry
            Yb = lax.dynamic_slice_in_dim(Yp, j * db_block, db_block, axis=0)
            cols = j * db_block + jnp.arange(db_block)
            C = pairwise_block(Xb, Yb, metric, precision)
            C = C + MASK_VALUE * (cols[None, :] >= m).astype(C.dtype)
            d, i = select(C, cols, rows)
            cand_d = jnp.concatenate([best_d, d], axis=1)
            cand_i = jnp.concatenate([best_i, i], axis=1)
            neg, sel = lax.top_k(-cand_d, k)
            return -neg, jnp.take_along_axis(cand_i, sel, axis=1)

        init = (
            jnp.full((block, k), MASK_VALUE, Xb.dtype),
            jnp.full((block, k), -1, jnp.int32),
        )
        return lax.fori_loop(0, n_db_blocks, db_step, init)

    dists, indices = lax.map(process_block, jnp.arange(n_blocks))
    dists = dists.reshape(-1, k)[:n]
    indices = indices.reshape(-1, k)[:n]
    return dists, indices


def knn_graph_host_chunked(
    X: jnp.ndarray,
    Y: Optional[jnp.ndarray] = None,
    k: int = 15,
    query_chunk: int = 131_072,
    **kwargs,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Exact kNN dispatched in host-level query chunks.

    The axon TPU worker dies under single dispatches that keep the MXU
    saturated for ≳30 s (measured: exact 1M×1M kNN crashes it at every
    internal block size, while the same total work split across dispatches
    survives). This wrapper slices the queries on the host so each jit
    call stays short; results are bit-identical to :func:`knn_graph`.
    """
    n = X.shape[0]
    self_mode = Y is None
    Yc = X if self_mode else Y
    if n <= query_chunk:
        return knn_graph(X, Y, k=k, **kwargs)
    exclude = kwargs.pop("exclude_diag", self_mode)
    d_out, i_out = [], []
    for s in range(0, n, query_chunk):
        Xq = X[s : s + query_chunk]
        d, i = knn_graph(
            Xq, Yc, k=k + (1 if exclude else 0), exclude_diag=False, **kwargs
        )
        if exclude:
            rows = s + jnp.arange(Xq.shape[0])
            is_self = i == rows[:, None]
            order = jnp.argsort(jnp.where(is_self, 1, 0), axis=1, stable=True)
            d = jnp.take_along_axis(d, order, axis=1)[:, :k]
            i = jnp.take_along_axis(i, order, axis=1)[:, :k]
        d_out.append(d)
        i_out.append(i)
    return jnp.concatenate(d_out), jnp.concatenate(i_out)


def pairwise_distances_indexed(
    X: jnp.ndarray,
    query_indices: Optional[jnp.ndarray] = None,
    key_indices: Optional[jnp.ndarray] = None,
    Y: Optional[jnp.ndarray] = None,
    metric: str = "sqeuclidean",
) -> jnp.ndarray:
    """Distances between indexed subsets of X / Y.

    Shape contract mirrors the reference (torchdr/distance/base.py:252-405):

    - ``key_indices`` 2D ``(n_q, k)``: per-query keys, returns ``(n_q, k)``.
    - ``key_indices`` 1D: shared keys for all queries.
    - ``key_indices`` None: all rows of Y (or X) are keys.

    Negative (padding) indices are allowed in 2D mode: they are clamped for
    the gather and the caller is expected to mask the resulting entries.
    """
    if Y is None:
        Y = X
    Xq = X if query_indices is None else X[query_indices]

    if key_indices is None:
        return pairwise_block(Xq, Y, metric)
    if key_indices.ndim == 1:
        return pairwise_block(Xq, Y[key_indices], metric)
    if key_indices.ndim != 2:
        raise ValueError(f"key_indices must be 1D or 2D, got {key_indices.ndim}D")

    safe_idx = jnp.maximum(key_indices, 0)
    Yk = jnp.take(Y, safe_idx, axis=0)  # (n_q, k, d)
    return indexed_block(Xq, Yk, metric)
