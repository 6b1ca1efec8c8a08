"""Streaming (batch-fed) kNN graph construction.

Replacement for the reference's DataLoader-fed Faiss index build
(reference: torchdr/distance/faiss.py:477-867), in three tiers:

- :func:`knn_graph_from_batches` — exact Flat tier; the database is
  assembled on device (fits-HBM datasets).
- :func:`~torchdr_tpu.ops.ivf.ivf_build_from_batches` — incremental IVF
  build: batches are written straight into the sorted layout, the
  unsorted dataset is never materialized (the reference's 2-pass
  train+add, faiss.py:594-738); re-iterable feeds (DataLoader, factory)
  are replayed per pass, never buffered.
- :func:`knn_graph_streaming` — **beyond-HBM**: the database is split
  into segments, each segment gets its own device-resident IVF index and
  is queried by ALL rows (streamed in chunks), with a running top-k merge
  on host. Device memory is one segment index + one query chunk, so the
  dataset may exceed device HBM by the number of segments — and host RAM
  too, when fed a replayable source (see :mod:`torchdr_tpu.ops.loader`).

Self-matches are removed with the k+1/strip trick (reference:
torchdr/distance/base.py:186-206) or IVF id-exclusion.
"""

from __future__ import annotations

from typing import Iterable, Tuple

import jax.numpy as jnp
import numpy as np

from .distance import knn_graph
from .loader import BatchSource


def _to_device_batches(batches) -> list:
    return [jnp.asarray(b) for b in BatchSource(batches)]


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


def knn_graph_streaming(
    batches: Iterable,
    k: int = 15,
    nprobe: int = 12,
    n_clusters: int | None = None,
    seg_bytes: int | None = None,
    query_chunk: int = 1 << 20,
    exclude_self: bool = True,
    key=None,
    verbose: bool = False,
    **ivf_kwargs,
) -> Tuple[np.ndarray, np.ndarray]:
    """Approximate kNN graph for datasets beyond device HBM.

    The database is split into row segments of at most ``seg_bytes``
    (default: sized so one segment index + query workspace fit the
    device). Each segment is IVF-indexed (incremental host-side build,
    :func:`~torchdr_tpu.ops.ivf.ivf_build_from_batches`) and queried by
    EVERY row, streamed in ``query_chunk`` blocks; per-segment results
    are merged into a running host top-k. Recall per query equals the
    single-index IVF tier's (each true neighbor lives in exactly one
    segment and is found iff its cell is probed there).

    ``batches`` may be anything :class:`~torchdr_tpu.ops.loader.BatchSource`
    accepts. Re-iterable sources (torch DataLoader with shuffle=False, or a
    zero-arg factory) are REPLAYED rather than buffered, so the dataset may
    exceed host RAM as well as device HBM — at the cost of re-reading the
    feed for each segment's build and query sweep. Array lists and one-shot
    generators are held in host memory as before.

    Returns host ``(dists, indices)`` of shape ``(n, k)``.
    """
    from .ivf import auto_nlist, ivf_build_from_batches, ivf_knn_queries

    src = BatchSource(batches)
    meta = src.metadata()
    n, d = meta["n_samples"], meta["n_features"]
    sizes = meta["batch_sizes"]
    if seg_bytes is None:
        from .ivf import _permute_hbm_budget

        # index planes ≈ 1× segment bytes (+norms); leave room for the
        # query chunks, scan buffers, and XLA workspace
        seg_bytes = max(1 << 28, int(_permute_hbm_budget() * 0.45))

    # group whole batches into segments (a batch never straddles segments;
    # callers control granularity via their batch size)
    segments: list = []  # (batch_lo, batch_hi, n_rows)
    cur_lo = 0
    cur_bytes = cur_rows = 0
    for bi, m in enumerate(sizes):
        b_bytes = m * d * 4
        if bi > cur_lo and cur_bytes + b_bytes > seg_bytes:
            segments.append((cur_lo, bi, cur_rows))
            cur_lo, cur_bytes, cur_rows = bi, 0, 0
        cur_bytes += b_bytes
        cur_rows += m
    segments.append((cur_lo, len(sizes), cur_rows))

    out_d = np.full((n, k), np.inf, np.float32)
    out_i = np.full((n, k), -1, np.int64)
    seg_start = 0
    for si, (blo, bhi, n_s) in enumerate(segments):
        nlist_s = n_clusters or auto_nlist(n_s)
        index = ivf_build_from_batches(
            src.slice(blo, bhi), n_clusters=nlist_s, key=key, **ivf_kwargs
        )
        if verbose:
            print(
                f"[knn_graph_streaming] segment {si + 1}/{len(segments)}: "
                f"{n_s} rows, nlist={nlist_s}",
                flush=True,
            )
        q0 = 0
        for qb in src:
            for a in range(0, qb.shape[0], query_chunk):
                Qc = qb[a : a + query_chunk]
                gids = q0 + a + np.arange(Qc.shape[0])
                if exclude_self:
                    local = gids - seg_start
                    local = np.where(
                        (local >= 0) & (local < n_s), local, n_s
                    ).astype(np.int32)
                else:
                    local = None
                d_q, i_q = ivf_knn_queries(
                    jnp.asarray(Qc), index, k=k, nprobe=nprobe,
                    query_ids=local,
                )
                d_qh = np.asarray(d_q)
                i_qh = np.asarray(i_q, np.int64) + seg_start
                # host top-k merge with the running best
                rows = slice(int(gids[0]), int(gids[-1]) + 1)
                cd = np.concatenate([out_d[rows], d_qh], axis=1)
                ci = np.concatenate([out_i[rows], i_qh], axis=1)
                sel = np.argpartition(cd, k - 1, axis=1)[:, :k]
                cd = np.take_along_axis(cd, sel, axis=1)
                ci = np.take_along_axis(ci, sel, axis=1)
                order = np.argsort(cd, axis=1)
                out_d[rows] = np.take_along_axis(cd, order, axis=1)
                out_i[rows] = np.take_along_axis(ci, order, axis=1)
            q0 += qb.shape[0]
        seg_start += n_s
        del index  # free the segment's device buffers before the next one
    return out_d, out_i
