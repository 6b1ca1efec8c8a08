"""Mesh-sharded IVF kNN search: replicated index, row-sharded queries.

The multi-chip ANN tier. The reference hands every rank a per-rank Faiss
config and lets each rank search its row chunk against the full index
(reference: torchdr/distributed/__init__.py:269-309 +
torchdr/distance/base.py:183-206). Here the same shape is one
``shard_map``: the inverted-file index (sorted database, centroids, cell
tables) is replicated on every chip and the self-query rows are sharded
over the mesh axis — each chip runs the identical probe kernel
(ops/ivf._ivf_search_impl) on its slice. Per-chip work and scan-buffer
memory scale 1/p; results are bit-identical to the single-device search
because shard boundaries fall on query-block boundaries (the probe set is
chosen per block, and block membership is unchanged).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax import shard_map
from jax.sharding import PartitionSpec as P

from ..ops.ivf import IVFIndex, _ivf_search_impl, _resolve_search_knobs, ivf_build
from .mesh import pad_to_multiple


def ivf_knn_sharded(
    X: jnp.ndarray | None,
    mesh,
    k: int = 15,
    nprobe: int = 12,
    n_clusters: int | None = None,
    index: Optional[IVFIndex] = None,
    key=None,
    block: int = 256,
    exclude_self: bool = True,
    m: int | None = None,
    scan_precision: str = "high",
    budget: int | None = None,
    scan_impl: str = "xla",
    merge: str | None = None,
    scan_fidelity: str = "full",
    nprobe_supers: int | None = None,
    nomination: str | None = None,
    rerank: bool = True,
    storage: str = "auto",
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Approximate self-kNN through an IVF index, queries sharded over a mesh.

    Same contract as :func:`~torchdr_tpu.ops.ivf.ivf_knn` (returns
    ``(dists, indices)`` of shape ``(n, k)`` in original row order); the
    index is built once (single-device) and replicated, queries are the
    sorted database rows row-sharded over ``mesh``'s first axis.
    """
    if index is None:
        if X is None:
            raise ValueError("[TorchDR-TPU] ERROR : pass X or a prebuilt index.")
        index = ivf_build(X, n_clusters=n_clusters, key=key, storage=storage)
    n = index.n
    chunk = index.chunk
    nprobe, budget, m_eff, merge, max_ch, scan_impl, n_supers, nominate = (
        _resolve_search_knobs(
            index, k, nprobe, m, budget, merge, scan_impl, nprobe_supers,
            nomination, rerank=rerank,
        )
    )

    axis = mesh.axis_names[0]
    world = mesh.devices.size

    # Query layout: all rows of the sorted database (dead pad rows ride
    # along as dead queries), padded so every shard is a whole number of
    # query blocks — shard boundaries on block boundaries keep the
    # per-block probe votes identical to the single-device path.
    total = index.X_sorted.shape[0]
    grain = world * block
    n_pad = pad_to_multiple(total, grain)
    Qs = index.X_sorted
    Qs_lo = index.X_lo
    out_ids = index.ids_sorted
    if n_pad != total:
        qpad = 1e12 if jnp.issubdtype(Qs.dtype, jnp.floating) else 0
        Qs = jnp.concatenate(
            [Qs, jnp.full((n_pad - total, Qs.shape[1]), qpad, Qs.dtype)]
        )
        if Qs_lo is not None:
            Qs_lo = jnp.concatenate(
                [Qs_lo, jnp.zeros((n_pad - total, Qs.shape[1]), Qs_lo.dtype)]
            )
        out_ids = jnp.concatenate(
            [out_ids, jnp.full((n_pad - total,), -2, jnp.int32)]
        )
    q_rows = jnp.where(
        out_ids >= 0, out_ids + (0 if exclude_self else n), out_ids
    )
    shard_rows_n = n_pad // world

    arrays = (
        index.centroids, index.X_sorted, index.ids_sorted, index.offsets,
        index.counts, index.X_lo, index.xnorm2, index.cells_sorted,
        index.super_centroids, index.super_members, index.cell_adj,
        index.scales,
    )
    has_lo = Qs_lo is not None
    # None leaves can't cross the shard_map boundary — strip them and
    # rebuild inside (their in_specs would be meaningless).
    repl_arrays = tuple(a for a in arrays if a is not None)
    none_mask = tuple(a is None for a in arrays)

    def local(Qs_l, q_rows_l, Qs_lo_l, *repl):
        it = iter(repl)
        full_arrays = tuple(
            None if is_none else next(it) for is_none in none_mask
        )
        pos0 = lax.axis_index(axis) * shard_rows_n
        d, i = _ivf_search_impl(
            Qs_l, q_rows_l, full_arrays, k, nprobe, budget, block, chunk,
            m_eff, scan_precision, scan_impl, merge, max_ch,
            Qs_lo_l if has_lo else None, pos0, scan_fidelity, n_supers,
            False, nominate, rerank=rerank,
        )
        return d.reshape(-1, k), i.reshape(-1, k)

    in_specs = (
        P(axis, None),
        P(axis),
        (P(axis, None) if has_lo else P()),
    ) + tuple(P() for _ in repl_arrays)
    if not has_lo:
        # replicated scalar placeholder for the missing lo plane
        Qs_lo = jnp.zeros((), jnp.float32)

    f = shard_map(
        local,
        mesh=mesh,
        in_specs=in_specs,
        out_specs=(P(axis, None), P(axis, None)),
    )
    d, i = jax.jit(f)(Qs, q_rows, Qs_lo, *repl_arrays)

    # scatter back to original row order (dead rows → spill slot n)
    scatter_ids = jnp.where(out_ids >= 0, out_ids, n)
    out_d = jnp.zeros((n + 1, k), d.dtype).at[scatter_ids].set(d)
    out_i = jnp.zeros((n + 1, k), jnp.int32).at[scatter_ids].set(i)
    return out_d[:n], out_i[:n]
