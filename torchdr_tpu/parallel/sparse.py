"""Distributed sparse symmetrization over the mesh (explicit all_to_all).

Counterpart of the reference's distributed fuzzy-union symmetrization
(reference: torchdr/utils/sparse.py:209-343): kNN edges are exchanged so
each rank receives the transposed edges for the rows it owns, then merges
them with its own edges.

XLA collectives need static shapes, so where the reference exchanges
dynamic sizes first (all_to_all_single on counts, sparse.py:296-300) we
pad each per-destination bucket to the worst case ``chunk·k`` and carry a
validity mask — trade world-fold buffer memory for zero host round-trips.

The entire pipeline (bucketing, all_to_all, transpose scatter, duplicate
merge) runs inside ONE ``shard_map`` body: every buffer a device touches
is sized by its own row chunk, so per-device memory stays O(n/p · k).

Note: the GSPMD path (just calling ops/sparse.symmetrize_sparse on
row-sharded arrays) is also correct — XLA distributes the sort. This
explicit version keeps the exchange on ICI with predictable cost and is
what large-n multi-chip fits should use.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from jax import lax
from jax import shard_map
from jax.sharding import PartitionSpec as P

from ..ops.sparse import symmetric_degrees
from .mesh import pad_to_multiple, rank_of_rows


def distributed_symmetrize_sparse(
    values: jnp.ndarray,
    indices: jnp.ndarray,
    mesh,
    mode: str = "sum_minus_prod",
    k_out: int | None = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Symmetrize a row-sharded padded sparse matrix with an all_to_all edge
    exchange. Inputs/outputs are global ``(n, k)`` / ``(n, k_out)`` arrays
    (shard them with ``shard_rows`` for on-mesh residency).
    """
    n, k = values.shape
    axis = mesh.axis_names[0]
    world = mesh.devices.size
    if k_out is None:
        max_deg = int(jnp.max(symmetric_degrees(indices)))
        k_out = max(8, -(-max_deg // 8) * 8)

    n_pad = pad_to_multiple(n, world)
    chunk = n_pad // world
    vals_p = jnp.zeros((n_pad, k), values.dtype).at[:n].set(values)
    idx_p = jnp.full((n_pad, k), -1, indices.dtype).at[:n].set(indices)

    def local(vals_local, idx_local):
        me = lax.axis_index(axis)
        row0 = me * chunk
        rows = row0 + jnp.arange(chunk)

        flat_rows = jnp.broadcast_to(rows[:, None], (chunk, k)).reshape(-1)
        flat_cols = idx_local.reshape(-1)
        flat_vals = vals_local.reshape(-1)
        valid = flat_cols >= 0
        m = chunk * k

        # Destination rank = owner of the edge's column (the transposed row).
        dest = jnp.where(valid, rank_of_rows(jnp.maximum(flat_cols, 0), n_pad, world), world)

        # Bucket edges per destination into fixed-size (world, m) buffers.
        # One multi-operand sort: payloads ride the sort network instead of
        # three post-hoc gathers (same rewrite as ops/sparse).
        dest_s, rows_s, cols_s, vals_s = lax.sort(
            (dest, flat_rows, flat_cols, flat_vals), num_keys=1, is_stable=True
        )
        # slot within bucket via rank - first_rank_of_bucket
        pos = jnp.arange(m)
        bucket_start = jnp.full((world + 1,), m, jnp.int32)
        bucket_start = bucket_start.at[jnp.minimum(dest_s, world)].min(pos.astype(jnp.int32))
        # fill forward missing buckets (empty bucket start = next bucket start)
        bucket_start = lax.associative_scan(jnp.minimum, bucket_start[::-1])[::-1]
        slot = pos - bucket_start[jnp.minimum(dest_s, world)]

        send_rows = jnp.full((world, m), -1, jnp.int32)
        send_cols = jnp.full((world, m), -1, jnp.int32)
        send_vals = jnp.zeros((world, m), values.dtype)
        ok = dest_s < world
        d_idx = jnp.where(ok, dest_s, 0)
        s_idx = jnp.where(ok, slot, m - 1)
        # transposed edge: (col, row, val) delivered to the column's owner
        send_rows = send_rows.at[d_idx, s_idx].set(
            jnp.where(ok, cols_s, -1), mode="drop"
        )
        send_cols = send_cols.at[d_idx, s_idx].set(
            jnp.where(ok, rows_s, -1), mode="drop"
        )
        send_vals = send_vals.at[d_idx, s_idx].set(
            jnp.where(ok, vals_s, 0.0), mode="drop"
        )

        # the ICI exchange (reference: all_to_all payload, sparse.py:309)
        recv_rows = lax.all_to_all(send_rows, axis, 0, 0, tiled=False)
        recv_cols = lax.all_to_all(send_cols, axis, 0, 0, tiled=False)
        recv_vals = lax.all_to_all(send_vals, axis, 0, 0, tiled=False)
        # recv_* are (world, m): bucket b holds transposed edges sent by rank
        # b whose target rows live in THIS rank's chunk (global row ids).

        # --- merge phase, on-mesh: every buffer below is O(chunk), not O(n).
        t_rows = recv_rows.reshape(-1)
        t_cols = recv_cols.reshape(-1)
        t_vals = recv_vals.reshape(-1)
        t_valid = t_rows >= 0
        t_local = jnp.where(t_valid, t_rows - row0, chunk)

        # per-local-row slot assignment for received edges
        t_local, t_cols, t_vals, t_valid = lax.sort(
            (t_local, t_cols, t_vals, t_valid.astype(jnp.int32)),
            num_keys=1, is_stable=True,
        )
        t_valid = t_valid.astype(bool)
        pos2 = jnp.arange(t_local.shape[0])
        row_start = jnp.full((chunk + 1,), t_local.shape[0], jnp.int32)
        row_start = row_start.at[t_local].min(pos2.astype(jnp.int32))
        slot2 = pos2 - row_start[jnp.minimum(t_local, chunk)]
        # In-degree can exceed k, so the receive matrix is k_out wide.
        PT_vals = jnp.zeros((chunk, k_out), values.dtype)
        PT_idx = jnp.full((chunk, k_out), -1, indices.dtype)
        okm = t_valid & (slot2 < k_out)
        r_i = jnp.where(okm, t_local, 0)
        s_i = jnp.where(okm, slot2, k_out - 1)
        PT_vals = PT_vals.at[r_i, s_i].set(jnp.where(okm, t_vals, 0.0), mode="drop")
        PT_idx = PT_idx.at[r_i, s_i].set(jnp.where(okm, t_cols, -1), mode="drop")

        # combine the local P chunk with its received transpose chunk (the
        # padded-duplicate merge handles the mode arithmetic per row)
        comb_vals = jnp.concatenate([vals_local, PT_vals], axis=1)
        comb_idx = jnp.concatenate([idx_local, PT_idx], axis=1)
        return _merge_duplicate_columns(
            comb_vals, comb_idx, k_out,
            combine="sum" if mode == "sum" else "sum_minus_prod",
        )

    f = shard_map(
        local,
        mesh=mesh,
        in_specs=(P(axis, None), P(axis, None)),
        out_specs=(P(axis, None), P(axis, None)),
    )
    out_vals, out_idx = jax.jit(f)(vals_p, idx_p)
    return out_vals[:n], out_idx[:n]


def _merge_duplicate_columns(values, indices, k_out: int, combine: str):
    """Merge duplicate column ids within each padded row.

    Rows hold each (i, j) at most twice (once from P, once from Pᵀ); sort
    by column id, combine adjacent duplicates, repack left-aligned.
    """
    n, w = values.shape
    big = jnp.iinfo(jnp.int32).max
    key = jnp.where(indices >= 0, indices, big)
    order = jnp.argsort(key, axis=1)
    idx_s = jnp.take_along_axis(indices, order, axis=1)
    val_s = jnp.take_along_axis(values, order, axis=1)

    prev = jnp.concatenate([jnp.full((n, 1), -2, idx_s.dtype), idx_s[:, :-1]], axis=1)
    nxt = jnp.concatenate([idx_s[:, 1:], jnp.full((n, 1), -3, idx_s.dtype)], axis=1)
    nxt_val = jnp.concatenate([val_s[:, 1:], jnp.zeros((n, 1), val_s.dtype)], axis=1)
    is_head = (idx_s != prev) & (idx_s >= 0)
    dup = idx_s == nxt
    if combine == "sum":
        merged = val_s + jnp.where(dup, nxt_val, 0.0)
    else:
        a, b = val_s, jnp.where(dup, nxt_val, 0.0)
        merged = a + b - a * b
    merged = jnp.where(is_head, merged, 0.0)

    # repack heads left-aligned into k_out slots
    slot = jnp.cumsum(is_head.astype(jnp.int32), axis=1) - 1
    out_vals = jnp.zeros((n, k_out + 1), values.dtype)
    out_idx = jnp.full((n, k_out + 1), -1, indices.dtype)
    okm = is_head & (slot < k_out)
    s_i = jnp.where(okm, slot, k_out)
    rows = jnp.broadcast_to(jnp.arange(n)[:, None], (n, w))
    out_vals = out_vals.at[rows, s_i].set(jnp.where(okm, merged, 0.0), mode="drop")
    out_idx = out_idx.at[rows, s_i].set(jnp.where(okm, idx_s, -1), mode="drop")
    return out_vals[:, :k_out], out_idx[:, :k_out]
