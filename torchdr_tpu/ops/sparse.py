"""Static-shape sparse (padded CSR-like) utilities.

Sparse affinities are stored as padded ``(n, k)`` value/index pairs —
padding slots carry index ``-1`` and value ``0`` (same convention as the
reference's packed output, torchdr/utils/sparse.py:118-140).

The reference symmetrizes with ``torch.unique`` + dynamic-width repacking
(torchdr/utils/sparse.py:38-206), which is shape-dynamic and host-driven.
Under XLA everything must be static: we instead sort the fixed-size
``2nk`` edge list by linearized key, merge adjacent duplicates, and pack
into a fixed ``(n, 2k)`` padded layout. One sort + a few segment scans —
fully jit-compatible and TPU-resident.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax import lax


@jax.jit
def symmetric_degrees(indices: jnp.ndarray) -> jnp.ndarray:
    """Upper bound on per-row nnz of P + Pᵀ: own out-degree + in-degree.

    (Duplicate (i,j)/(j,i) pairs only shrink the true width, so this is a
    safe static packing bound.)
    """
    n, _ = indices.shape
    valid = indices >= 0
    out_deg = jnp.sum(valid, axis=1)
    in_deg = (
        jnp.zeros((n + 1,), jnp.int32)
        .at[jnp.where(valid, indices, n)]
        .add(1)[:n]
    )
    return out_deg + in_deg


#: auto-k_out memory guard: ~256M entries ≈ 1 GB f32 + 1 GB int32 output
_AUTO_KOUT_BUDGET_ENTRIES = 256 * 1024 * 1024


def symmetrize_sparse(
    values: jnp.ndarray,
    indices: jnp.ndarray,
    mode: str = "sum_minus_prod",
    k_out: int | None = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Symmetrize a padded sparse matrix P.

    - ``mode="sum"``: Q = P + Pᵀ
    - ``mode="sum_minus_prod"``: Q = P + Pᵀ - P∘Pᵀ (UMAP fuzzy union)

    The output width is data-dependent (hub points have in-degree ≫ k), so
    unless ``k_out`` is given we compute the max symmetric degree in a tiny
    jitted pass and host-read it — one scalar sync per affinity build, the
    static-shape analog of the reference's dynamic ``max_k_out`` repack
    (torchdr/utils/sparse.py:118-125). Rows wider than ``k_out`` drop their
    overflow edges (only possible when a manual cap is passed).

    Parameters
    ----------
    values : (n, k) float array; padding slots must hold 0.
    indices : (n, k) int array; padding slots must hold -1.
    k_out : optional static output width; rounded up to a multiple of 8
        for TPU sublane alignment when computed automatically.

    Returns
    -------
    (values_out, indices_out) of shape (n, k_out), padded with 0 / -1.
    """
    max_deg = int(jnp.max(symmetric_degrees(indices)))
    if k_out is None:
        k_out = max(8, -(-max_deg // 8) * 8)
        # Memory guard for the auto width: hub in-degree grows unbounded
        # with n, and the (n, k_out) output pair costs 8·n·k_out bytes.
        # Cap at ~256M entries (1 GB f32 + 1 GB int32), dropping only the
        # WEAKEST edges of hub rows (the packing already orders by value).
        cap = max(
            8, (_AUTO_KOUT_BUDGET_ENTRIES // max(1, values.shape[0])) // 8 * 8
        )
        if k_out > cap:
            import warnings

            warnings.warn(
                f"[TorchDR-TPU] symmetric degree {max_deg} exceeds the "
                f"auto width budget at n={values.shape[0]}; capping k_out "
                f"at {cap} (weakest hub edges dropped). Pass k_out to "
                "override."
            )
            k_out = cap
    # Value-priority packing (strongest edges first) costs a second full
    # edge-list sort; it only CHANGES the result when some row overflows
    # k_out. Skip it otherwise — at 1.3M×30 the symmetrize is sort-bound
    # (~20 s warm) and the common uncapped case halves.
    return _symmetrize_sparse_impl(
        values, indices, mode, k_out, value_order=k_out < max_deg
    )


@functools.partial(jax.jit, static_argnames=("mode", "k_out", "value_order"))
def _symmetrize_sparse_impl(
    values: jnp.ndarray,
    indices: jnp.ndarray,
    mode: str,
    k_out: int,
    value_order: bool = True,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    if mode not in ("sum", "sum_minus_prod"):
        raise ValueError(f"Unsupported mode {mode!r}")
    n, k = values.shape

    rows = jnp.broadcast_to(jnp.arange(n)[:, None], (n, k)).reshape(-1)
    cols = indices.reshape(-1)
    v = values.reshape(-1)
    valid = cols >= 0

    # Edge list of P and Pᵀ as (row, col) pairs. No linearized row*n+col key:
    # it overflows int32 beyond n ≈ 46k (and x64 is off on TPU). Invalid
    # edges get row = n so they sort last and never merge with real edges.
    er = jnp.concatenate(
        [jnp.where(valid, rows, n), jnp.where(valid, jnp.maximum(cols, 0), n)]
    )
    ec = jnp.concatenate(
        [jnp.where(valid, jnp.maximum(cols, 0), n), jnp.where(valid, rows, n)]
    )
    vals = jnp.concatenate([v, v])
    is_P = jnp.concatenate(
        [jnp.ones_like(v, dtype=bool), jnp.zeros_like(v, dtype=bool)]
    )

    # Lexicographic (row, col) order in ONE multi-operand sort: payloads
    # ride the sort network instead of being re-gathered per argsort (the
    # argsort-chain formulation was 4 sorts + 12 full-size gathers over
    # the 2nk edge list — sort-bound at 1.3M×30).
    er, ec, vals, is_P = lax.sort(
        (er, ec, vals, is_P.astype(jnp.int32)), num_keys=2
    )
    is_P = is_P.astype(bool)

    m = er.shape[0]  # 2nk, static
    prev_r = jnp.concatenate([jnp.full((1,), -1, er.dtype), er[:-1]])
    prev_c = jnp.concatenate([jnp.full((1,), -1, ec.dtype), ec[:-1]])
    next_r = jnp.concatenate([er[1:], jnp.full((1,), -2, er.dtype)])
    next_c = jnp.concatenate([ec[1:], jnp.full((1,), -2, ec.dtype)])
    is_head = ((er != prev_r) | (ec != prev_c)) & (er < n)
    pair_next = (er == next_r) & (ec == next_c)  # unique cols → groups of ≤ 2

    next_vals = jnp.concatenate([vals[1:], jnp.zeros((1,), vals.dtype)])
    next_is_P = jnp.concatenate([is_P[1:], jnp.zeros((1,), bool)])

    vP = vals * is_P + jnp.where(pair_next, next_vals * next_is_P, 0.0)
    vPT = vals * (~is_P) + jnp.where(pair_next, next_vals * (~next_is_P), 0.0)
    if mode == "sum":
        v_comb = vP + vPT
    else:
        v_comb = vP + vPT - vP * vPT

    # Pack heads row-wise, strongest value first: when k_out caps the
    # width, overflow drops the WEAKEST edges of hub rows (an arbitrary
    # column-order drop measurably hurts hub-heavy high-d graphs). One
    # (row, -value) lexicographic sort; non-heads sort behind every head.
    # When no row can overflow (value_order=False) heads are already
    # grouped by row from the first sort — skip the second sort entirely.
    if value_order:
        row_key = jnp.where(is_head, er, n)
        val_key = jnp.where(is_head, -v_comb, jnp.inf)
        _, _, er, ec, v_comb, is_head = lax.sort(
            (row_key, val_key, er, ec, v_comb, is_head.astype(jnp.int32)),
            num_keys=2,
        )
        is_head = is_head.astype(bool)

    head_rank = jnp.cumsum(is_head.astype(jnp.int32)) - 1  # rank among heads
    # First head rank per row (scatter-min).
    row_start = jnp.full((n,), m, jnp.int32)
    row_start = row_start.at[jnp.where(is_head, er, n - 1)].min(
        jnp.where(is_head, head_rank, m)
    )
    slot = head_rank - row_start[jnp.clip(er, 0, n - 1)]

    # 2D scatter with a dump ROW (row n): a flattened er*k_out+slot index
    # overflows int32 once n·k_out > 2³¹ (hit at 1.3M with an uncapped
    # hub-degree k_out), and x64 is off on TPU.
    keep = is_head & (slot < k_out)
    row_t = jnp.where(keep, er, n)
    col_t = jnp.where(keep, jnp.maximum(slot, 0), 0)
    out_vals = (
        jnp.zeros((n + 1, k_out), values.dtype)
        .at[row_t, col_t]
        .set(jnp.where(keep, v_comb, 0.0))
    )
    out_idx = (
        jnp.full((n + 1, k_out), -1, indices.dtype)
        .at[row_t, col_t]
        .set(jnp.where(keep, ec.astype(indices.dtype), -1))
    )
    return out_vals[:-1], out_idx[:-1]


def sparse_to_dense(values: jnp.ndarray, indices: jnp.ndarray, n_cols: int) -> jnp.ndarray:
    """Densify a padded sparse matrix (tests / small-n paths)."""
    n, k = values.shape
    rows = jnp.broadcast_to(jnp.arange(n)[:, None], (n, k))
    valid = indices >= 0
    dense = jnp.zeros((n, n_cols), values.dtype)
    return dense.at[rows, jnp.maximum(indices, 0)].add(jnp.where(valid, values, 0.0))
