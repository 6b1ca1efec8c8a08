"""Blockwise streaming O(n²) reductions — the KeOps replacement.

The reference streams O(n²) logsumexp/sum reductions through KeOps
LazyTensors (reference: torchdr/distance/keops.py:17-105,
torchdr/utils/utils.py:303-410) so the n×n kernel matrix is never
materialized. On TPU the same role is played by a flash-attention-style
blockwise pass: query rows are processed in tiles, each tile is one MXU
matmul (the gram block of the squared-euclidean distance) followed by a
fused VPU reduction, and only O(block · n) memory is live at once.

The backward pass is a custom VJP that *recomputes* the block kernel and
accumulates the gradient with two more matmuls per tile — no n×n residuals
are stored (this is what ``jax.grad`` through a naive ``lax.map`` would do).

Used by: TSNE / SNE repulsion (reference: torchdr/neighbor_embedding/
tsne.py:172-180, sne.py:172-178), InfoTSNE-style contrastive terms, and any
dense log-affinity normalization at scale.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.scipy.special import logsumexp as _lse

KERNELS = ("student", "gaussian")


def _log_kernel(sq_dists: jnp.ndarray, kernel: str) -> jnp.ndarray:
    if kernel == "student":
        return -jnp.log1p(sq_dists)
    if kernel == "gaussian":
        return -sq_dists
    raise ValueError(f"[TorchDR-TPU] unknown kernel '{kernel}'")


def _dlogk_dsq(sq_dists: jnp.ndarray, kernel: str) -> jnp.ndarray:
    """d log k / d d² for the supported kernels."""
    if kernel == "student":
        return -1.0 / (1.0 + sq_dists)
    return -jnp.ones_like(sq_dists)


def _pad_rows(Z: jnp.ndarray, block: int) -> Tuple[jnp.ndarray, int]:
    n = Z.shape[0]
    pad = (-n) % block
    if pad:
        Z = jnp.concatenate([Z, jnp.zeros((pad, Z.shape[1]), Z.dtype)], axis=0)
    return Z, pad


def _block_logq(Zb, Z, rows, kernel, exclude_diag):
    """Log-kernel block (block, n) with diagonal / padding masked to -inf.

    ``rows`` are the queries' *global* row ids (a row shard passes its mesh
    offset); ids ≥ Z.shape[0] mark padded rows.
    """
    zb_norm = jnp.sum(Zb * Zb, axis=-1)
    z_norm = jnp.sum(Z * Z, axis=-1)
    gram = jnp.matmul(Zb, Z.T, preferred_element_type=jnp.float32)
    sq = jnp.maximum(zb_norm[:, None] + z_norm[None, :] - 2.0 * gram, 0.0)
    logq = _log_kernel(sq, kernel)
    cols = jnp.arange(Z.shape[0])
    invalid = rows[:, None] >= Z.shape[0]  # padded query rows
    if exclude_diag:
        invalid = invalid | (rows[:, None] == cols[None, :])
    return jnp.where(invalid, -jnp.inf, logq), sq, invalid


def _rowlse_fwd_general(Zq, row_offset, Z, kernel, exclude_diag, block):
    """Blockwise row-lse for a query shard ``Zq`` = rows [offset, offset+m)."""
    m = Zq.shape[0]
    block = min(block, max(8, m))
    Zqp, _ = _pad_rows(Zq, block)
    n_blocks = Zqp.shape[0] // block
    base = jnp.arange(block)

    def fwd_block(b):
        rows = row_offset + b * block + base
        Zb = lax.dynamic_slice_in_dim(Zqp, b * block, block, axis=0)
        logq, _, _ = _block_logq(Zb, Z, rows, kernel, exclude_diag)
        return _lse(logq, axis=1)

    return lax.map(fwd_block, jnp.arange(n_blocks)).reshape(-1)[:m]


def _rowlse_bwd_general(Zq, row_offset, Z, row_lse, g, kernel, exclude_diag, block):
    """Backward for a query shard: returns (dZq (m,d), dZk (n,d))."""
    m = Zq.shape[0]
    n = Z.shape[0]
    block = min(block, max(8, m))
    Zqp, _ = _pad_rows(Zq, block)
    lse_p, _ = _pad_rows(row_lse[:, None], block)
    g_p, _ = _pad_rows(g[:, None], block)
    n_blocks = Zqp.shape[0] // block
    base = jnp.arange(block)

    def bwd_block(carry, b):
        dZq, dZk = carry
        rows = row_offset + b * block + base
        Zb = lax.dynamic_slice_in_dim(Zqp, b * block, block, axis=0)
        lse_b = lax.dynamic_slice_in_dim(lse_p, b * block, block, axis=0)
        g_b = lax.dynamic_slice_in_dim(g_p, b * block, block, axis=0)
        logq, sq, invalid = _block_logq(Zb, Z, rows, kernel, exclude_diag)
        w = jnp.exp(logq - lse_b)
        c = jnp.where(invalid, 0.0, g_b * w * _dlogk_dsq(sq, kernel))
        row_c = jnp.sum(c, axis=1, keepdims=True)
        col_c = jnp.sum(c, axis=0)
        grad_q = 2.0 * (
            row_c * Zb - jnp.matmul(c, Z, preferred_element_type=jnp.float32)
        )
        grad_k = 2.0 * (
            col_c[:, None] * Z
            - jnp.matmul(c.T, Zb, preferred_element_type=jnp.float32)
        )
        dZk = dZk + grad_k
        cur = lax.dynamic_slice_in_dim(dZq, b * block, block, axis=0)
        dZq = lax.dynamic_update_slice_in_dim(dZq, cur + grad_q, b * block, axis=0)
        return (dZq, dZk), None

    init = (jnp.zeros_like(Zqp), jnp.zeros((n, Z.shape[1]), Z.dtype))
    (dZqp, dZk), _ = lax.scan(bwd_block, init, jnp.arange(n_blocks))
    return dZqp[:m], dZk


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3))
def pairwise_logkernel_rowlse(
    Z: jnp.ndarray, kernel: str = "student", exclude_diag: bool = True, block_size: int = 1024
) -> jnp.ndarray:
    """Row-wise logsumexp of ``log k(‖z_i - z_j‖²)`` without materializing n×n.

    Returns an array of shape ``(n,)``. Differentiable w.r.t. ``Z`` via a
    recomputing custom VJP. ``logsumexp(result)`` gives the global log-sum
    used by TSNE's repulsion; ``sum(result)`` gives SNE's.
    """
    return _rowlse_fwd_impl(Z, kernel, exclude_diag, block_size)


def _use_pallas() -> bool:
    """Use the fused Pallas kernel on TPU-like backends; blockwise jnp on CPU."""
    import jax

    return jax.default_backend() not in ("cpu",)


def _rowlse_fwd_impl(Z, kernel, exclude_diag, block_size):
    if _use_pallas() and Z.shape[0] >= 1024:
        from .pallas.reduce_kernel import rowlse_fwd_pallas

        return rowlse_fwd_pallas(Z, kernel, exclude_diag)
    n = Z.shape[0]
    block = min(block_size, max(8, n))
    Zp, _ = _pad_rows(Z, block)
    n_blocks = Zp.shape[0] // block
    base = jnp.arange(block)

    def fwd_block(b):
        rows = b * block + base
        Zb = lax.dynamic_slice_in_dim(Zp, b * block, block, axis=0)
        logq, _, _ = _block_logq(Zb, Z, rows, kernel, exclude_diag)
        return _lse(logq, axis=1)

    out = lax.map(fwd_block, jnp.arange(n_blocks)).reshape(-1)[:n]
    return out


def _rowlse_fwd(Z, kernel, exclude_diag, block_size):
    out = _rowlse_fwd_impl(Z, kernel, exclude_diag, block_size)
    return out, (Z, out)


def _rowlse_bwd(kernel, exclude_diag, block_size, res, g):
    Z, row_lse = res
    if _use_pallas() and Z.shape[0] >= 1024:
        from .pallas.reduce_kernel import rowlse_bwd_pallas

        return (rowlse_bwd_pallas(Z, row_lse, g, kernel, exclude_diag),)
    dZq, dZk = _rowlse_bwd_general(
        Z, 0, Z, row_lse, g, kernel, exclude_diag, block_size
    )
    return (dZk + dZq,)


pairwise_logkernel_rowlse.defvjp(_rowlse_fwd, _rowlse_bwd)


# --- mesh-sharded variant -------------------------------------------------
#
# The reference splits the dense O(n²) repulsion across ranks: each rank
# computes its row chunk and the loss is divided by world size with an
# all-reduced gradient (reference: torchdr/neighbor_embedding/tsne.py:
# 172-180, affinity_matcher.py:424-425). The TPU-native equivalent is one
# shard_map: query rows sharded over the mesh axis, Z replicated, the
# backward psums each chip's full-gradient contribution over ICI. Per-chip
# O(n²) work drops by the mesh size.


def _shard_bounds(n: int, world: int):
    from ..parallel.mesh import pad_to_multiple

    n_pad = pad_to_multiple(n, world)
    return n_pad, n_pad // world


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3, 4))
def pairwise_logkernel_rowlse_sharded(
    Z: jnp.ndarray,
    mesh,
    kernel: str = "student",
    exclude_diag: bool = True,
    block_size: int = 1024,
) -> jnp.ndarray:
    """Row-wise logsumexp of ``log k(‖z_i − z_j‖²)``, row-sharded over ``mesh``.

    Semantics identical to :func:`pairwise_logkernel_rowlse`; each device
    computes only its n/p row chunk (Pallas fused kernel on TPU, blockwise
    XLA elsewhere). The result is a global ``(n,)`` array laid out
    row-sharded on the mesh; the gradient is replicated (psum).
    """
    return _rowlse_sharded_fwd_impl(Z, mesh, kernel, exclude_diag, block_size)


def _local_rowlse(Zq, offset, Z, kernel, exclude_diag, block_size):
    if _use_pallas() and Z.shape[0] >= 1024:
        from .pallas.reduce_kernel import rowlse_fwd_pallas_general

        return rowlse_fwd_pallas_general(
            Zq, Z, offset, Z.shape[0], kernel, exclude_diag
        )
    return _rowlse_fwd_general(Zq, offset, Z, kernel, exclude_diag, block_size)


def _local_rowlse_bwd(Zq, offset, Z, lse_q, g_q, kernel, exclude_diag, block_size):
    if _use_pallas() and Z.shape[0] >= 1024:
        from .pallas.reduce_kernel import rowlse_bwd_pallas_general

        return rowlse_bwd_pallas_general(
            Zq, Z, offset, Z.shape[0], lse_q, g_q, kernel, exclude_diag
        )
    return _rowlse_bwd_general(
        Zq, offset, Z, lse_q, g_q, kernel, exclude_diag, block_size
    )


def _rowlse_sharded_fwd_impl(Z, mesh, kernel, exclude_diag, block_size):
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    axis = mesh.axis_names[0]
    world = mesh.devices.size
    n = Z.shape[0]
    n_pad, chunk = _shard_bounds(n, world)
    Zp = jnp.zeros((n_pad, Z.shape[1]), Z.dtype).at[:n].set(Z)

    def local(Zp_rep):
        offset = lax.axis_index(axis) * chunk
        Zq = lax.dynamic_slice_in_dim(Zp_rep, offset, chunk, axis=0)
        return _local_rowlse(Zq, offset, Zp_rep[:n], kernel, exclude_diag, block_size)

    out = shard_map(
        local, mesh=mesh, in_specs=(P(),), out_specs=P(axis),
        check_vma=False,
    )(Zp)
    return out[:n]


def _rowlse_sharded_fwd(Z, mesh, kernel, exclude_diag, block_size):
    out = _rowlse_sharded_fwd_impl(Z, mesh, kernel, exclude_diag, block_size)
    return out, (Z, out)


def _rowlse_sharded_bwd(mesh, kernel, exclude_diag, block_size, res, g):
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    Z, row_lse = res
    axis = mesh.axis_names[0]
    world = mesh.devices.size
    n, d = Z.shape
    n_pad, chunk = _shard_bounds(n, world)
    Zp = jnp.zeros((n_pad, d), Z.dtype).at[:n].set(Z)
    lse_p = jnp.zeros((n_pad,), row_lse.dtype).at[:n].set(row_lse)
    g_p = jnp.zeros((n_pad,), g.dtype).at[:n].set(g)

    def local(Zp_rep, lse_sh, g_sh):
        offset = lax.axis_index(axis) * chunk
        Zq = lax.dynamic_slice_in_dim(Zp_rep, offset, chunk, axis=0)
        dZq, dZk = _local_rowlse_bwd(
            Zq, offset, Zp_rep[:n], lse_sh, g_sh, kernel, exclude_diag, block_size
        )
        contrib = jnp.zeros((n_pad, d), Z.dtype).at[:n].set(dZk)
        cur = lax.dynamic_slice_in_dim(contrib, offset, chunk, axis=0)
        contrib = lax.dynamic_update_slice_in_dim(
            contrib, cur + dZq, offset, axis=0
        )
        # the gradient all-reduce (reference: affinity_matcher.py:424-425)
        return lax.psum(contrib, axis)

    dZp = shard_map(
        local, mesh=mesh, in_specs=(P(), P(axis), P(axis)), out_specs=P(),
        check_vma=False,
    )(Zp, lse_p, g_p)
    return (dZp[:n],)


pairwise_logkernel_rowlse_sharded.defvjp(_rowlse_sharded_fwd, _rowlse_sharded_bwd)


def pairwise_logkernel_logsumexp(Z, kernel="student", exclude_diag=True, block_size=1024):
    """Global log Σ_ij k(‖z_i - z_j‖²) — TSNE's exact repulsion term."""
    return _lse(pairwise_logkernel_rowlse(Z, kernel, exclude_diag, block_size))


def pairwise_logkernel_rowlse_autodiff(
    Z: jnp.ndarray,
    log_kernel_fn,
    metric: str = "sqhyperbolic",
    exclude_diag: bool = True,
    block_size: int = 1024,
) -> jnp.ndarray:
    """Blockwise row-lse for arbitrary metric/kernel, autodiff-friendly.

    Covers the O(n²) reductions the hand-written student/gaussian custom-VJP
    tier doesn't — e.g. COSNE's hyperbolic Cauchy repulsion (reference: the
    KeOps LazyTensor path covers every metric lazily, torchdr/distance/
    keops.py:17-105). Instead of a custom VJP, each (block × n) tile is
    wrapped in ``jax.checkpoint``: the backward pass *recomputes* the tile,
    so both passes stay O(block·n) memory — XLA's rematerialization is the
    TPU-idiomatic answer here.

    ``log_kernel_fn`` maps the pairwise distance block to the log-kernel
    elementwise (e.g. ``lambda D: jnp.log(g) - jnp.log(D + g**2)``).
    """
    from .metrics import pairwise_block

    n = Z.shape[0]
    block = min(block_size, max(8, n))
    Zp, _ = _pad_rows(Z, block)
    n_blocks = Zp.shape[0] // block
    base = jnp.arange(block)
    cols = jnp.arange(n)

    @functools.partial(jax.checkpoint, static_argnums=())
    def block_lse(Zp_in, Z_in, b):
        rows = b * block + base
        Zb = lax.dynamic_slice_in_dim(Zp_in, b * block, block, axis=0)
        D = pairwise_block(Zb, Z_in, metric)
        logq = log_kernel_fn(D)
        invalid = rows[:, None] >= n
        if exclude_diag:
            invalid = invalid | (rows[:, None] == cols[None, :])
        return _lse(jnp.where(invalid, -jnp.inf, logq), axis=1)

    out = lax.map(lambda b: block_lse(Zp, Z, b), jnp.arange(n_blocks))
    return out.reshape(-1)[:n]
