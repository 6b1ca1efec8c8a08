"""Pallas TPU kernel: fused shared-negative UMAP repulsion gradient.

The shared-negatives repulsion (models/neighbor/base.py:196-233; the
TPU redesign of reference torchdr/neighbor_embedding/umap.py:266-292)
costs XLA three materialized (n, S) HBM arrays per step — the gram/D
block, the ``D**b`` power and the coefficient — because the elementwise
chain sits between two matmuls XLA cannot fuse through. At n = 1.3M and
S = 512 that is ~8 GB of HBM traffic per optimizer step; the round-2
profile put the (n, S) pow/div chain at ~0.25 ns/element, the dominant
per-step cost of the 60k north-star config.

This kernel exploits the one fact the generic matmul formulation wastes:
the embedding dimension d is tiny (2-3). Each coordinate of the shared
negative set is a single (1, S) lane vector resident in VMEM, so for a
(B,) row block the squared distances are d broadcasted VPU subtract-
square-accumulate passes — no gram matmul, no (n, S) HBM intermediate,
and the coefficient chain and both reductions (Σ_s coef and Σ_s coef·z_s)
fold into the same VMEM tile. HBM traffic per step drops to reading Z
once and writing the (n, d) gradient once.

Numerics match the XLA path: coef = -2b / ((D + eps)(1 + a·D^b)) with
self-collisions masked, per-row weight (neg_counts · rate / S) applied,
and the final ±4 clip.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _repulsion_kernel(z_ref, znegt_ref, negid_ref, w_ref, out_ref, *, a, b, eps, block):
    i = pl.program_id(0)
    z = z_ref[:]  # (B, d)
    d = z.shape[1]
    znegt = znegt_ref[:]  # (d, S)

    # squared distances by per-coordinate broadcast: (B,1) - (1,S)
    D = jnp.zeros((z.shape[0], znegt.shape[1]), jnp.float32)
    for c in range(d):
        dc = z[:, c : c + 1] - znegt[c : c + 1, :]
        D = D + dc * dc

    # self-collision mask: global row id vs negative sample id
    row = i * block + jax.lax.broadcasted_iota(jnp.int32, (z.shape[0], 1), 0)
    valid = row != negid_ref[:]  # (B, S)

    t = jnp.exp(b * jnp.log(jnp.maximum(D, 1e-30)))  # D^b
    coef = -2.0 * b / ((D + eps) * (1.0 + a * t))
    coef = jnp.where(valid, coef, 0.0)

    csum = jnp.sum(coef, axis=1, keepdims=True)  # (B, 1)
    w = w_ref[:]  # (B, 1)
    cols = []
    for c in range(d):
        cvec = jnp.sum(coef * znegt[c : c + 1, :], axis=1, keepdims=True)
        cols.append(jnp.clip((csum * z[:, c : c + 1] - cvec) * w, -4.0, 4.0))
    out_ref[:] = jnp.concatenate(cols, axis=1)


@functools.partial(
    jax.jit, static_argnames=("a", "b", "eps", "block", "interpret")
)
def fused_shared_repulsion(
    Z,
    neg_ids,
    weight,
    a: float,
    b: float,
    eps: float = 1e-3,
    block: int = 512,
    interpret: bool = False,
):
    """Gradient of the shared-negative UMAP repulsion.

    Parameters
    ----------
    Z : (n, d) float32 embedding, d small (2-8).
    neg_ids : (S,) int32 indices of the shared negative sample, S % 128 == 0.
    weight : (n,) float32 per-row weight (neg_counts · rate / S), already
        including everything that multiplies the coefficient row.
    a, b, eps : UMAP output-kernel constants.

    Returns
    -------
    (n, d) float32 gradient, clipped to ±4 (matches the XLA path).
    """
    n, d = Z.shape
    S = neg_ids.shape[0]
    Zneg = Z[neg_ids]  # (S, d) — one tiny gather, XLA-side
    znegt = Zneg.T.astype(jnp.float32)  # (d, S)

    n_pad = -(-n // block) * block
    if n_pad != n:
        Z = jnp.concatenate([Z, jnp.zeros((n_pad - n, d), Z.dtype)], axis=0)
        weight = jnp.concatenate(
            [weight, jnp.zeros((n_pad - n,), weight.dtype)], axis=0
        )

    grid = (n_pad // block,)
    out = pl.pallas_call(
        functools.partial(
            _repulsion_kernel, a=float(a), b=float(b), eps=float(eps), block=block
        ),
        out_shape=jax.ShapeDtypeStruct((n_pad, d), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((block, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d, S), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, S), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (block, d), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        interpret=interpret,
    )(
        Z.astype(jnp.float32),
        znegt,
        neg_ids.astype(jnp.int32).reshape(1, S),
        weight.astype(jnp.float32).reshape(-1, 1),
    )
    return out[:n]
