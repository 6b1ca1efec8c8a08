"""Distance metrics as pure JAX functions.

TPU-native replacement for the reference's three distance backends
(reference: torchdr/distance/torch.py:12-18, torchdr/distance/keops.py,
torchdr/distance/faiss.py). One set of metric kernels serves every caller;
memory-efficiency is handled by blockwise streaming (ops/reduce.py) and
Pallas kernels (ops/pallas/), not by backend polymorphism.

All dense pairwise forms are expressed as a single MXU matmul plus
rank-1 norm corrections so XLA can tile them onto the systolic array.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax

LIST_METRICS = ["euclidean", "sqeuclidean", "manhattan", "angular", "sqhyperbolic"]

# Distance used to mask out self/invalid entries when selecting neighbors.
MASK_VALUE = 1e12


def check_metric(metric: str) -> None:
    if metric not in LIST_METRICS:
        raise ValueError(f"[TorchDR-TPU] ERROR : The '{metric}' distance is not supported.")


PRECISIONS = {
    "highest": lax.Precision.HIGHEST,  # exact f32 (6-pass bf16 on MXU)
    "high": lax.Precision.HIGH,        # 3-pass bf16 (~tf32 accuracy)
    "default": lax.Precision.DEFAULT,  # raw bf16 inputs, f32 accumulate
}


def _gram(X: jnp.ndarray, Y: jnp.ndarray, precision: str = "highest") -> jnp.ndarray:
    """X @ Y.T on the MXU.

    Distances feed k-selection and entropy calibration, where bf16 rounding
    of the cross term can flip neighbor ranks — default HIGHEST (exact f32).
    "high"/"default" trade ~1e-3 relative distance error for 2-6x MXU
    throughput; on clustered data recall@k stays >99% (bench reports both).
    """
    return jnp.matmul(
        X, Y.T, preferred_element_type=jnp.float32, precision=PRECISIONS[precision]
    )


def sq_dists_from_gram(x_norm, y_norm, gram):
    """Squared euclidean distances from precomputed norms and gram block."""
    return jnp.maximum(x_norm[:, None] + y_norm[None, :] - 2.0 * gram, 0.0)


def pairwise_block(
    X: jnp.ndarray, Y: jnp.ndarray, metric: str = "sqeuclidean", precision: str = "highest"
) -> jnp.ndarray:
    """Dense pairwise distances between two (possibly small) blocks.

    Semantics match the reference backend (torchdr/distance/torch.py:88-108):
    sqeuclidean / euclidean via norms + gram, manhattan via broadcast,
    angular = -<x, y>, sqhyperbolic = arccosh(1 + 2 d² / ((1-|x|²)(1-|y|²)))².
    """
    check_metric(metric)
    if metric == "manhattan":
        # no matmul form exists; stream over feature chunks so the live
        # (q, db, dc) intermediate stays bounded instead of (q, db, d)
        # (VPU-bound either way — L1 has no MXU mapping)
        d = X.shape[1]
        dc = 32
        if d <= 2 * dc:
            return jnp.sum(jnp.abs(X[:, None, :] - Y[None, :, :]), axis=-1)
        n_chunks = -(-d // dc)
        pad = n_chunks * dc - d
        Xp = jnp.pad(X, ((0, 0), (0, pad)))
        Yp = jnp.pad(Y, ((0, 0), (0, pad)))

        def step(acc, c):
            xc = lax.dynamic_slice_in_dim(Xp, c * dc, dc, axis=1)
            yc = lax.dynamic_slice_in_dim(Yp, c * dc, dc, axis=1)
            return acc + jnp.sum(jnp.abs(xc[:, None, :] - yc[None, :, :]), -1), None

        acc, _ = lax.scan(
            step,
            jnp.zeros((X.shape[0], Y.shape[0]), jnp.float32),
            jnp.arange(n_chunks),
        )
        return acc
    if metric == "angular":
        return -_gram(X, Y, precision)

    x_norm = jnp.sum(X * X, axis=-1)
    y_norm = jnp.sum(Y * Y, axis=-1)
    sq = sq_dists_from_gram(x_norm, y_norm, _gram(X, Y, precision))
    if metric == "sqeuclidean":
        return sq
    if metric == "euclidean":
        return jnp.sqrt(sq)
    # sqhyperbolic (Poincaré ball). The arccosh argument is clamped at a
    # f32-representable margin above 1: the reference's +1e-8 rounds away in
    # f32 and arccosh'(1)=∞ NaNs the gradient of zero-distance pairs; the
    # max() both keeps the value finite and zeroes the diagonal gradient.
    denom = (1.0 - x_norm)[:, None] * (1.0 - y_norm)[None, :]
    return jnp.arccosh(jnp.maximum(1.0 + 2.0 * (sq / denom), 1.0 + 1e-7)) ** 2


def indexed_block(Xq: jnp.ndarray, Yk: jnp.ndarray, metric: str = "sqeuclidean") -> jnp.ndarray:
    """Distances between queries ``Xq (n, d)`` and per-query keys ``Yk (n, k, d)``.

    Gather-based hot kernel of every sparse training loop (reference:
    torchdr/distance/base.py:252-405). Pure VPU elementwise + reduce;
    XLA fuses the subtraction/square/sum chain.
    """
    check_metric(metric)
    diff = Xq[:, None, :] - Yk
    if metric == "manhattan":
        return jnp.sum(jnp.abs(diff), axis=-1)
    if metric == "angular":
        return -jnp.sum(Xq[:, None, :] * Yk, axis=-1)
    sq = jnp.sum(diff * diff, axis=-1)
    if metric == "sqeuclidean":
        return sq
    if metric == "euclidean":
        return jnp.sqrt(sq)
    x_norm = jnp.sum(Xq * Xq, axis=-1)[:, None]
    y_norm = jnp.sum(Yk * Yk, axis=-1)
    denom = (1.0 - x_norm) * (1.0 - y_norm)
    return (
        jnp.arccosh(
            jnp.maximum(1.0 + 2.0 * (jnp.maximum(sq, 0.0) / denom), 1.0 + 1e-7)
        )
        ** 2
    )
