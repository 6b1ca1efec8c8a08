"""Product quantization: the compressed-memory ANN tier.

Plays Faiss IVFPQ's role (reference: torchdr/distance/faiss.py:113-221;
measured recall ceiling ~20-33% at M=16 on clustered 1M data,
benchmarks/faiss/BENCHMARK_RESULTS.md:11-13,72). Design:

- ``pq_train``: per-subspace k-means codebooks, all M subspaces trained in
  one ``vmap`` (M independent 256-way k-means on (train, d/M) slices).
- ``pq_encode``: blockwise nearest-codeword assignment → (n, M) uint8 —
  16 bytes/vector at M=16, a 32× compression of 128-d f32.
- ``pq_search``: asymmetric distance computation (ADC). Per query block,
  the (block, M, 256) LUT of query-to-codeword sub-distances is one
  batched MXU matmul; scanning a database chunk is M per-subspace LUT
  column-gathers (the 256-entry tables live in VMEM) — no decompression.

Exactness note: ADC ranks by quantized distance; like Faiss IVFPQ this
caps recall well below the Flat/IVF tiers. Use it when the database
doesn't fit HBM; pair with ``refine`` (exact re-rank against provided f32
rows) when the originals are reachable.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from .kmeans import kmeans_fit
from .metrics import MASK_VALUE


class PQCodebook(NamedTuple):
    codebooks: jnp.ndarray  # (M, 256, dsub)
    M: int
    dsub: int


def pq_train(
    X_train: jnp.ndarray, M: int = 16, key=None, kmeans_iters: int = 20
) -> PQCodebook:
    """Train per-subspace codebooks (256 codewords each)."""
    n, d = X_train.shape
    if d % M != 0:
        raise ValueError(f"[TorchDR-TPU] ERROR : d={d} not divisible by M={M}.")
    dsub = d // M
    key = key if key is not None else jax.random.PRNGKey(0)
    sub = X_train.reshape(n, M, dsub).transpose(1, 0, 2)  # (M, n, dsub)
    keys = jax.random.split(key, M)

    def fit_one(Xs, k):
        centers, _, _ = kmeans_fit(Xs, 256, k, max_iter=kmeans_iters)
        return centers

    codebooks = jax.vmap(fit_one)(sub, keys)  # (M, 256, dsub)
    return PQCodebook(codebooks, M, dsub)


@functools.partial(jax.jit, static_argnames=("block",))
def pq_encode(X: jnp.ndarray, cb: PQCodebook, block: int = 8192) -> jnp.ndarray:
    """Encode rows to (n, M) uint8 codes, blockwise."""
    n, d = X.shape
    M, dsub = cb.codebooks.shape[0], cb.codebooks.shape[2]
    n_pad = -(-n // block) * block
    Xp = jnp.zeros((n_pad, d), X.dtype).at[:n].set(X)
    c_norm = jnp.sum(cb.codebooks * cb.codebooks, axis=-1)  # (M, 256)

    def process(b):
        Xb = lax.dynamic_slice_in_dim(Xp, b * block, block, axis=0)
        sub = Xb.reshape(block, M, dsub)
        gram = jnp.einsum(
            "bmd,mcd->bmc", sub, cb.codebooks, preferred_element_type=jnp.float32
        )
        D = c_norm[None] - 2.0 * gram  # rank-equivalent per (b, m)
        return jnp.argmin(D, axis=-1).astype(jnp.uint8)

    codes = lax.map(process, jnp.arange(n_pad // block))
    return codes.reshape(-1, M)[:n]


@functools.partial(jax.jit, static_argnames=("k", "block", "db_chunk"))
def pq_search(
    Q: jnp.ndarray,
    codes: jnp.ndarray,
    cb: PQCodebook,
    k: int = 15,
    exclude_rows: jnp.ndarray | None = None,
    block: int = 256,
    db_chunk: int = 65_536,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """ADC brute-force search of PQ codes: top-k by quantized distance.

    ``exclude_rows[i]`` (optional) masks one database row per query
    (self-exclusion). Returns (approx dists, indices).
    """
    nq, d = Q.shape
    n = codes.shape[0]
    M, dsub = cb.codebooks.shape[0], cb.codebooks.shape[2]
    nq_pad = -(-nq // block) * block
    Qp = jnp.zeros((nq_pad, d), Q.dtype).at[:nq].set(Q)
    excl = (
        jnp.full((nq_pad,), -1, jnp.int32)
        if exclude_rows is None
        else jnp.full((nq_pad,), -1, jnp.int32).at[:nq].set(exclude_rows)
    )
    n_chunks = -(-n // db_chunk)
    codes_p = jnp.zeros((n_chunks * db_chunk, M), jnp.uint8).at[:n].set(codes)
    c_norm = jnp.sum(cb.codebooks * cb.codebooks, axis=-1)  # (M, 256)

    def process(b):
        Qb = lax.dynamic_slice_in_dim(Qp, b * block, block, axis=0)
        rows = lax.dynamic_slice_in_dim(excl, b * block, block, axis=0)
        sub = Qb.reshape(block, M, dsub)
        gram = jnp.einsum(
            "bmd,mcd->bmc", sub, cb.codebooks, preferred_element_type=jnp.float32
        )
        # per-query LUT of sub-distances (‖q_m‖² is constant per row → omit)
        lut = c_norm[None] - 2.0 * gram  # (block, M, 256)

        def chunk_step(j, carry):
            best_d, best_i = carry
            Cc = lax.dynamic_slice_in_dim(codes_p, j * db_chunk, db_chunk, axis=0)
            cols = j * db_chunk + jnp.arange(db_chunk)
            # Σ_m lut[b, m, code[c, m]]: M column-gathers from 256-wide VMEM
            # tables (one-hot matmuls would cost 32× the FLOPs)
            D = jnp.zeros((block, db_chunk), jnp.float32)
            for mi in range(M):
                D = D + lut[:, mi, :][:, Cc[:, mi].astype(jnp.int32)]
            invalid = (cols[None, :] >= n) | (cols[None, :] == rows[:, None])
            D = D + MASK_VALUE * invalid.astype(D.dtype)
            cand_d = jnp.concatenate([best_d, D], axis=1)
            cand_i = jnp.concatenate(
                [best_i, jnp.broadcast_to(cols[None, :], D.shape)], axis=1
            )
            negk, sel = lax.top_k(-cand_d, k)
            return -negk, jnp.take_along_axis(cand_i, sel, axis=1)

        init = (
            jnp.full((block, k), MASK_VALUE, jnp.float32),
            jnp.full((block, k), -1, jnp.int32),
        )
        return lax.fori_loop(0, n_chunks, chunk_step, init)

    dists, idx = lax.map(process, jnp.arange(nq_pad // block))
    return dists.reshape(-1, k)[:nq], idx.reshape(-1, k)[:nq]


def pq_knn(
    X: jnp.ndarray,
    k: int = 15,
    M: int = 16,
    key=None,
    train_size: int = 65_536,
    refine_from: jnp.ndarray | None = None,
    refine_factor: int = 4,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Self-kNN through PQ codes; optional exact refinement.

    Recall is intrinsically capped by the quantization error — on
    clustered data expect the same ~20-30% band the reference measured
    for Faiss IVFPQ (BENCHMARK_RESULTS.md:11-13,72); this is the memory
    tier, not the speed tier. ``refine_from`` (f32 rows to re-rank the
    top ``refine_factor·k`` ADC candidates against) recovers part of the
    loss; the reference ships no refinement at all.
    """
    n = X.shape[0]
    key = key if key is not None else jax.random.PRNGKey(0)
    train = (
        X if n <= train_size
        else jax.random.choice(key, X, (train_size,), replace=False)
    )
    cb = pq_train(train, M=M, key=key)
    codes = pq_encode(X, cb)
    rows = jnp.arange(n, dtype=jnp.int32)
    if refine_from is None:
        return pq_search(X, codes, cb, k=k, exclude_rows=rows)
    d_adc, i_adc = pq_search(
        X, codes, cb, k=refine_factor * k, exclude_rows=rows
    )
    Xg = refine_from[i_adc]  # (n, rk, d)
    diff = X[:, None, :] - Xg
    D = jnp.sum(diff * diff, axis=-1)
    negk, sel = lax.top_k(-D, k)
    return -negk, jnp.take_along_axis(i_adc, sel, axis=1)
