"""Phase-by-phase timing of the IVF v2 search pipeline on the real chip.

Each phase variant is its own tiny jit (compiles are cheap for XLA-only
programs). Self-query fast path: queries = index.X_sorted.
"""

import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import jax.numpy as jnp
import numpy as np
from jax import lax

from torchdr_tpu.ops.ivf import ivf_build
from torchdr_tpu.ops.metrics import MASK_VALUE, sq_dists_from_gram

N, D, K = 1_000_000, 128, 15
BLOCK = 256


def log(**kw):
    print("JSON " + json.dumps(kw), flush=True)


def force(x):
    return float(jnp.sum(jnp.where(jnp.isfinite(x), x, 0)))


@functools.partial(
    jax.jit, static_argnames=("nprobe", "block", "cap", "m", "phase")
)
def search_phase(Qs, q_rows, arrays, nprobe, block, cap, m, phase):
    centroids, X_sorted, ids_sorted, offsets, counts = arrays
    nq = Qs.shape[0]
    n_blocks = nq // block
    nlist = centroids.shape[0]
    c_norm = jnp.sum(centroids * centroids, axis=-1)
    x_norms = jnp.sum(X_sorted * X_sorted, axis=-1)
    pq = max(2, nprobe // 2)

    def process(b):
        Qb = lax.dynamic_slice_in_dim(Qs, b * block, block, axis=0)
        rows = lax.dynamic_slice_in_dim(q_rows, b * block, block, axis=0)
        qn = jnp.sum(Qb * Qb, axis=-1)
        gq = jnp.matmul(Qb, centroids.T, preferred_element_type=jnp.float32)
        Dc = sq_dists_from_gram(qn, c_norm, gq)
        _, nom = lax.top_k(-Dc, pq)
        weights = 1.0 / (1.0 + jnp.arange(pq, dtype=jnp.float32))
        votes = (
            jnp.zeros((nlist,), jnp.float32)
            .at[nom.reshape(-1)]
            .add(jnp.broadcast_to(weights[None, :], nom.shape).reshape(-1))
        )
        score = votes - jnp.min(Dc, axis=0) / 1e12
        _, probe = lax.top_k(score, nprobe)

        if phase == "probe_only":
            return jnp.sum(probe.astype(jnp.float32)) * jnp.ones((block,))

        def scan_body(j, acc):
            c = probe[j]
            start = offsets[c]
            cnt = counts[c]
            Xc = lax.dynamic_slice_in_dim(X_sorted, start, cap, axis=0)
            idc = lax.dynamic_slice_in_dim(ids_sorted, start, cap, axis=0)
            nc = lax.dynamic_slice_in_dim(x_norms, start, cap, axis=0)
            g = jnp.matmul(Qb, Xc.T, preferred_element_type=jnp.float32)
            s = nc[None, :] - 2.0 * g
            invalid = (jnp.arange(cap)[None, :] >= cnt) | (
                idc[None, :] == rows[:, None]
            )
            s = s + MASK_VALUE * invalid.astype(s.dtype)
            return acc + jnp.min(s, axis=1)

        if phase == "scan_min":
            return lax.fori_loop(0, nprobe, scan_body, jnp.zeros((block,)))

        def merge_body(j, carry):
            best_s, best_p = carry
            c = probe[j]
            start = offsets[c]
            cnt = counts[c]
            Xc = lax.dynamic_slice_in_dim(X_sorted, start, cap, axis=0)
            idc = lax.dynamic_slice_in_dim(ids_sorted, start, cap, axis=0)
            nc = lax.dynamic_slice_in_dim(x_norms, start, cap, axis=0)
            g = jnp.matmul(Qb, Xc.T, preferred_element_type=jnp.float32)
            s = nc[None, :] - 2.0 * g
            invalid = (jnp.arange(cap)[None, :] >= cnt) | (
                idc[None, :] == rows[:, None]
            )
            s = s + MASK_VALUE * invalid.astype(s.dtype)
            cand_s = jnp.concatenate([best_s, s], axis=1)
            neg, sel = lax.top_k(-cand_s, m)
            if phase == "merge_scores":
                return -neg, best_p
            pos = start + jnp.arange(cap, dtype=jnp.int32)
            cand_p = jnp.concatenate(
                [best_p, jnp.broadcast_to(pos[None, :], s.shape)], axis=1
            )
            return -neg, jnp.take_along_axis(cand_p, sel, axis=1)

        best_s = jnp.full((block, m), MASK_VALUE, jnp.float32)
        best_p = jnp.zeros((block, m), jnp.int32)
        best_s, best_p = lax.fori_loop(0, nprobe, merge_body, (best_s, best_p))
        if phase in ("merge_scores", "merge_pos"):
            return jnp.sum(best_s, axis=1) + jnp.sum(best_p, axis=1)

        qn2 = jnp.sum(Qb * Qb, axis=-1)
        Xg = X_sorted[best_p]
        g2 = jnp.einsum(
            "bd,bmd->bm", Qb, Xg,
            precision=lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32,
        )
        D2 = qn2[:, None] + x_norms[best_p] - 2.0 * g2
        D2 = jnp.where(best_s >= MASK_VALUE * 0.5, MASK_VALUE, D2)
        negk, sel = lax.top_k(-D2, K)
        return jnp.sum(-negk, axis=1) + jnp.sum(
            jnp.take_along_axis(best_p, sel, axis=1), axis=1
        ).astype(jnp.float32)

    out = lax.map(process, jnp.arange(n_blocks))
    return out


@functools.partial(jax.jit, static_argnames=("m",))
def pure_gather(X_sorted, pos, m):
    # pos: (n_blocks, block, m) positions
    def proc(p):
        Xg = X_sorted[p]  # (block, m, d)
        return jnp.sum(Xg, axis=(1, 2))

    return lax.map(proc, pos)


@jax.jit
def pure_scatter(d, ids, n):
    out = jnp.zeros((n, d.shape[1]), d.dtype)
    return out.at[ids].set(d)


def main():
    rng = np.random.default_rng(0)
    centers = rng.normal(scale=10.0, size=(1000, D)).astype(np.float32)
    X = jnp.asarray(
        centers[rng.integers(0, 1000, N)] + rng.normal(size=(N, D)).astype(np.float32)
    )
    force(X[:8])
    idx = ivf_build(X, n_clusters=1024, kmeans_iters=20)
    arrays = (idx.centroids, idx.X_sorted, idx.ids_sorted, idx.offsets, idx.counts)
    cap = idx.cap
    log(step="build", cap=cap)

    n = N
    Qs = idx.X_sorted[:n]
    q_rows = idx.ids_sorted[:n]

    for phase in ("probe_only", "scan_min", "merge_scores", "merge_pos", "full"):
        for m in ((16, 32) if phase in ("merge_scores", "merge_pos", "full") else (32,)):
            try:
                t0 = time.perf_counter()
                out = search_phase(Qs, q_rows, arrays, 8, BLOCK, cap, m, phase)
                force(out)
                cold = time.perf_counter() - t0
                t0 = time.perf_counter()
                out = search_phase(Qs, q_rows, arrays, 8, BLOCK, cap, m, phase)
                force(out)
                warm = time.perf_counter() - t0
                log(step="phase", phase=phase, m=m, cold_s=round(cold, 2), warm_s=round(warm, 3))
            except Exception as e:
                log(step="phase", phase=phase, m=m, error=str(e)[:200])

    # pure gather at m=32: positions random within each block's clusters
    pos = jnp.asarray(
        rng.integers(0, n, size=(n // BLOCK, BLOCK, 32)), dtype=jnp.int32
    )
    t0 = time.perf_counter()
    force(pure_gather(idx.X_sorted, pos, 32))
    cold = time.perf_counter() - t0
    t0 = time.perf_counter()
    force(pure_gather(idx.X_sorted, pos, 32))
    log(step="pure_gather_m32", cold_s=round(cold, 2), warm_s=round(time.perf_counter() - t0, 3))

    d15 = jnp.ones((n, K), jnp.float32)
    ids = idx.ids_sorted[:n]
    t0 = time.perf_counter()
    force(pure_scatter(d15, ids, n))
    cold = time.perf_counter() - t0
    t0 = time.perf_counter()
    force(pure_scatter(d15, ids, n))
    log(step="pure_scatter", cold_s=round(cold, 2), warm_s=round(time.perf_counter() - t0, 3))


if __name__ == "__main__":
    main()
