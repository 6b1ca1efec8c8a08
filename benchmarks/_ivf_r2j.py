"""IVF flat-scan controls: exact-merge vs approx variants, scan-only floor."""

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

from torchdr_tpu.ops.distance import knn_graph
from torchdr_tpu.ops.ivf import ivf_build
from torchdr_tpu.ops.metrics import MASK_VALUE, sq_dists_from_gram

N, D, K = 1_000_000, 128, 15
SUB = 1000
BLOCK = 256


def log(**kw):
    print("JSON " + json.dumps(kw), flush=True)


def force(x):
    return float(jnp.sum(jnp.where(jnp.isfinite(x), x, 0)))


@functools.partial(
    jax.jit,
    static_argnames=("ncells", "budget", "chunk", "m", "merge", "rt"),
)
def search(Qs, q_rows, arrays, ncells, budget, chunk, m, merge, rt):
    centroids, X_sorted, ids_sorted, offsets, counts = arrays
    nq = Qs.shape[0]
    n_blocks = nq // BLOCK
    nlist = centroids.shape[0]
    n_total = X_sorted.shape[0] - chunk
    c_norm = jnp.sum(centroids * centroids, axis=-1)
    x_norms = jnp.sum(X_sorted * X_sorted, axis=-1)
    pq = max(2, ncells // 2)

    def process(b):
        Qb = lax.dynamic_slice_in_dim(Qs, b * BLOCK, BLOCK, axis=0)
        rows = lax.dynamic_slice_in_dim(q_rows, b * BLOCK, BLOCK, axis=0)
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
        _, cells = lax.top_k(score, ncells)

        max_ch = max(1, -(-int(budget) // max(1, ncells)) + 3)
        cnts = counts[cells]
        nch = (cnts + (chunk - 1)) // chunk
        ci_g = jnp.tile(jnp.arange(ncells, dtype=jnp.int32), max_ch)
        w_g = jnp.repeat(jnp.arange(max_ch, dtype=jnp.int32), ncells)
        live = w_g < nch[ci_g]
        prio = jnp.where(ci_g == 0, w_g, max_ch + w_g * ncells + ci_g)
        prio = jnp.where(live, prio, jnp.iinfo(jnp.int32).max)
        order = jnp.argsort(prio)[:budget]
        sel_ci = ci_g[order]
        sel_w = w_g[order]
        sel_live = live[order]
        slot_start = jnp.where(
            sel_live, offsets[cells[sel_ci]] + sel_w * chunk, n_total
        )
        slot_valid = jnp.where(sel_live, cnts[sel_ci] - sel_w * chunk, 0)

        row_idx = (slot_start[:, None] + jnp.arange(chunk)[None, :]).reshape(-1)
        Xg_all = X_sorted[row_idx]
        idg = ids_sorted[row_idx]
        ng = x_norms[row_idx]
        g = jnp.matmul(
            Qb, Xg_all.T, preferred_element_type=jnp.float32,
            precision=lax.Precision.HIGH,
        )
        sc = ng[None, :] - 2.0 * g
        col_dead = (jnp.arange(chunk)[None, :] >= slot_valid[:, None]).reshape(-1)
        invalid = col_dead[None, :] | (idg[None, :] == rows[:, None])
        buf = sc + MASK_VALUE * invalid.astype(sc.dtype)

        if merge == "scan_min":
            return jnp.min(buf, axis=1), jnp.zeros((BLOCK, 1), jnp.int32)[:, :1]
        if merge == "exact":
            neg, cidx = lax.top_k(-buf, m)
            vals = -neg
        else:
            vals, cidx = lax.approx_min_k(buf, m, recall_target=rt)
        pos = row_idx[cidx]
        Xg = X_sorted[pos]
        diff = Qb[:, None, :] - Xg
        D2 = jnp.sum(diff * diff, axis=-1)
        D2 = jnp.where(vals >= MASK_VALUE * 0.5, MASK_VALUE, D2)
        negk, sel = lax.top_k(-D2, K)
        return -negk, ids_sorted[jnp.take_along_axis(pos, sel, axis=1)]

    d, i = lax.map(process, jnp.arange(n_blocks))
    return d, i


def main():
    rng = np.random.default_rng(0)
    centers = rng.normal(scale=10.0, size=(1000, D)).astype(np.float32)
    X = jnp.asarray(
        centers[rng.integers(0, 1000, N)] + rng.normal(size=(N, D)).astype(np.float32)
    )
    force(X[:8])

    _, i_t = knn_graph(X[:SUB], X, k=K + 1, exclude_diag=False, precision="highest")
    i_t = np.asarray(i_t)
    i_true = np.stack([row[row != r][:K] for r, row in zip(range(SUB), i_t)])

    idx = ivf_build(X, n_clusters=1024, kmeans_iters=20, align=False)
    arrays = (idx.centroids, idx.X_sorted, idx.ids_sorted, idx.offsets, idx.counts)
    n = N
    n_pad = -(-n // BLOCK) * BLOCK
    Qs = jnp.concatenate([
        idx.X_sorted[:n], jnp.full((n_pad - n, D), 1e12, jnp.float32)
    ]) if n_pad != n else idx.X_sorted[:n]
    sorted_ids = jnp.concatenate([
        idx.ids_sorted[:n], jnp.full((n_pad - n,), -2, jnp.int32)
    ]) if n_pad != n else idx.ids_sorted[:n]

    def recall(i_sorted):
        # map sorted-order rows back: row r of output is query sorted_ids[r]
        out = np.zeros((n + 1, K), np.int32)
        sids = np.asarray(sorted_ids)
        out[np.where(sids >= 0, sids, n)] = np.asarray(i_sorted).reshape(-1, K)
        return float(np.mean(
            [len(set(out[j]) & set(i_true[j])) / K for j in range(SUB)]
        ))

    configs = [
        dict(ncells=12, budget=37, m=32, merge="scan_min", rt=0.99),
        dict(ncells=12, budget=37, m=32, merge="exact", rt=0.99),
        dict(ncells=12, budget=37, m=32, merge="approx", rt=0.99),
        dict(ncells=12, budget=37, m=64, merge="approx", rt=0.999),
        dict(ncells=16, budget=48, m=64, merge="approx", rt=0.999),
    ]
    for cfg in configs:
        try:
            t0 = time.perf_counter()
            d, i = search(Qs, sorted_ids, arrays, chunk=idx.chunk, **cfg)
            force(d)
            cold = time.perf_counter() - t0
            t0 = time.perf_counter()
            d, i = search(Qs, sorted_ids, arrays, chunk=idx.chunk, **cfg)
            force(d)
            warm = time.perf_counter() - t0
            rec = recall(i) if cfg["merge"] != "scan_min" else -1.0
            log(step="ctl", **cfg, cold_s=round(cold, 2), warm_s=round(warm, 3),
                recall=round(rec, 5))
        except Exception as e:
            log(step="ctl", **cfg, error=str(e)[:250])


if __name__ == "__main__":
    main()
