"""int8 quantization RECALL CEILING at 10M-like density (2M proxy).

The 10M int8 sweep collapsed to 88.4% recall flat across budget/nprobe —
i.e. the binding error is the quantized SCORE ordering, not IVF probing
(split storage hits 99.97% on the same geometry). This isolates it:
brute-force kNN of 1000 queries over the DEQUANTIZED 2M database (no IVF
at all — infinite budget, perfect probing) under candidate scale schemes.
Whichever scheme's ceiling clears ~99.5% is worth wiring into the real
scan; if none does, int8 is a coarse tier at this density and the doc
says so.

Schemes:
  hi       bf16 hi plane only (the split tier's cheap half; ~99.5 control)
  cdmax    per-(cell, dim) max|r|/127 — the shipped int8 rule
  cdmax_a  same, ASYMMETRIC: exact f32 queries (database-only noise)
  rowmax   per-row max|r|/127 (one f32 per row; adapts to straddle cells)
  rowmax_a per-row, asymmetric
  cdq99    per-(cell, dim) 99.5%-quantile scale with clipping
"""

import json
import sys
import time

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import jax.numpy as jnp
import numpy as np

from torchdr_tpu.ops.distance import knn_graph
from torchdr_tpu.ops.kmeans import kmeans_fit

N, D, K, SUB, NLIST = 2_000_000, 128, 15, 1000, 4096


def log(**kw):
    print("JSON " + json.dumps(kw), flush=True)


def main():
    rng = np.random.default_rng(0)
    centers = rng.normal(scale=10.0, size=(2000, D)).astype(np.float32)
    lab = rng.integers(0, 2000, N)
    Xh = centers[lab] + rng.normal(size=(N, D)).astype(np.float32)
    X = jnp.asarray(Xh)

    _, i_t = knn_graph(X[:SUB], X, k=K + 1, exclude_diag=False,
                       precision="highest")
    i_t = np.asarray(i_t)
    i_true = np.stack([row[row != r][:K] for r, row in zip(range(SUB), i_t)])
    log(step="groundtruth")

    key = jax.random.PRNGKey(0)
    train = jax.random.choice(key, X, (64 * NLIST,), replace=False)
    cent, _, _ = kmeans_fit(train, NLIST, key, max_iter=15, init="random")
    cent_h = np.asarray(cent, np.float32)

    @jax.jit
    def assign_seg(Xs, cent):
        g = jnp.matmul(Xs, cent.T, preferred_element_type=jnp.float32)
        d = jnp.sum(cent * cent, 1)[None, :] - 2.0 * g
        return jnp.argmin(d, axis=1).astype(jnp.int32)

    seg = 250_000
    cells_h = np.concatenate([
        np.asarray(assign_seg(X[a:a + seg], cent))
        for a in range(0, N, seg)
    ])
    log(step="kmeans", nlist=NLIST)

    R = Xh - cent_h[cells_h]

    # per-(cell, dim) stats via sort-by-cell + reduceat
    order = np.argsort(cells_h, kind="stable")
    Rs = np.abs(R[order])
    cs = cells_h[order]
    starts = np.searchsorted(cs, np.arange(NLIST))
    cd_max = np.maximum.reduceat(Rs, np.minimum(starts, len(cs) - 1), axis=0)
    # 99.5% per-(cell,dim) quantile: too slow exactly at this shape; use
    # the max of the cell with its top 0.5% rows' contribution knocked
    # down via a two-pass trim — approximate with per-cell-dim
    # mean + 3*std (Gaussian ~99.7% coverage), capped at the max.
    cd_sum = np.add.reduceat(Rs, np.minimum(starts, len(cs) - 1), axis=0)
    cd_sq = np.add.reduceat(Rs * Rs, np.minimum(starts, len(cs) - 1), axis=0)
    cnt = np.maximum(np.diff(np.append(starts, len(cs))), 1)[:, None]
    mu = cd_sum / cnt
    sd = np.sqrt(np.maximum(cd_sq / cnt - mu * mu, 0.0))
    cd_q = np.minimum(cd_max, mu + 3.0 * sd)
    del Rs, cs, cd_sum, cd_sq

    row_max = np.abs(R).max(axis=1)

    def dequant(scheme):
        if scheme == "hi":
            import ml_dtypes

            return (Xh.astype(ml_dtypes.bfloat16).astype(np.float32))
        if scheme in ("cdmax", "cdmax_a", "cdq99"):
            s = (cd_max if scheme != "cdq99" else cd_q)
            s = np.maximum(s, 1e-12) / 127.0
            q = np.clip(np.round(R / s[cells_h]), -127, 127).astype(np.int8)
            return cent_h[cells_h] + q.astype(np.float32) * s[cells_h]
        if scheme in ("rowmax", "rowmax_a"):
            s = (np.maximum(row_max, 1e-12) / 127.0)[:, None]
            q = np.clip(np.round(R / s), -127, 127).astype(np.int8)
            return cent_h[cells_h] + q.astype(np.float32) * s
        raise ValueError(scheme)

    def recall_of(db_h, asym):
        db = jnp.asarray(db_h)
        Q = X[:SUB] if asym else db[:SUB]
        # k+1 then drop self by id
        _, ids = knn_graph(Q, db, k=K + 1, exclude_diag=False,
                           precision="highest")
        ids = np.asarray(ids)
        got = np.stack([row[row != r][:K] for r, row in zip(range(SUB), ids)])
        del db
        return float(np.mean([
            len(set(got[j]) & set(i_true[j])) / K for j in range(SUB)
        ]))

    for scheme in ("hi", "cdmax", "cdmax_a", "rowmax", "rowmax_a", "cdq99"):
        t0 = time.perf_counter()
        db_h = dequant(scheme)
        rec = recall_of(db_h, asym=scheme.endswith("_a"))
        log(step="ceiling", scheme=scheme, recall=round(rec, 5),
            secs=round(time.perf_counter() - t0, 1))
        del db_h


if __name__ == "__main__":
    main()
