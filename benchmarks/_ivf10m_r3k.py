"""10M x 128 IVF — round 3k: rank-major budget cut at the fast shapes.

Round-3b found warm search time is shape-sensitive in the scan-budget
dimension: budgets {69,70,71} hit a 33-s fast shape but truncated
recall to 99.46% because the depth-major round-robin cut lost a random
fraction of EVERY probed cell (cell rows are unordered). The round-3
continuation landed ``budget_order="rank"`` (home cell first, then each
cell's first chunk, then depth rank-major) so a tight budget degrades
like a smoothly lowered nprobe instead. This sweep re-runs the fast
shapes with rank order.

Reference: B200 Faiss IVF nlist=16384 nprobe=81 = 54.69 s @ 99.9%.
Round-3 operating points: 43.8 s @ 99.973% (budget=128), 45.3 s @
99.947% (rerank m16). Target here: <= 36 s @ >= 99.9%.
"""

import gc
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

from torchdr_tpu.ops.distance import knn_graph
from torchdr_tpu.ops.ivf import _push_segmented, ivf_build, ivf_knn

N, D, K = 10_000_000, 128, 15
SUB = 1000
NLIST = 16384
CHUNK = 128


def log(**kw):
    print("JSON " + json.dumps(kw), flush=True)


def force(x):
    return float(jnp.sum(jnp.where(jnp.isfinite(x), x, 0)))


def main():
    rng = np.random.default_rng(0)
    centers = rng.normal(scale=10.0, size=(10_000, D)).astype(np.float32)
    lab = rng.integers(0, 10_000, N)
    Xh = centers[lab] + rng.normal(size=(N, D)).astype(np.float32)

    t0 = time.perf_counter()
    X = _push_segmented(Xh)
    force(X[:8])
    del Xh
    gc.collect()
    log(step="push", secs=round(time.perf_counter() - t0, 1))

    t0 = time.perf_counter()
    _, i_t = knn_graph(X[:SUB], X, k=K + 1, exclude_diag=False, precision="highest")
    i_t = np.asarray(i_t)
    i_true = np.stack([row[row != r][:K] for r, row in zip(range(SUB), i_t)])
    log(step="groundtruth", secs=round(time.perf_counter() - t0, 1))

    def recall(i):
        ig = np.asarray(i[:SUB])
        return float(np.mean([len(set(ig[j]) & set(i_true[j])) / K for j in range(SUB)]))

    holder = [X]
    del X
    t0 = time.perf_counter()
    idx = ivf_build(holder.pop(), n_clusters=NLIST, chunk=CHUNK, kmeans_iters=15, verbose=True)
    log(step="build", build_s=round(time.perf_counter() - t0, 1), split=idx.X_lo is not None)
    gc.collect()

    configs = [
        # fast-shape cluster with rank-major cut (the headline attempt)
        dict(nprobe=12, rerank=False, budget=70, m=16),
        dict(nprobe=12, rerank=False, budget=70, m=16, budget_order="depth"),  # control
        dict(nprobe=10, rerank=False, budget=70, m=16),
        dict(nprobe=14, rerank=False, budget=70, m=16),
        dict(nprobe=12, rerank=False, budget=69, m=16),
        # current operating point for chip-noise reference
        dict(nprobe=12, rerank=False, budget=128, m=16),
    ]
    for cfg in configs:
        try:
            kw = dict(k=K, index=idx, scan_precision="high", merge="tournament", **cfg)
            t0 = time.perf_counter()
            d, i = ivf_knn(None, **kw)
            force(d)
            cold = time.perf_counter() - t0
            t0 = time.perf_counter()
            d, i = ivf_knn(None, **kw)
            force(d)
            warm = time.perf_counter() - t0
            log(step="search", **cfg, cold_s=round(cold, 1),
                warm_s=round(warm, 2), recall=round(recall(i), 5))
            del d, i
            gc.collect()
        except Exception as e:
            log(step="search", **cfg, error=str(e)[:300])


if __name__ == "__main__":
    main()
