"""10M x 128 IVF — round 3: hierarchical super-centroid nomination A/B.

Round J isolated ~39 s of width-independent per-block cost at
nlist=16384: the (block, nlist) HIGH-precision centroid matmul + the
nlist-wide approx_min_k nomination, paid by every one of ~39k blocks.
The two-level nomination (top-voted supers -> member-cell scoring) cuts
the nomination width ~10x. This sweep measures warm search time + recall
across nprobe_supers (0 = flat nomination control).

Reference target: Faiss IVF nlist=16384 nprobe=81 on B200 = 54.69 s @
99.9% (BENCHMARK_RESULTS.md:33-41). Round-2 best: 69.6 s @ 99.95%.
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
NLIST = int(os.environ.get("NLIST", "16384"))
CHUNK = int(os.environ.get("CHUNK", "128"))
NSUPER = int(os.environ.get("NSUPER", "256"))


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
    idx = ivf_build(
        holder.pop(), n_clusters=NLIST, chunk=CHUNK, kmeans_iters=15,
        n_superlist=NSUPER, verbose=True,
    )
    log(
        step="build", nlist=NLIST, chunk=CHUNK, nsuper=NSUPER,
        build_s=round(time.perf_counter() - t0, 1), split=idx.X_lo is not None,
        memb_w=int(idx.super_members.shape[1]) if idx.super_members is not None else 0,
    )
    gc.collect()

    configs = [
        dict(nprobe=10, merge="tournament", m=32, nprobe_supers=12),
        dict(nprobe=10, merge="tournament", m=32, nprobe_supers=8),
        dict(nprobe=10, merge="tournament", m=32, nprobe_supers=16),
        dict(nprobe=12, merge="tournament", m=32, nprobe_supers=12),
        dict(nprobe=10, merge="tournament", m=32, nprobe_supers=0),
        dict(nprobe=14, merge="tournament", m=32, nprobe_supers=16),
    ]
    for cfg in configs:
        try:
            kw = dict(k=K, index=idx, scan_precision="high", **cfg)
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
