"""1M x 128 round-3e: does higher nlist win now that adjacency nomination
removed the per-block cost that scaled with nlist?

Round-2 pinned nlist=1024 as the 1M optimum when nomination was a
(block, nlist) matmul + nlist-wide selection. Adjacency nomination made
the per-block candidate set ~home·P wide regardless of nlist, so finer
cells (less scanned mass per probe) may now win. Sweep nlist x nprobe at
the bench config (approx merge, m=24, scan_precision high).
"""

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
from torchdr_tpu.ops.ivf import ivf_build, ivf_knn

N, D, K = 1_000_000, 128, 15
SUB = 1000


def log(**kw):
    print("JSON " + json.dumps(kw), flush=True)


def force(x):
    return float(jnp.sum(jnp.where(jnp.isfinite(x), x, 0)))


def main():
    rng = np.random.default_rng(0)
    centers = rng.normal(scale=10.0, size=(1000, D)).astype(np.float32)
    X = jnp.asarray(
        centers[rng.integers(0, 1000, N)] + rng.normal(size=(N, D)).astype(np.float32)
    )
    _, i_t = knn_graph(X[:SUB], X, k=K + 1, exclude_diag=False, precision="highest")
    i_t = np.asarray(i_t)
    i_true = np.stack([row[row != r][:K] for r, row in zip(range(SUB), i_t)])

    def recall(i):
        ig = np.asarray(i[:SUB])
        return float(
            np.mean([len(set(ig[j]) & set(i_true[j])) / K for j in range(SUB)])
        )

    plans = [
        (1024, [12]),                # round-3 headline reference point
        (2048, [12, 16, 20, 24]),
        (4096, [16, 24, 32, 40]),
    ]
    for nlist, nprobes in plans:
        index = ivf_build(X, n_clusters=nlist, kmeans_iters=20)
        for np_ in nprobes:
            kw = dict(k=K, nprobe=np_, m=24, scan_precision="high", index=index)
            d, i = ivf_knn(X, **kw)
            force(d)
            rec = recall(i)
            best = 1e9
            for _ in range(3):
                t0 = time.perf_counter()
                d, i = ivf_knn(X, **kw)
                force(d)
                best = min(best, time.perf_counter() - t0)
            log(nlist=nlist, nprobe=np_, m=24, warm_s=round(best, 3),
                recall=round(rec, 5))
        del index


if __name__ == "__main__":
    main()
