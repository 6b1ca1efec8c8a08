"""IVF: probe the nprobe frontier (10/11/12) for the bench config."""

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
SUB = 2000


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
    force(X[:8])

    _, i_t = knn_graph(X[:SUB], X, k=K + 1, exclude_diag=False, precision="highest")
    i_t = np.asarray(i_t)
    i_true = np.stack([row[row != r][:K] for r, row in zip(range(SUB), i_t)])

    def recall(i):
        ig = np.asarray(i[:SUB])
        return float(np.mean([len(set(ig[j]) & set(i_true[j])) / K for j in range(SUB)]))

    idx = ivf_build(X, n_clusters=1024, kmeans_iters=20)
    for nprobe in (10, 11, 12):
        try:
            t0 = time.perf_counter()
            d, i = ivf_knn(X, k=K, index=idx, nprobe=nprobe, m=32,
                           scan_precision="high")
            force(d)
            cold = time.perf_counter() - t0
            times = []
            for _ in range(2):
                t0 = time.perf_counter()
                d, i = ivf_knn(X, k=K, index=idx, nprobe=nprobe, m=32,
                               scan_precision="high")
                force(d)
                times.append(time.perf_counter() - t0)
            log(step="search", nprobe=nprobe, cold_s=round(cold, 2),
                warm_s=round(min(times), 3), warm_all=[round(t, 3) for t in times],
                recall=round(recall(i), 5))
        except Exception as e:
            log(step="search", nprobe=nprobe, error=str(e)[:250])


if __name__ == "__main__":
    main()
