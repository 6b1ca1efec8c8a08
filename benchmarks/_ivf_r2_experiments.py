"""Round-2 IVF experiments on the real chip (bench config: 1M x 128, k=15).

Measures: build time + cluster-size skew at nlist in {1024, 4096}, the
round-1 baseline search (direct/HIGHEST), and the new buffered bf16-scan
+ f32-rerank search at several nprobe. Prints one JSON line per result.

Run: python benchmarks/_ivf_r2_experiments.py > /tmp/ivf_r2.log 2>&1
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update(
    "jax_compilation_cache_dir", "/root/repo/.jax_cache"
)
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
    force(X[:8])

    # ground truth on SUB queries
    t0 = time.perf_counter()
    _, i_t = knn_graph(X[:SUB], X, k=K + 1, exclude_diag=False, precision="highest")
    i_t = np.asarray(i_t)
    i_true = np.stack([row[row != r][:K] for r, row in zip(range(SUB), i_t)])
    log(step="groundtruth", secs=round(time.perf_counter() - t0, 2))

    def recall(i):
        ig = np.asarray(i[:SUB])
        return float(np.mean([len(set(ig[j]) & set(i_true[j])) / K for j in range(SUB)]))

    indexes = {}
    for nlist in (1024, 4096):
        t0 = time.perf_counter()
        idx = ivf_build(X, n_clusters=nlist, kmeans_iters=20)
        build_s = time.perf_counter() - t0
        c = np.asarray(idx.counts)
        log(
            step="build", nlist=nlist, build_s=round(build_s, 2), cap=int(idx.cap),
            mean=round(float(c.mean()), 1),
            p50=int(np.percentile(c, 50)), p90=int(np.percentile(c, 90)),
            p99=int(np.percentile(c, 99)), empty=int((c == 0).sum()),
        )
        indexes[nlist] = idx

    configs = [
        dict(nlist=1024, nprobe=8, method="direct"),
        dict(nlist=1024, nprobe=8, method="rerank"),
        dict(nlist=4096, nprobe=16, method="rerank"),
        dict(nlist=4096, nprobe=32, method="rerank"),
    ]
    for cfg in configs:
        idx = indexes[cfg["nlist"]]
        kw = dict(k=K, nprobe=cfg["nprobe"], index=idx, method=cfg["method"])
        try:
            t0 = time.perf_counter()
            d, i = ivf_knn(X, **kw)
            force(d)
            cold_s = time.perf_counter() - t0
            t0 = time.perf_counter()
            d, i = ivf_knn(X, **kw)
            force(d)
            warm_s = time.perf_counter() - t0
            log(step="search", **cfg, cold_s=round(cold_s, 2),
                warm_s=round(warm_s, 3), recall=round(recall(i), 5))
        except Exception as e:  # keep going past a worker crash
            log(step="search", **cfg, error=str(e)[:300])


if __name__ == "__main__":
    main()
