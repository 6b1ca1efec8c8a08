"""1M x 128 round-3b sweep at the bench config: block size, approx-merge
margin m, and nlist — hunting a sub-2s headline.

The per-block fixed cost (nomination + vote + expansion arithmetic) is
paid 1M/block times; doubling block halves it at constant scan work.
The m margin prices the re-rank row gather. nlist=2048 halves the mean
cell (tighter scan W) at the cost of deeper nprobe for equal coverage.
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

    for nlist, sweeps in [
        (
            1024,
            [
                dict(nprobe=12, m=24, block=256),  # bench baseline
                dict(nprobe=12, m=24, block=512),
                dict(nprobe=12, m=24, block=1024),
                dict(nprobe=12, m=16, block=512),
                dict(nprobe=12, m=20, block=512),
                dict(nprobe=10, m=24, block=512),
            ],
        ),
        (
            2048,
            [
                dict(nprobe=16, m=24, block=512),
                dict(nprobe=20, m=24, block=512),
                dict(nprobe=24, m=24, block=512),
            ],
        ),
    ]:
        t0 = time.perf_counter()
        index = ivf_build(X, n_clusters=nlist, kmeans_iters=20)
        log(step="build", nlist=nlist, secs=round(time.perf_counter() - t0, 1))
        for cfg in sweeps:
            kw = dict(k=K, scan_precision="high", index=index, **cfg)
            d, i = ivf_knn(X, **kw)
            force(d)
            best = 1e9
            for _ in range(2):
                t0 = time.perf_counter()
                d, i = ivf_knn(X, **kw)
                force(d)
                best = min(best, time.perf_counter() - t0)
            log(step="sweep", nlist=nlist, **cfg, warm_s=round(best, 3),
                recall=round(recall(i), 5))


if __name__ == "__main__":
    main()
