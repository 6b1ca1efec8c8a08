"""kNN graph tiers at MNIST scale (60k x 784, k=30): build time + recall@30.

The BASELINE.md north-star pairs UMAP fit time with graph recall@30 'at
equal memory' — all three tiers here hold the dataset once in HBM.
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

N, D, K = 60_000, 784, 30


def log(**kw):
    print("JSON " + json.dumps(kw), flush=True)


def force(x):
    return float(jnp.sum(jnp.where(jnp.isfinite(x), x, 0)))


def main():
    rng = np.random.default_rng(0)
    centers = rng.normal(scale=4.0, size=(10, D)).astype(np.float32)
    X = jnp.asarray(
        centers[rng.integers(0, 10, N)] + rng.normal(size=(N, D)).astype(np.float32)
    )
    force(X[:8])

    d0, i0 = knn_graph(X, k=K, precision="highest")
    force(d0)
    i_true = np.asarray(i0)

    def recall(i):
        ig = np.asarray(i)
        return float(np.mean(
            [len(set(ig[j]) & set(i_true[j])) / K for j in range(0, N, 30)]
        ))

    # exact
    t0 = time.perf_counter()
    d, i = knn_graph(X, k=K, precision="highest")
    force(d)
    log(step="tier", tier="exact/highest", secs=round(time.perf_counter() - t0, 2),
        recall_at_30=1.0)

    # approx (PartialReduce)
    d, i = knn_graph(X, k=K, precision="high", mode="approx")
    force(d)
    t0 = time.perf_counter()
    d, i = knn_graph(X, k=K, precision="high", mode="approx")
    force(d)
    log(step="tier", tier="approx/high", secs=round(time.perf_counter() - t0, 2),
        recall_at_30=round(recall(i), 4))

    # IVF
    t0 = time.perf_counter()
    idx = ivf_build(X, kmeans_iters=20)
    build_s = time.perf_counter() - t0
    d, i = ivf_knn(X, k=K, index=idx, nprobe=12, m=64, scan_precision="high")
    force(d)
    t0 = time.perf_counter()
    d, i = ivf_knn(X, k=K, index=idx, nprobe=12, m=64, scan_precision="high")
    force(d)
    log(step="tier", tier="ivf/nprobe12", build_s=round(build_s, 2),
        secs=round(time.perf_counter() - t0, 2), recall_at_30=round(recall(i), 4))


if __name__ == "__main__":
    main()
