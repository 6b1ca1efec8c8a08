"""1M x 128 round-3h: recover the last 0.05% recall at the no-rerank point.

Round-3g: np12 m=24 rerank=False = 1.73 s @ 99.85% — 1.2x faster than the
re-ranked headline but under the B200's 99.9% bar. The residual errors are
scan-score ordering (bf16-pass gram) or approx_min_k binning. Probe both:
highest-precision scan, np13, and the m in {20, 28} neighborhood, with the
re-ranked reference point in-process so chip-contention noise cancels.
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

    index = ivf_build(X, n_clusters=1024, kmeans_iters=20)
    configs = [
        dict(nprobe=12, m=24, rerank=True, scan_precision="high"),   # headline ref
        dict(nprobe=12, m=24, rerank=False, scan_precision="highest"),
        dict(nprobe=13, m=24, rerank=False, scan_precision="high"),
        dict(nprobe=12, m=20, rerank=False, scan_precision="high"),
        dict(nprobe=12, m=28, rerank=False, scan_precision="high"),
    ]
    for cfg in configs:
        kw = dict(k=K, index=index, **cfg)
        d, i = ivf_knn(X, **kw)
        force(d)
        rec = recall(i)
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            d, i = ivf_knn(X, **kw)
            force(d)
            best = min(best, time.perf_counter() - t0)
        log(warm_s=round(best, 3), recall=round(rec, 5), **cfg)


if __name__ == "__main__":
    main()
