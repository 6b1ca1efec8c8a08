"""1M x 128 round-3f: rerank=False at the 1M geometry.

The 10M tier's best operating point is rerank=False + scan-score output
(43.8s @ 99.973%, ROUND3_STATUS) — the exact survivor re-rank (m-wide
row gather + (block, m) exact distances) is pure overhead when the scan
scores are already f32-grade. The 1M headline (2.089s @ 99.96%, np12
m=24 approx merge) was never swept with rerank=False. Sweep it here:
rerank on/off x nprobe x merge at nlist=1024, adjacency nomination.
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
        dict(nprobe=12, m=24, rerank=True),          # round-3 headline point
        dict(nprobe=12, rerank=False),
        dict(nprobe=10, rerank=False),
        dict(nprobe=14, rerank=False),
        dict(nprobe=12, rerank=False, merge="tournament"),
    ]
    for cfg in configs:
        kw = dict(k=K, scan_precision="high", index=index, **cfg)
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
