"""1M x 128: query-block-size sweep for the IVF scan (slices + xla impls).

Hypothesis: queries are cluster-sorted (self-query fast path), so a larger
block shares one probe set across more queries at ~constant budget —
per-slot dispatch overhead (the 'slices' cost floor at 10M) drops ~linearly
with block size. Also times a 2 GB host->device push (the 10M build showed
6.5 GB pushing at 0.036 GB/s vs 0.37 GB/s for 1 GB)."""

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
    # push-degradation probe: 2 GB contiguous
    big = np.ones((4 * 1024, 1024, 128), np.float32)
    t0 = time.perf_counter()
    bd = jnp.asarray(big); bd.block_until_ready()
    log(step="push2gb", secs=round(time.perf_counter() - t0, 1))
    del big, bd

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
        return float(np.mean([len(set(ig[j]) & set(i_true[j])) / K for j in range(SUB)]))

    t0 = time.perf_counter()
    idx = ivf_build(X, n_clusters=1024, kmeans_iters=20, verbose=True)
    log(step="build", build_s=round(time.perf_counter() - t0, 1))

    for impl in ("xla", "slices"):
        for block in (256, 1024, 4096):
            try:
                kw = dict(k=K, index=idx, nprobe=12, m=32, scan_precision="high",
                          scan_impl=impl, block=block)
                d, i = ivf_knn(None, **kw)
                force(d)
                t0 = time.perf_counter()
                d, i = ivf_knn(None, **kw)
                force(d)
                warm = time.perf_counter() - t0
                log(step="search", impl=impl, block=block,
                    warm_s=round(warm, 2), recall=round(recall(i), 5))
            except Exception as e:
                log(step="search", impl=impl, block=block, error=str(e)[:200])


if __name__ == "__main__":
    main()
