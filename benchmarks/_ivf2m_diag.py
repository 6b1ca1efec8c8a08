"""2M x 128 diagnostic: what pins recall at ~99.4% with EXACT selection?

Isolates the residual-bf16 score error from the probe/vote ceiling by
comparing f32 storage vs residual storage with the SAME tournament
(exact) selection at the same cell geometry (~500 rows/cell, the 10M
nlist=16384 ratio). If f32+tournament ~= 100% while residual+tournament
sits at ~99.4%, the binder is the bf16 residual tail (k-means cells that
straddle clusters); m=96 then tests whether a wider exact margin
recovers it."""

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

N, D, K = 2_000_000, 128, 15
SUB = 2000


def log(**kw):
    print("JSON " + json.dumps(kw), flush=True)


def force(x):
    return float(jnp.sum(jnp.where(jnp.isfinite(x), x, 0)))


def main():
    rng = np.random.default_rng(0)
    centers = rng.normal(scale=10.0, size=(2000, D)).astype(np.float32)
    lab = rng.integers(0, 2000, N)
    X = jnp.asarray(centers[lab] + rng.normal(size=(N, D)).astype(np.float32))
    force(X[:8])

    _, i_t = knn_graph(X[:SUB], X, k=K + 1, exclude_diag=False, precision="highest")
    i_t = np.asarray(i_t)
    i_true = np.stack([row[row != r][:K] for r, row in zip(range(SUB), i_t)])
    log(step="groundtruth")

    def recall(i):
        ig = np.asarray(i[:SUB])
        return float(np.mean([len(set(ig[j]) & set(i_true[j])) / K for j in range(SUB)]))

    for sb, tag in ((1 << 40, "f32"), (0, "residual")):
        t0 = time.perf_counter()
        idx = ivf_build(
            X, n_clusters=4096, chunk=128, kmeans_iters=15,
            key=jax.random.PRNGKey(0), split_bytes=sb,
        )
        idx.X_sorted.block_until_ready()
        log(step="build", tag=tag, build_s=round(time.perf_counter() - t0, 1),
            split=idx.X_lo is not None)
        for cfg in (
            dict(nprobe=16, merge="tournament", m=32),
            dict(nprobe=16, merge="tournament", m=96),
            dict(nprobe=24, merge="tournament", m=32),
            dict(nprobe=16, merge="approx", m=64),
        ):
            try:
                kw = dict(k=K, index=idx, scan_precision="high", **cfg)
                d, i = ivf_knn(None, **kw)
                force(d)
                best = 1e9
                for _ in range(2):
                    t0 = time.perf_counter()
                    d, i = ivf_knn(None, **kw)
                    force(d)
                    best = min(best, time.perf_counter() - t0)
                log(step="search", tag=tag, **cfg, warm_s=round(best, 2),
                    recall=round(recall(i), 5))
            except Exception as e:
                log(step="search", tag=tag, **cfg, error=str(e)[:200])
        del idx


if __name__ == "__main__":
    main()
