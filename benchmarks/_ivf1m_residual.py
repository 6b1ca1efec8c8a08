"""1M x 128: does residual bf16 storage beat the f32 headline config?

The scan reads half the bytes (bf16 hi plane vs f32 rows) and the
residual scoring gave BETTER recall than plain f32 at 200k (exact norms
+ HIGH centroid gram vs default-precision f32 scoring). Headline to beat:
f32, nprobe=12, m=32, approx -> 2.58 s @ 99.95% (B200 Faiss IVF: 2.90 s
@ 99.9%)."""

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
    lab = rng.integers(0, 1000, N)
    X = jnp.asarray(centers[lab] + rng.normal(size=(N, D)).astype(np.float32))
    force(X[:8])

    _, i_t = knn_graph(X[:SUB], X, k=K + 1, exclude_diag=False, precision="highest")
    i_t = np.asarray(i_t)
    i_true = np.stack([row[row != r][:K] for r, row in zip(range(SUB), i_t)])
    log(step="groundtruth")

    def recall(i):
        ig = np.asarray(i[:SUB])
        return float(np.mean([len(set(ig[j]) & set(i_true[j])) / K for j in range(SUB)]))

    for sb, tag in ((4 << 30, "f32"), (0, "residual")):
        t0 = time.perf_counter()
        idx = ivf_build(X, n_clusters=1024, key=jax.random.PRNGKey(0), split_bytes=sb)
        idx.X_sorted.block_until_ready()
        log(step="build", tag=tag, build_s=round(time.perf_counter() - t0, 1),
            split=idx.X_lo is not None)
        for cfg in (
            dict(nprobe=12, m=32, merge="approx"),
            dict(nprobe=12, m=32, merge="tournament"),
            dict(nprobe=10, m=32, merge="tournament"),
            dict(nprobe=16, m=32, merge="tournament"),
        ):
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
        del idx


if __name__ == "__main__":
    main()
