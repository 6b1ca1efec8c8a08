"""2M x 128 probe: does the 10M budget shape cliff reproduce at 2M?

At 10M (chunk=128, nlist=16384, residual tier, rerank=False) warm time
jumped 1.7x between adjacent scan budgets doing ~1% different work
(ROUND3_STATUS "budget shape cliff": 69-71 fast, 64/72-120 slow, 128
fast). This probe replays the same per-block geometry at 2M (nlist
scaled to keep ~610 rows/cell, split storage forced) so the effect can
be profiled in a fresh process without the 10M push.
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

from torchdr_tpu.ops.ivf import ivf_build, ivf_knn

N, D, K = 2_000_000, 128, 15


def log(**kw):
    print("JSON " + json.dumps(kw), flush=True)


def force(x):
    return float(jnp.sum(jnp.where(jnp.isfinite(x), x, 0)))


def main():
    rng = np.random.default_rng(0)
    centers = rng.normal(scale=10.0, size=(2000, D)).astype(np.float32)
    X = jnp.asarray(
        centers[rng.integers(0, 2000, N)] + rng.normal(size=(N, D)).astype(np.float32)
    )
    # 10M geometry: ~610 rows/cell, chunk=128, residual storage
    index = ivf_build(
        X, n_clusters=3277, chunk=128, kmeans_iters=15, split_bytes=0
    )
    del X
    for budget in (140, 142, 210, 256, 96, 112):
        kw = dict(
            k=K, nprobe=12, m=16, index=index, rerank=False, budget=budget,
            scan_precision="high",
        )
        d, i = ivf_knn(None, **kw)
        force(d)
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            d, i = ivf_knn(None, **kw)
            force(d)
            best = min(best, time.perf_counter() - t0)
        log(budget=budget, warm_s=round(best, 3))


if __name__ == "__main__":
    main()
