"""Exact brute-force kNN at 1M x 128: reproduce/bisect the round-1 worker
crash (VERDICT r1 weak #4). Runs 3x at two db_block sizes; logs each."""

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

N, D, K = 1_000_000, 128, 15


def log(**kw):
    print("JSON " + json.dumps(kw), flush=True)


def main():
    rng = np.random.default_rng(0)
    centers = rng.normal(scale=10.0, size=(1000, D)).astype(np.float32)
    X = jnp.asarray(
        centers[rng.integers(0, 1000, N)] + rng.normal(size=(N, D)).astype(np.float32)
    )
    float(jnp.sum(X[:8]))

    for db_block in (65_536, 32_768):
        for block in (1024, 512):
            if db_block == 32_768 and block == 1024:
                continue
            for rep in range(3):
                try:
                    t0 = time.perf_counter()
                    d, i = knn_graph(
                        X, k=K, precision="highest",
                        block_size=block, db_block=db_block,
                    )
                    s = float(jnp.sum(jnp.where(jnp.isfinite(d), d, 0)))
                    dt = time.perf_counter() - t0
                    log(step="exact", db_block=db_block, block=block, rep=rep,
                        secs=round(dt, 2), checksum=round(s, 1))
                except Exception as e:
                    log(step="exact", db_block=db_block, block=block, rep=rep,
                        error=str(e)[:300])


if __name__ == "__main__":
    main()
