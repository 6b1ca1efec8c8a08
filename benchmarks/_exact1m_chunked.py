"""Exact 1M x 128 kNN via host-chunked dispatches (VERDICT r1 #5): 3 runs."""

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

from torchdr_tpu.ops.distance import knn_graph_host_chunked

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
    for qc in (65_536, 131_072):
        for rep in range(3):
            try:
                t0 = time.perf_counter()
                d, i = knn_graph_host_chunked(
                    X, k=K, precision="highest", query_chunk=qc
                )
                s = float(jnp.sum(jnp.where(jnp.isfinite(d), d, 0)))
                log(step="exact_chunked", query_chunk=qc, rep=rep,
                    secs=round(time.perf_counter() - t0, 2), checksum=round(s, 1))
            except Exception as e:
                log(step="exact_chunked", query_chunk=qc, rep=rep, error=str(e)[:200])
                return
        break  # first chunk size that completes 3/3 is the record


if __name__ == "__main__":
    main()
