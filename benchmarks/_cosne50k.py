"""COSNE at n=50k: bounded-memory blockwise hyperbolic repulsion
(VERDICT r1 #7 done-criterion; the dense n^2 path would need 10 GB/pass)."""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import numpy as np


def log(**kw):
    print("JSON " + json.dumps(kw), flush=True)


def main():
    import torchdr_tpu as tdr

    rng = np.random.default_rng(0)
    centers = rng.normal(scale=6.0, size=(10, 32)).astype(np.float32)
    lab = rng.integers(0, 10, 50_000)
    X = centers[lab] + rng.normal(size=(50_000, 32)).astype(np.float32)

    model = tdr.COSNE(perplexity=30, max_iter=250, lr=1e-1, random_state=0,
                      block_size=2048, max_iters_per_dispatch=25)
    t0 = time.perf_counter()
    Z = np.asarray(model.fit_transform(X))
    cold = time.perf_counter() - t0
    sub = slice(None, None, 10)
    sil = float(tdr.silhouette_score(Z[sub], lab[sub]))
    log(step="cosne50k", cold_s=round(cold, 1), sil=round(sil, 4),
        max_norm=round(float(np.abs(Z).max()), 4),
        finite=bool(np.isfinite(Z).all()))


if __name__ == "__main__":
    main()
