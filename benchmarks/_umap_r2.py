"""UMAP round-2: shared-negatives speedup on the 60k x 784 config.

Reports e2e fit (cold + warm), silhouette, and neighborhood preservation
@30 (the BASELINE.md north-star metric pair).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import numpy as np

N = int(os.environ.get("UMAP_N", 60_000))
D = int(os.environ.get("UMAP_D", 784))
ITERS = int(os.environ.get("UMAP_ITERS", 500))


def log(**kw):
    print("JSON " + json.dumps(kw), flush=True)


def main():
    import torchdr_tpu as tdr

    rng = np.random.default_rng(0)
    centers = rng.normal(scale=4.0, size=(10, D)).astype(np.float32)
    lab = rng.integers(0, 10, N)
    X = centers[lab] + rng.normal(size=(N, D)).astype(np.float32)

    for shared in (True, False):
        model = tdr.UMAP(
            n_neighbors=30, max_iter=ITERS, random_state=0,
            shared_negatives=shared,
        )
        t0 = time.perf_counter()
        Z = model.fit_transform(X)
        np.asarray(Z)
        cold = time.perf_counter() - t0
        t0 = time.perf_counter()
        Z = model.fit_transform(X)
        Z = np.asarray(Z)
        warm = time.perf_counter() - t0

        sub = slice(None, None, max(1, N // 5000))
        sil = float(tdr.silhouette_score(Z[sub], lab[sub]))
        pres = float(tdr.neighborhood_preservation(X[:10000], Z[:10000], K=30))
        log(step="umap", n=N, d=D, iters=ITERS, shared=shared,
            cold_s=round(cold, 1), warm_s=round(warm, 2),
            silhouette=round(sil, 4), preservation_at_30=round(pres, 4))


if __name__ == "__main__":
    main()
