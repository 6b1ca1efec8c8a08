"""1.3M x 50 UMAP: edge_groups sweep beyond G=4.

The attraction gather is the 1.3M step's cost floor (252 of 283 ms/iter
— XLA dynamic gather is index-bound at ~6.5 ns/index regardless of
locality, measured). edge_groups=G slices the 120-wide symmetrized graph
into G per-iteration groups with exact catch-up bursts, dividing gather
count by G. G=4 was quality-neutral at 60k and 1.3M (round 3); this
sweeps G=8/12 for time vs input-graph preservation.
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

import torchdr_tpu as tdr

N, D = 1_300_000, 50


def log(**kw):
    print("JSON " + json.dumps(kw), flush=True)


def main():
    rng = np.random.default_rng(0)
    centers = rng.normal(scale=6.0, size=(40, D)).astype(np.float32)
    lab = rng.integers(0, 40, N)
    X = centers[lab] + rng.normal(size=(N, D)).astype(np.float32)

    for G in [int(g) for g in (sys.argv[1:] or [8, 12])]:
        model = tdr.UMAP(
            n_neighbors=30, max_iter=500, random_state=0,
            knn_mode=tdr.KnnConfig(mode="ivf", nprobe=16),
            shared_negatives=True, n_shared_negatives=512,
            edge_groups=G, max_iters_per_dispatch=20,
        )
        t0 = time.perf_counter()
        Z = np.asarray(model.fit_transform(X))
        cold = time.perf_counter() - t0
        t0 = time.perf_counter()
        Z = np.asarray(model.fit_transform(X))
        warm = time.perf_counter() - t0
        sub = slice(None, None, N // 5000)
        sil = float(tdr.silhouette_score(Z[sub], lab[sub]))
        pres = tdr.neighborhood_preservation_sampled(X, Z, K=30, n_queries=2048)
        log(step="umap_1p3m_groups", edge_groups=G, cold_s=round(cold, 1),
            warm_s=round(warm, 1), sil=round(sil, 4),
            preservation30=round(float(pres), 4))
        del Z, model


if __name__ == "__main__":
    main()
