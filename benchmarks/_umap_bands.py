"""UMAP band-scheduled attraction A/B at the north-star configs.

Power-of-two band scheduling (round 3): edge (i, j) with fire period eps
is visited every 2^band steps, band = floor(log2(eps)) — the reference's
per-edge duty cycle, made static-shape via a lax.switch over band-prefix
widths. Expected gathered-edge count per step is sum_b W_b/2^b instead of
W/G, and strong edges (the neighbor mass) are visited EVERY step, so
there is no G-rotation burst quantization on them.

Usage: python _umap_bands.py [60k|1p3m] [bands|groups ...]
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


def log(**kw):
    print("JSON " + json.dumps(kw), flush=True)


def main():
    config = sys.argv[1] if len(sys.argv) > 1 else "60k"
    scheds = sys.argv[2:] or ["bands", "groups"]
    rng = np.random.default_rng(0)
    if config == "60k":
        N, D, NCLUST = 60_000, 784, 10
        knn_mode = "exact"
        max_ipd = None
    else:
        N, D, NCLUST = 1_300_000, 50, 40
        knn_mode = tdr.KnnConfig(mode="ivf", nprobe=16)
        max_ipd = 20
    centers = rng.normal(scale=6.0, size=(NCLUST, D)).astype(np.float32)
    lab = rng.integers(0, NCLUST, N)
    X = centers[lab] + rng.normal(size=(N, D)).astype(np.float32)

    for sched in scheds:
        model = tdr.UMAP(
            n_neighbors=30, max_iter=500, random_state=0,
            knn_mode=knn_mode, shared_negatives=True,
            n_shared_negatives=512, edge_schedule=sched,
            max_iters_per_dispatch=max_ipd, verbose=True,
        )
        t0 = time.perf_counter()
        Z = np.asarray(model.fit_transform(X))
        cold = time.perf_counter() - t0
        t0 = time.perf_counter()
        Z = np.asarray(model.fit_transform(X))
        warm = time.perf_counter() - t0
        sub = slice(None, None, max(1, N // 5000))
        sil = float(tdr.silhouette_score(Z[sub], lab[sub]))
        pres = tdr.neighborhood_preservation_sampled(X, Z, K=30, n_queries=2048)
        log(step=f"umap_{config}_sched", schedule=sched, cold_s=round(cold, 1),
            warm_s=round(warm, 1), sil=round(sil, 4),
            preservation30=round(float(pres), 4))
        del Z, model


if __name__ == "__main__":
    main()
