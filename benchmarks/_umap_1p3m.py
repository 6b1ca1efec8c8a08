"""1.3M x 50 UMAP end-to-end — the BASELINE.md single-cell north-star
(reference: benchmarks/benchmark_umap_single_cell.py: Zheng 1.3M cells,
50 PCA dims, 500 iters; synthetic stand-in — no network access)."""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import numpy as np

N, D = 1_300_000, 50


def log(**kw):
    print("JSON " + json.dumps(kw), flush=True)


def main():
    import torchdr_tpu as tdr

    rng = np.random.default_rng(0)
    centers = rng.normal(scale=5.0, size=(40, D)).astype(np.float32)
    lab = rng.integers(0, 40, N)
    X = centers[lab] + rng.normal(size=(N, D)).astype(np.float32)

    model = tdr.UMAP(
        n_neighbors=30, max_iter=500, random_state=0,
        knn_mode=tdr.KnnConfig(mode="ivf", nprobe=16),
        shared_negatives=True, n_shared_negatives=512,
        edge_groups=4, max_iters_per_dispatch=20,
    )
    t0 = time.perf_counter()
    Z = np.asarray(model.fit_transform(X))
    cold = time.perf_counter() - t0
    t0 = time.perf_counter()
    Z = np.asarray(model.fit_transform(X))
    warm = time.perf_counter() - t0
    sub = slice(None, None, N // 5000)
    sil = float(tdr.silhouette_score(Z[sub], lab[sub]))
    log(step="umap_1p3m", cold_s=round(cold, 1), warm_s=round(warm, 1),
        sil=round(sil, 4))


if __name__ == "__main__":
    main()
