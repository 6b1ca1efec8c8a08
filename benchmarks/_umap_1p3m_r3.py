"""1.3M x 50 UMAP end-to-end with QUALITY evidence (round 3).

The BASELINE.md single-cell north-star config (Zheng 1.3M stand-in), now
recording neighborhood preservation of the embedding against the input
(sampled exact cross-kNN vs the full 1.3M rows) and the edge_groups
G=1 vs G=4 A/B that the round-2 headline depended on (VERDICT weak #5:
G=4 was used for the speed number but flagged for quality).
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

N, D = 1_300_000, 50


def log(**kw):
    print("JSON " + json.dumps(kw), flush=True)


def main():
    import torchdr_tpu as tdr

    rng = np.random.default_rng(0)
    centers = rng.normal(scale=5.0, size=(40, D)).astype(np.float32)
    lab = rng.integers(0, 40, N)
    X = centers[lab] + rng.normal(size=(N, D)).astype(np.float32)

    for G in (4, 1):
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
        pres = tdr.neighborhood_preservation_sampled(
            X, Z, K=30, n_queries=2048
        )
        log(step="umap_1p3m", edge_groups=G, cold_s=round(cold, 1),
            warm_s=round(warm, 1), sil=round(sil, 4),
            preservation30=round(pres, 4))
        del Z, model
        import gc; gc.collect()


if __name__ == "__main__":
    main()
