"""1.3M x 50 UMAP: power-of-two band schedule vs edge_groups=12 A/B.

The bands schedule landed at round-3 close (default for n >= 50k) but was
never measured at 1.3M. Band b fires on iterations with it % 2^b == 0, so
the expected gathered-edge width per step is sum_b W_b/2^b instead of the
full symmetrized width — the per-edge duty cycle of the reference
(torchdr/neighbor_embedding/umap.py:215-264) made static-shape. Same data,
same chip, same eval as _umap_1p3m_groups.py so the A/B is direct.
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

    configs = sys.argv[1:] or ["bands", "groups12"]
    for cfg in configs:
        if cfg == "bands":
            kw = dict(edge_schedule="bands")
        elif cfg.startswith("groups"):
            kw = dict(edge_schedule="groups", edge_groups=int(cfg[6:]))
        else:
            raise SystemExit(f"unknown config {cfg}")
        model = tdr.UMAP(
            n_neighbors=30, max_iter=500, random_state=0, verbose=True,
            knn_mode=tdr.KnnConfig(mode="ivf", nprobe=16),
            shared_negatives=True, n_shared_negatives=512,
            max_iters_per_dispatch=20, **kw,
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
        log(step="umap_1p3m_sched", config=cfg, cold_s=round(cold, 1),
            warm_s=round(warm, 1), sil=round(sil, 4),
            preservation30=round(float(pres), 4))
        del Z, model


if __name__ == "__main__":
    main()
