"""COSNE quality tuning sweep (round 3, VERDICT weak #2).

Round 2 shipped COSNE with bounded memory but silhouette ≈ 0 on easy
clustered data at 50k. This sweep isolates the levers at n=10k (each
config ~tens of seconds), then the winner is confirmed at 50k:
init (hyperbolic-random vs PCA-expmap), lr, h-loss weight, gamma.
Quality gate target: silhouette ≥ 0.15 (the reference CI floor,
torchdr/tests/test_neighbor_embedding.py:74).
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

from torchdr_tpu.models.neighbor.cosne import COSNE
from torchdr_tpu.eval.silhouette import silhouette_score

N = int(os.environ.get("N", "10000"))
D = int(os.environ.get("D", "50"))
ITERS = int(os.environ.get("ITERS", "250"))


def log(**kw):
    print("JSON " + json.dumps(kw), flush=True)


def main():
    rng = np.random.default_rng(0)
    centers = rng.normal(scale=8.0, size=(10, D)).astype(np.float32)
    y = np.repeat(np.arange(10), N // 10)
    X = (centers[y] + rng.normal(size=(N, D)).astype(np.float32))

    configs = [
        dict(tag="control-r2", init="hyperbolic", lr="auto", h=1.0, gamma=2.0),
        dict(tag="no-hloss", init="hyperbolic", lr="auto", h=0.0, gamma=2.0),
        dict(tag="pca", init="pca", lr="auto", h=0.0, gamma=2.0),
        dict(tag="pca-h01", init="pca", lr="auto", h=0.1, gamma=2.0),
        dict(tag="pca-lr03", init="pca", lr=0.3, h=0.0, gamma=2.0),
        dict(tag="pca-lr01", init="pca", lr=0.1, h=0.0, gamma=2.0),
        dict(tag="pca-g1", init="pca", lr="auto", h=0.0, gamma=1.0),
        dict(tag="pca-g4", init="pca", lr="auto", h=0.0, gamma=4.0),
        dict(tag="pca-hnorm", init="pca", lr="auto", h=1.0, gamma=2.0,
             norm_x=True),
    ]
    for cfg in configs:
        try:
            Xc = X / np.sqrt((X ** 2).sum(1).mean()) if cfg.get("norm_x") else X
            t0 = time.perf_counter()
            model = COSNE(
                perplexity=30,
                init=cfg["init"],
                lr=cfg["lr"],
                learning_rate_for_h_loss=cfg["h"],
                gamma=cfg["gamma"],
                max_iter=ITERS,
                random_state=0,
                max_iters_per_dispatch=25,
            )
            Z = np.asarray(model.fit_transform(Xc))
            secs = time.perf_counter() - t0
            sil = float(silhouette_score(Z, y))
            log(
                tag=cfg["tag"], secs=round(secs, 1), silhouette=round(sil, 4),
                max_norm=round(float(np.sqrt((Z ** 2).sum(1)).max()), 4),
                finite=bool(np.isfinite(Z).all()),
            )
        except Exception as e:
            log(tag=cfg["tag"], error=str(e)[:300])


if __name__ == "__main__":
    main()
