"""1M x 128 round-3d: exact tournament merge with sub-slot splitting.

Round-2 measured the tournament 1.8-2.7x slower than approx at 1M
because its first-stage lax.top_k ran on chunk-wide (512) rows. The
sub-slot split (_TOURNAMENT_SUB) keeps the merge exact while narrowing
stage 1. If tournament lands at/below the approx 2.11 s it becomes the
headline: monotone in nprobe and immune to the approx binning artifact.

MEASURED (v5e, 2026-08-17): sub width is NEUTRAL — 6.37/6.34/6.37 s at
512/256/128 (np12 m20); np10 3.83 s; approx baseline 2.116 s in the
same session. The 1M tournament is scan-bound, not selection-bound.
The _TOURNAMENT_SUB knob was removed from ops/ivf.py after this run
(the setattr below is now a no-op, kept for the record).
"""

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

from torchdr_tpu.ops import ivf as ivf_mod
from torchdr_tpu.ops.distance import knn_graph
from torchdr_tpu.ops.ivf import ivf_build, ivf_knn

N, D, K = 1_000_000, 128, 15
SUB = 1000


def log(**kw):
    print("JSON " + json.dumps(kw), flush=True)


def force(x):
    return float(jnp.sum(jnp.where(jnp.isfinite(x), x, 0)))


def main():
    rng = np.random.default_rng(0)
    centers = rng.normal(scale=10.0, size=(1000, D)).astype(np.float32)
    X = jnp.asarray(
        centers[rng.integers(0, 1000, N)] + rng.normal(size=(N, D)).astype(np.float32)
    )
    _, i_t = knn_graph(X[:SUB], X, k=K + 1, exclude_diag=False, precision="highest")
    i_t = np.asarray(i_t)
    i_true = np.stack([row[row != r][:K] for r, row in zip(range(SUB), i_t)])

    def recall(i):
        ig = np.asarray(i[:SUB])
        return float(
            np.mean([len(set(ig[j]) & set(i_true[j])) / K for j in range(SUB)])
        )

    index = ivf_build(X, n_clusters=1024, kmeans_iters=20)
    for sub, cfg in [
        (512, dict(nprobe=12, m=20, merge="tournament")),   # old geometry
        (256, dict(nprobe=12, m=20, merge="tournament")),
        (128, dict(nprobe=12, m=20, merge="tournament")),
        (256, dict(nprobe=10, m=20, merge="tournament")),
        (256, dict(nprobe=12, m=24, merge="tournament")),
        (256, dict(nprobe=12, m=24, merge="approx")),       # headline baseline
    ]:
        ivf_mod._TOURNAMENT_SUB = sub
        kw = dict(k=K, scan_precision="high", block=256, index=index, **cfg)
        d, i = ivf_knn(X, **kw)
        force(d)
        best = 1e9
        for _ in range(2):
            t0 = time.perf_counter()
            d, i = ivf_knn(X, **kw)
            force(d)
            best = min(best, time.perf_counter() - t0)
        log(step="sweep", sub=sub, **cfg, warm_s=round(best, 3),
            recall=round(recall(i), 5))


if __name__ == "__main__":
    main()
