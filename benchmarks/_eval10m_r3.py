"""10M-scale eval run (round 3, VERDICT #10).

Builds the 10M x 128 IVF graph at the round-3 operating points and scores
it against exact ground truth on a query subsample THROUGH the eval
package (eval/knn_metrics.knn_recall) — the neighborhood-preservation
measurement of the kNN graph itself, recorded next to the perf number.

Reference comparison: the reference ships distributed per-chunk eval
(torchdr/eval/knn_labels.py:54-64); the single-chip variant here is the
same per-query overlap on a 2048-row subsample vs all 10M rows.
"""

import gc
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import numpy as np

N, D, K, SUB = 10_000_000, 128, 15, 2048


def log(**kw):
    print("JSON " + json.dumps(kw), flush=True)


def main():
    from torchdr_tpu.eval.knn_metrics import knn_recall
    from torchdr_tpu.ops import ivf as ivf_mod
    from torchdr_tpu.ops.distance import knn_graph
    from torchdr_tpu.ops.ivf import ivf_build, ivf_knn

    t0 = time.perf_counter()
    rng = np.random.default_rng(0)
    centers = rng.normal(scale=10.0, size=(10_000, D)).astype(np.float32)
    lab = rng.integers(0, 10_000, N)
    Xh = centers[lab] + rng.normal(size=(N, D)).astype(np.float32)
    log(step="datagen", secs=round(time.perf_counter() - t0, 1))

    t0 = time.perf_counter()
    X = ivf_mod._push_segmented(Xh)
    np.asarray(X[:8])
    del Xh
    gc.collect()
    log(step="push", secs=round(time.perf_counter() - t0, 1))

    t0 = time.perf_counter()
    _, i_t = knn_graph(X[:SUB], X, k=K + 1, exclude_diag=False, precision="highest")
    i_t = np.asarray(i_t)
    i_true = np.stack([row[row != r][:K] for r, row in zip(range(SUB), i_t)])
    log(step="groundtruth", secs=round(time.perf_counter() - t0, 1))

    holder = [X]
    del X
    t0 = time.perf_counter()
    index = ivf_build(holder.pop(), n_clusters=16384, chunk=128, kmeans_iters=15)
    log(step="build", secs=round(time.perf_counter() - t0, 1))

    for nprobe, m in [(10, 16), (12, 16)]:
        kw = dict(k=K, nprobe=nprobe, m=m, index=index)
        d, i = ivf_knn(None, **kw)
        jax.block_until_ready(i)
        t0 = time.perf_counter()
        d, i = ivf_knn(None, **kw)
        jax.block_until_ready(i)
        warm = time.perf_counter() - t0
        # eval-package scoring: per-query K-ary overlap vs exact truth
        rec = knn_recall(np.asarray(i[:SUB]), i_true)
        per = knn_recall(np.asarray(i[:SUB]), i_true, return_per_sample=True)
        per = np.asarray(per)
        log(step="eval10m", nprobe=nprobe, m=m, warm_s=round(warm, 2),
            graph_preservation=round(float(rec), 5),
            frac_queries_full_recall=round(float((per == 1.0).mean()), 4),
            worst_query=round(float(per.min()), 3))


if __name__ == "__main__":
    main()
