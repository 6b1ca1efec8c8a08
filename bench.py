"""Benchmark driver: prints ONE JSON line for the round record.

Headline metric: end-to-end UMAP fit on an MNIST-scale synthetic dataset
(60k × 784, clustered) on one TPU chip — the BASELINE.json north-star
config "UMAP n_neighbors=30 on full MNIST-784". The reference publishes no
wall-clock for this config ("orders-of-magnitude" figure only,
reference README.md:103-108), so ``vs_baseline`` is reported against the
only hard number in the reference repo rescaled to this workload: the
B200 Faiss-Flat kNN throughput (10.19 s for 1M×128 pairs ⇒
2.513e10 pairs/s at d=128; benchmarks/faiss/BENCHMARK_RESULTS.md:3-12).
vs_baseline = (reference-projected seconds for our kNN workload) / (our
total fit seconds) — >1 means we beat the projected B200 Faiss time with
the WHOLE fit, not just the graph build.

Also printed to stderr: phase breakdown + kNN recall@k of the approx tier.
"""

import json
import sys
import time

import numpy as np


def make_clustered(n, d, n_clusters=100, seed=0):
    rng = np.random.default_rng(seed)
    centers = rng.normal(scale=6.0, size=(n_clusters, d)).astype(np.float32)
    assign = rng.integers(0, n_clusters, n)
    X = centers[assign] + rng.normal(size=(n, d)).astype(np.float32)
    return X, assign


def main():
    import os

    import jax

    # Persistent compile cache: first-ever run pays the (slow, remote)
    # compiles; subsequent runs — including the driver's — start warm.
    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    except Exception:
        pass

    import jax.numpy as jnp

    import torchdr_tpu as tdr
    from torchdr_tpu.eval.knn_metrics import knn_recall
    from torchdr_tpu.ops.distance import knn_graph

    n, d, k = 60_000, 784, 30
    X, labels = make_clustered(n, d)
    X_jax = jnp.asarray(X)

    # --- warm-up / compile (excluded from the timed run) ---
    model = tdr.UMAP(
        n_neighbors=k, max_iter=500, random_state=0, init="pca",
        verbose=False,
    )
    t_all = time.perf_counter()
    Z = model.fit_transform(X_jax)
    _ = np.asarray(Z)
    warm = time.perf_counter() - t_all

    # --- timed run (steady state: compiled) ---
    model = tdr.UMAP(n_neighbors=k, max_iter=500, random_state=1, init="pca")
    t0 = time.perf_counter()
    Z = model.fit_transform(X_jax)
    _ = np.asarray(Z)
    fit_s = time.perf_counter() - t0

    # --- quality: kNN recall of the graph tier + embedding quality ---
    sub = 2_000
    d_exact, i_exact = knn_graph(X_jax[:sub], k=k, precision="highest")
    d_full, i_full = knn_graph(X_jax, k=k, precision="highest", block_size=2048)
    recall = knn_recall(i_full[:sub], i_exact)
    sil = tdr.silhouette_score(np.asarray(Z)[::20], labels[::20])

    # --- baseline projection (B200 Faiss Flat pair-throughput) ---
    ref_pairs_per_s = (1_000_000.0**2) / 10.19  # B200 Flat, d=128
    # scale for dimension d/128 (flop-proportional)
    projected_ref_s = (float(n) ** 2) * (d / 128.0) / ref_pairs_per_s
    vs_baseline = projected_ref_s / fit_s

    print(
        f"[bench] warm(incl compile)={warm:.1f}s fit={fit_s:.2f}s "
        f"recall@{k}={recall:.4f} silhouette={sil:.3f} "
        f"projected_B200_faiss_flat_knn={projected_ref_s:.2f}s",
        file=sys.stderr,
    )
    print(
        json.dumps(
            {
                "metric": "umap_60000x784_k30_fit_seconds",
                "value": round(fit_s, 3),
                "unit": "s",
                "vs_baseline": round(vs_baseline, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
