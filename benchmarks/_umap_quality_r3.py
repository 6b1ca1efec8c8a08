"""UMAP north-star quality evidence (round 3, VERDICT weak #3/#5).

Runs the 60k "UMAP-784" config and records neighborhood preservation of
the EMBEDDING against the INPUT graph (the metric BASELINE.md actually
asks for) — not just blob silhouette — plus sklearn trustworthiness on a
subsample and a PCA-2D baseline for calibration. Includes the
edge_groups G=1 vs G=4 A/B the 1.3M headline depends on.

Data: hierarchical synthetic (10 superclusters x 6 subclusters on a
low-d manifold embedded in 784-d) — no-network stand-in for MNIST-784
with non-trivial local structure (subcluster neighborhoods) that blob
silhouette cannot see.
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

N = int(os.environ.get("N", "60000"))
D = int(os.environ.get("D", "784"))


def log(**kw):
    print("JSON " + json.dumps(kw), flush=True)


def make_data(rng):
    """10 superclusters x 6 subclusters, 16-d latent -> 784-d embed."""
    n_super, n_sub = 10, 6
    latent_d = 16
    sup_centers = rng.normal(scale=10.0, size=(n_super, latent_d))
    sub_offsets = rng.normal(scale=3.0, size=(n_super, n_sub, latent_d))
    y_sup = rng.integers(0, n_super, N)
    y_sub = rng.integers(0, n_sub, N)
    latent = (
        sup_centers[y_sup]
        + sub_offsets[y_sup, y_sub]
        + rng.normal(scale=1.0, size=(N, latent_d))
    )
    W = rng.normal(size=(latent_d, D)) / np.sqrt(latent_d)
    X = (latent @ W + 0.05 * rng.normal(size=(N, D))).astype(np.float32)
    return X, y_sup * n_sub + y_sub, y_sup


def main():
    import torchdr_tpu as tdr
    from sklearn.manifold import trustworthiness

    rng = np.random.default_rng(0)
    X, y_fine, y_sup = make_data(rng)

    # PCA-2D calibration baseline
    Zp = np.asarray(tdr.PCA(n_components=2).fit_transform(X))
    pres_pca = tdr.neighborhood_preservation_sampled(X, Zp, K=30, n_queries=2048)
    log(step="baseline_pca2d", preservation30=round(pres_pca, 4))

    for G in (1, 4):
        model = tdr.UMAP(
            n_neighbors=30, max_iter=500, random_state=0,
            shared_negatives=True, edge_groups=G,
            max_iters_per_dispatch=50,
        )
        t0 = time.perf_counter()
        Z = np.asarray(model.fit_transform(X))
        cold = time.perf_counter() - t0
        t0 = time.perf_counter()
        Z = np.asarray(model.fit_transform(X))
        warm = time.perf_counter() - t0
        pres = tdr.neighborhood_preservation_sampled(X, Z, K=30, n_queries=2048)
        sub = np.sort(rng.choice(N, 5000, replace=False))
        tw = float(trustworthiness(X[sub], Z[sub], n_neighbors=15))
        sil_f = float(tdr.silhouette_score(Z[sub], y_fine[sub]))
        sil_s = float(tdr.silhouette_score(Z[sub], y_sup[sub]))
        log(
            step="umap60k", edge_groups=G, cold_s=round(cold, 1),
            warm_s=round(warm, 1), preservation30=round(pres, 4),
            trustworthiness15=round(tw, 4),
            silhouette_fine=round(sil_f, 4), silhouette_super=round(sil_s, 4),
        )


if __name__ == "__main__":
    main()
