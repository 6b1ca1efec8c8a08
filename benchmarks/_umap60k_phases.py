"""Phase breakdown of the 60k x 784 UMAP fit on the real chip.

Measures: affinity-build wall, loop wall (500 iters), and per-step cost
scaling with edge_groups / shared-negative width / degree cap — to decide
where the remaining time goes for the <=20 s north-star.

Usage: python benchmarks/_umap60k_phases.py [variant ...]
Variants: base g4 w64 g4w64 s256 g4s256 w64s256 g4w64s256
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


def make_data(n=60_000, d=784, n_clusters=10, seed=0):
    rng = np.random.default_rng(seed)
    centers = rng.normal(scale=4.0, size=(n_clusters, d)).astype(np.float32)
    lab = rng.integers(0, n_clusters, n)
    X = centers[lab] + rng.normal(size=(n, d)).astype(np.float32)
    return X, lab


VARIANTS = {
    "base": {},
    "g4": dict(edge_groups=4),
    "w64": dict(max_graph_degree=64),
    "g4w64": dict(edge_groups=4, max_graph_degree=64),
    "s256": dict(n_shared_negatives=256),
    "g4s256": dict(edge_groups=4, n_shared_negatives=256),
    "w64s256": dict(max_graph_degree=64, n_shared_negatives=256),
    "g4w64s256": dict(edge_groups=4, max_graph_degree=64, n_shared_negatives=256),
}


def main():
    names = sys.argv[1:] or ["base", "g4", "g4w64", "g4w64s256"]
    X, lab = make_data()

    from torchdr_tpu.models.neighbor.umap import UMAP

    for name in names:
        kw = VARIANTS[name]
        best = None
        for rep in range(3):
            model = UMAP(
                n_neighbors=30, max_iter=500, random_state=0, init="pca",
                verbose=False, **kw,
            )
            t0 = time.perf_counter()
            model._compute_input_affinity_timed = None  # no-op marker
            # run fit with phase timing via monkey timestamps
            import torchdr_tpu.affinity_matcher as am

            t_aff = {}
            orig = model._compute_input_affinity

            def timed(Xj, _orig=orig, _t=t_aff):
                s = time.perf_counter()
                out = _orig(Xj)
                jax.block_until_ready(model.affinity_in_)
                _t["affinity_s"] = time.perf_counter() - s
                return out

            model._compute_input_affinity = timed
            Z = model.fit_transform(X)
            np.asarray(Z)
            e2e = time.perf_counter() - t0
            loop_s = e2e - t_aff.get("affinity_s", 0.0)
            from torchdr_tpu.eval.silhouette import silhouette_score
            from torchdr_tpu.eval.knn_metrics import neighborhood_preservation

            sil = float(silhouette_score(Z[::10], lab[::10]))
            # north-star quality: input 30-NN preserved in the embedding
            # (BASELINE.md "kNN recall@30"), on a 6k subsample
            pres = float(
                neighborhood_preservation(X[::10], np.asarray(Z)[::10], K=30)
            )
            rec = dict(variant=name, rep=rep, e2e=round(e2e, 1),
                       affinity_s=round(t_aff.get("affinity_s", -1), 1),
                       loop_s=round(loop_s, 1), sil=round(sil, 4),
                       preservation30=round(pres, 4))
            print("JSON " + json.dumps(rec), flush=True)
            if best is None or e2e < best:
                best = e2e


if __name__ == "__main__":
    main()
