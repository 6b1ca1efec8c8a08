"""UMAP 60k phase bisection: affinity vs loop cost, S sweep, data regime."""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import numpy as np

N, D = 60_000, 784


def log(**kw):
    print("JSON " + json.dumps(kw), flush=True)


def run(tag, model_kwargs, X, lab):
    import torchdr_tpu as tdr

    model = tdr.UMAP(n_neighbors=30, random_state=0, **model_kwargs)
    t0 = time.perf_counter()
    Z = np.asarray(model.fit_transform(X))
    cold = time.perf_counter() - t0
    t0 = time.perf_counter()
    Z = np.asarray(model.fit_transform(X))
    warm = time.perf_counter() - t0
    sub = slice(None, None, max(1, N // 5000))
    import torchdr_tpu as tdr2

    sil = float(tdr2.silhouette_score(Z[sub], lab[sub]))
    log(step=tag, **{k: v for k, v in model_kwargs.items() if k != "verbose"},
        cold_s=round(cold, 1), warm_s=round(warm, 2), sil=round(sil, 4))


def main():
    rng = np.random.default_rng(0)
    centers = rng.normal(scale=4.0, size=(10, D)).astype(np.float32)
    lab = rng.integers(0, 10, N)
    X = centers[lab] + rng.normal(size=(N, D)).astype(np.float32)

    # affinity-only proxy: 10 iters → e2e ≈ affinity + compile-free loop sliver
    run("iters10", dict(max_iter=10, shared_negatives=False), X, lab)
    run("iters500_perpoint", dict(max_iter=500, shared_negatives=False), X, lab)
    run("iters500_S512", dict(max_iter=500, shared_negatives=True,
                              n_shared_negatives=512), X, lab)
    # round-1-like regime: 40 looser clusters
    centers2 = rng.normal(scale=5.0, size=(40, D)).astype(np.float32)
    lab2 = rng.integers(0, 40, N)
    X2 = centers2[lab2] + rng.normal(size=(N, D)).astype(np.float32)
    run("40c_perpoint", dict(max_iter=500, shared_negatives=False), X2, lab2)


if __name__ == "__main__":
    main()
