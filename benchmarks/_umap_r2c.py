"""UMAP 60k x 784 definitive round-2 measurement (compiled-loop cache in
place: warm fits are true steady-state)."""

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


def main():
    import torchdr_tpu as tdr

    rng = np.random.default_rng(0)
    centers = rng.normal(scale=4.0, size=(10, D)).astype(np.float32)
    lab = rng.integers(0, 10, N)
    X = centers[lab] + rng.normal(size=(N, D)).astype(np.float32)

    for tag, kw in [
        ("perpoint", dict(shared_negatives=False)),
        ("sharedS512", dict(shared_negatives=True, n_shared_negatives=512)),
        ("sharedS2048", dict(shared_negatives=True, n_shared_negatives=2048)),
        ("S512_G4", dict(shared_negatives=True, n_shared_negatives=512,
                         edge_groups=4)),
    ]:
        model = tdr.UMAP(n_neighbors=30, max_iter=500, random_state=0, **kw)
        t0 = time.perf_counter()
        Z = np.asarray(model.fit_transform(X))
        cold = time.perf_counter() - t0
        times = []
        for _ in range(2):
            t0 = time.perf_counter()
            Z = np.asarray(model.fit_transform(X))
            times.append(time.perf_counter() - t0)
        sub = slice(None, None, max(1, N // 5000))
        sil = float(tdr.silhouette_score(Z[sub], lab[sub]))
        log(step=tag, cold_s=round(cold, 1),
            warm_s=round(min(times), 2), warm_all=[round(t, 2) for t in times],
            sil=round(sil, 4))


if __name__ == "__main__":
    main()
