"""KernelPCA at n=200k via the matrix-free streamed LOBPCG operator.

VERDICT #4 done-criterion: a dense kernel at n=200k would be 160 GB
(impossible on one chip); the matvec regenerates kernel row blocks from
X, so live memory is O(block·n) ≈ 400 MB. Eigenpair correctness vs
dense eigh is pinned by tests/test_spectral.py at n=2k; this records
the at-scale wall time + spectrum sanity on the real chip.
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

N = int(os.environ.get("N", "200000"))
D = int(os.environ.get("D", "50"))


def log(**kw):
    print("JSON " + json.dumps(kw), flush=True)


def main():
    import torchdr_tpu as tdr
    from torchdr_tpu.affinity import NormalizedGaussianAffinity

    rng = np.random.default_rng(0)
    centers = rng.normal(scale=6.0, size=(12, D)).astype(np.float32)
    lab = rng.integers(0, 12, N)
    X = centers[lab] + rng.normal(size=(N, D)).astype(np.float32)

    # sigma ~ median pairwise distance scale of the data
    sub = X[:: N // 2000]
    med = float(np.median(((sub[:, None, :] - sub[None, :, :]) ** 2).sum(-1)))
    model = tdr.KernelPCA(
        affinity=NormalizedGaussianAffinity(
            sigma=med, normalization_dim=None, zero_diag=False
        ),
        n_components=4, solver="lobpcg", random_state=0,
    )
    t0 = time.perf_counter()
    Z = np.asarray(model.fit_transform(X))
    secs = time.perf_counter() - t0
    ev = np.asarray(model.eigenvalues_[:4], np.float64)
    sil = float(tdr.silhouette_score(Z[::100], lab[::100]))
    log(
        step="kpca200k", secs=round(secs, 1),
        eigvals=[round(float(v), 2) for v in ev],
        monotone=bool((np.diff(ev) <= 1e-3 * ev[0]).all()),
        finite=bool(np.isfinite(Z).all()),
        silhouette=round(sil, 4),
        dense_kernel_bytes=int(N) * int(N) * 4,
    )


if __name__ == "__main__":
    main()
