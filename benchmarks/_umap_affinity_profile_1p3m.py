"""Phase-profile the 1.3M x 50 UMAP affinity build (warm, value-pull sync).

ROUND4_PLAN said "IVF build dominates" the 68 s affinity phase — the
direct ivf_build profile refutes that (warm build ~2 s). This decomposes
the real estimator path: ivf search (k=30, rerank=False), calibration
bisection, sparse symmetrization + degree cap.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import numpy as np

from torchdr_tpu.ops.ivf import ivf_build, ivf_knn
from torchdr_tpu.affinity.knn_normalized import _umap_calibrate
from torchdr_tpu.ops.sparse import symmetrize_sparse

N, D, K = 1_300_000, 50, 30

rng = np.random.default_rng(0)
centers = rng.normal(scale=6.0, size=(40, D)).astype(np.float32)
lab = rng.integers(0, 40, N)
key = jax.random.PRNGKey(1)
X = jnp.asarray(centers)[jnp.asarray(lab)] + jax.random.normal(key, (N, D))
X = (X - jnp.mean(X, 0, keepdims=True)).block_until_ready()


def force(x):
    return float(jnp.asarray(x).ravel()[0])


for rep in range(2):
    t = {}
    t0 = time.perf_counter()
    index = ivf_build(X)
    force(index.X_sorted[0, 0])
    t["build"] = time.perf_counter() - t0

    t0 = time.perf_counter()
    C, I = ivf_knn(None, index=index, k=K, nprobe=16, rerank=False)
    force(C[0, 0])
    t["search"] = time.perf_counter() - t0

    t0 = time.perf_counter()
    P, rho, eps = _umap_calibrate(C, float(K), 1000)
    force(P[0, 0])
    t["calibrate"] = time.perf_counter() - t0

    t0 = time.perf_counter()
    Ps, Is = symmetrize_sparse(P, I, mode="sum_minus_prod", k_out=120)
    force(Ps[0, 0])
    t["symmetrize"] = time.perf_counter() - t0

    if rep:
        print(
            "warm: " + " ".join(f"{k}={v:.1f}s" for k, v in t.items())
            + f" total={sum(t.values()):.1f}s",
            flush=True,
        )
    else:
        print(
            "cold: " + " ".join(f"{k}={v:.1f}s" for k, v in t.items()),
            flush=True,
        )
    del index, C, I, P, Ps, Is
