"""Fused Pallas repulsion vs XLA shared-negatives path (round 3).

Times the repulsion gradient alone at 60k and 1.3M shapes, then the full
60k UMAP fit with the fused kernel (the round-2 steady state was 27 s
with S=512; VERDICT #8 target is <= 20 s).
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


def log(**kw):
    print("JSON " + json.dumps(kw), flush=True)


A, B, EPS = 1.577, 0.8951, 1e-3


@jax.jit
def xla_rep(Z, neg, w):
    Zneg = Z[neg]
    gram = jnp.matmul(Z, Zneg.T, preferred_element_type=jnp.float32,
                      precision=jax.lax.Precision.HIGHEST)
    D = jnp.maximum(
        jnp.sum(Z * Z, 1)[:, None] + jnp.sum(Zneg * Zneg, 1)[None, :] - 2 * gram, 0.0
    )
    coef = -2.0 * B / ((D + EPS) * (1.0 + A * D**B))
    valid = neg[None, :] != jnp.arange(Z.shape[0])[:, None]
    coef = jnp.where(valid, coef, 0.0) * w[:, None]
    return jnp.clip(jnp.sum(coef, 1)[:, None] * Z - coef @ Zneg, -4.0, 4.0)


def time_fn(f, *args, reps=50):
    out = f(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = f(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps


def main():
    from torchdr_tpu.ops.pallas.umap_kernel import fused_shared_repulsion

    rng = np.random.default_rng(0)
    for n, S in [(60_000, 512), (60_000, 2048), (1_300_000, 512), (1_300_000, 2048)]:
        Z = jnp.asarray(rng.normal(size=(n, 2)).astype(np.float32))
        neg = jnp.asarray(rng.integers(0, n, S).astype(np.int32))
        w = jnp.asarray(rng.integers(0, 40, n).astype(np.float32) / S)
        t_xla = time_fn(xla_rep, Z, neg, w)
        t_fused = time_fn(
            lambda Z, neg, w: fused_shared_repulsion(Z, neg, w, A, B, EPS), Z, neg, w
        )
        ref = xla_rep(Z, neg, w)
        got = fused_shared_repulsion(Z, neg, w, A, B, EPS)
        err = float(jnp.max(jnp.abs(ref - got)))
        log(step="rep_micro", n=n, S=S, xla_ms=round(t_xla * 1e3, 3),
            fused_ms=round(t_fused * 1e3, 3),
            speedup=round(t_xla / t_fused, 2), max_diff=round(err, 5))

    # full 60k fit, fused (kernel auto-dispatches on TPU)
    import torchdr_tpu as tdr

    centers = rng.normal(scale=4.0, size=(10, 784)).astype(np.float32)
    lab = rng.integers(0, 10, 60_000)
    X = centers[lab] + rng.normal(size=(60_000, 784)).astype(np.float32)
    for kw in (dict(), dict(n_shared_negatives=512), dict(edge_groups=4),
               dict(edge_groups=4, n_shared_negatives=512)):
        model = tdr.UMAP(n_neighbors=30, max_iter=500, random_state=0, **kw)
        t0 = time.perf_counter()
        Z = np.asarray(model.fit_transform(X))
        cold = time.perf_counter() - t0
        t0 = time.perf_counter()
        Z = np.asarray(model.fit_transform(X))
        warm = time.perf_counter() - t0
        sil = float(tdr.silhouette_score(Z[::10], lab[::10]))
        log(step="umap60k_fused", **kw, cold_s=round(cold, 1),
            warm_s=round(warm, 1), sil=round(sil, 4))


if __name__ == "__main__":
    main()
