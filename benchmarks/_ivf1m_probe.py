"""One-off probe: IVF at the reference's 1M×128 clustered config."""

import sys
import time

sys.path.insert(0, "/root/repo")
import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
import numpy as np
import jax.numpy as jnp

from torchdr_tpu.ops.distance import knn_graph
from torchdr_tpu.ops.ivf import ivf_build, ivf_knn

rng = np.random.default_rng(0)
centers = rng.normal(scale=10.0, size=(1000, 128)).astype(np.float32)
n = 1_000_000
X = jnp.asarray(
    centers[rng.integers(0, 1000, n)] + rng.normal(size=(n, 128)).astype(np.float32)
)

t0 = time.perf_counter()
index = ivf_build(X, n_clusters=1024, kmeans_iters=20)
print(f"ivf build (nlist=1024): {time.perf_counter()-t0:.2f}s cap={index.cap}", flush=True)

i_ivf = None
for nprobe in [8, 16]:
    d, i = ivf_knn(X, k=15, nprobe=nprobe, index=index)
    float(jnp.sum(jnp.where(jnp.isfinite(d), d, 0)))
    t0 = time.perf_counter()
    d, i = ivf_knn(X, k=15, nprobe=nprobe, index=index)
    float(jnp.sum(jnp.where(jnp.isfinite(d), d, 0)))
    print(f"ivf search nprobe={nprobe}: {time.perf_counter()-t0:.2f}s", flush=True)
    i_ivf = np.asarray(i[:1000])

d_t, i_t = knn_graph(X[:1000], X, k=16, exclude_diag=False, precision="highest")
i_t = np.asarray(i_t)
i_true = np.stack([row[row != r][:15] for r, row in zip(range(1000), i_t)])
rec = np.mean([len(set(i_ivf[j]) & set(i_true[j])) / 15 for j in range(1000)])
print(f"IVF recall@15 vs exact (nprobe=16): {rec:.4f}", flush=True)
print("DONE", flush=True)
