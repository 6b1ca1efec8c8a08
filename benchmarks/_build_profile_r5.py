"""Round-5 IVF build phase profile at the 1M bench config (warm compile cache)."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np, jax
cache = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
import jax.numpy as jnp
from torchdr_tpu.ops.ivf import ivf_build

N, D = 1_000_000, 128
rng = np.random.default_rng(0)
centers = rng.normal(scale=10.0, size=(1000, D)).astype(np.float32)
X = jnp.asarray(centers[rng.integers(0, 1000, N)] + rng.normal(size=(N, D)).astype(np.float32))
X.block_until_ready()
for trial in range(2):
    t0 = time.perf_counter()
    idx = ivf_build(X, n_clusters=1024, kmeans_iters=20, verbose=True)
    jax.block_until_ready(idx.X_sorted)
    print(f"TRIAL {trial} TOTAL build: {time.perf_counter()-t0:.1f}s", flush=True)
