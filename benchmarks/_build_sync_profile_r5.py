import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np, jax
cache = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
import jax.numpy as jnp
import torchdr_tpu.ops.ivf as ivf

def sync(x):
    return np.asarray(jnp.ravel(x)[:1])

N, D = 1_000_000, 128
rng = np.random.default_rng(0)
centers = rng.normal(scale=10.0, size=(1000, D)).astype(np.float32)
Xh = centers[rng.integers(0, 1000, N)] + rng.normal(size=(N, D)).astype(np.float32)
t0 = time.perf_counter(); X = jnp.asarray(Xh); sync(X)
print(f"push X: {time.perf_counter()-t0:.1f}s", flush=True)

key = jax.random.PRNGKey(0)
t0 = time.perf_counter()
train = jax.random.choice(key, X, (65536,), replace=False); sync(train)
print(f"train sample: {time.perf_counter()-t0:.1f}s", flush=True)

from torchdr_tpu.ops.kmeans import kmeans_fit
t0 = time.perf_counter()
C, _, inertia = kmeans_fit(train, 1024, key, max_iter=20, init="++"); sync(inertia)
print(f"kmeans: {time.perf_counter()-t0:.1f}s", flush=True)

t0 = time.perf_counter()
lab = ivf._assign_blockwise(X, C); lab_h = np.asarray(lab)
print(f"assign+pull: {time.perf_counter()-t0:.1f}s", flush=True)

t0 = time.perf_counter()
perm_s, supers, members = ivf._build_supers(C, 32, key); sync(supers)
print(f"supers: {time.perf_counter()-t0:.1f}s", flush=True)
t0 = time.perf_counter()
adj = ivf._build_cell_adjacency(C); sync(adj)
print(f"adjacency: {time.perf_counter()-t0:.1f}s", flush=True)
