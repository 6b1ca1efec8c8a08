import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np, jax
cache = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
import jax.numpy as jnp
from torchdr_tpu.ops.kmeans import kmeans_fit

def sync(x):  # block_until_ready doesn't synchronize on the axon relay
    return float(jnp.asarray(x).ravel()[0])

D, NLIST = 128, 1024
TRAIN = 65536
rng = np.random.default_rng(0)
centers = rng.normal(scale=10.0, size=(1000, D)).astype(np.float32)
train = jnp.asarray(centers[rng.integers(0, 1000, TRAIN)] + rng.normal(size=(TRAIN, D)).astype(np.float32))
sync(train)
key = jax.random.PRNGKey(0)

for init in ("++", "random"):
    for trial in range(2):
        t0 = time.perf_counter()
        C, lab, inertia = kmeans_fit(train, NLIST, key, max_iter=20, init=init)
        t_disp = time.perf_counter() - t0
        sync(inertia)
        print(f"init={init} trial={trial}: dispatch {t_disp:.1f}s, total {time.perf_counter()-t0:.1f}s", flush=True)
