import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np, jax
cache = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
import jax.numpy as jnp
from torchdr_tpu.ops.ivf import _assign_blockwise

N, D, NLIST = 1_000_000, 128, 1024
rng = np.random.default_rng(0)
X = jnp.asarray(rng.normal(size=(N, D)).astype(np.float32)); X.block_until_ready()
C = jnp.asarray(rng.normal(size=(NLIST, D)).astype(np.float32)); C.block_until_ready()

t0 = time.perf_counter()
lowered = _assign_blockwise.lower(X, C)
print(f"lower: {time.perf_counter()-t0:.1f}s", flush=True)
t0 = time.perf_counter()
compiled = lowered.compile()
print(f"compile: {time.perf_counter()-t0:.1f}s", flush=True)
t0 = time.perf_counter()
lab = compiled(X, C); lab.block_until_ready()
print(f"exec1: {time.perf_counter()-t0:.1f}s", flush=True)
t0 = time.perf_counter()
lab = compiled(X, C); lab.block_until_ready()
print(f"exec2: {time.perf_counter()-t0:.1f}s", flush=True)
t0 = time.perf_counter()
h = np.asarray(lab)
print(f"pull 4MB: {time.perf_counter()-t0:.1f}s", flush=True)
