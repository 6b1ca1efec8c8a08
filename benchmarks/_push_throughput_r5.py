import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np, jax, jax.numpy as jnp
from torchdr_tpu.ops.ivf import _push_segmented

def sync(x):
    return np.asarray(jnp.ravel(x)[:1])

D = 128
for mb in (32, 128, 512):
    rows = mb * (1 << 20) // (D * 4)
    Xh = np.random.default_rng(0).normal(size=(rows, D)).astype(np.float32)
    t0 = time.perf_counter(); X = jnp.asarray(Xh); sync(X)
    dt = time.perf_counter() - t0
    print(f"monolithic {mb}MB: {dt:.1f}s = {mb/dt:.1f} MB/s", flush=True)
    del X
for seg_mb in (512, 128, 32):
    mb = 512
    rows = mb * (1 << 20) // (D * 4)
    Xh = np.random.default_rng(0).normal(size=(rows, D)).astype(np.float32)
    t0 = time.perf_counter(); X = _push_segmented(Xh, seg_bytes=seg_mb << 20); sync(X)
    dt = time.perf_counter() - t0
    print(f"segmented({seg_mb}MB) 512MB: {dt:.1f}s = {mb/dt:.1f} MB/s", flush=True)
    del X
