"""Exact 1M x 128 kNN crash bisection, one subprocess per attempt.

A crashed TPU worker poisons the whole process (every later dispatch gets
UNAVAILABLE), so each (db_block, block, rep) runs in a fresh interpreter,
with a cooldown after a crash while the worker restarts.
"""

import json
import os
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)

CHILD = r"""
import sys, time
sys.path.insert(0, {repo!r})
import jax
jax.config.update("jax_compilation_cache_dir", {repo!r} + "/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
import jax.numpy as jnp
import numpy as np
from torchdr_tpu.ops.distance import knn_graph
rng = np.random.default_rng(0)
centers = rng.normal(scale=10.0, size=(1000, 128)).astype(np.float32)
X = jnp.asarray(centers[rng.integers(0, 1000, 1_000_000)]
                + rng.normal(size=(1_000_000, 128)).astype(np.float32))
float(jnp.sum(X[:8]))
t0 = time.perf_counter()
d, i = knn_graph(X, k=15, precision="highest", block_size={block}, db_block={db_block})
s = float(jnp.sum(jnp.where(jnp.isfinite(d), d, 0)))
print("RESULT", time.perf_counter() - t0, s)
"""


def log(**kw):
    print("JSON " + json.dumps(kw), flush=True)


def attempt(db_block, block, rep):
    code = CHILD.format(repo=REPO, block=block, db_block=db_block)
    t0 = time.perf_counter()
    proc = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True, timeout=1800
    )
    for line in proc.stdout.splitlines():
        if line.startswith("RESULT"):
            _, secs, chk = line.split()
            log(step="exact", db_block=db_block, block=block, rep=rep,
                secs=round(float(secs), 2), checksum=round(float(chk), 1))
            return True
    err = (proc.stderr or "")[-400:]
    log(step="exact", db_block=db_block, block=block, rep=rep,
        wall=round(time.perf_counter() - t0, 1), error=err.splitlines()[-1][:200] if err else "?")
    return False


def main():
    for db_block, block in ((16_384, 512), (8_192, 512), (32_768, 256)):
        ok_all = True
        for rep in range(3):
            ok = attempt(db_block, block, rep)
            if not ok:
                ok_all = False
                time.sleep(180)  # worker restart cooldown
                break
        if ok_all:
            log(step="verdict", db_block=db_block, block=block, status="3/3 ok")
            break


if __name__ == "__main__":
    main()
