"""Profile the 1.3M x 50 IVF build phases (ROUND4_PLAN 1.3M lever 3).

Generates the UMAP-1.3M benchmark geometry on device (no tunnel cost),
runs ivf_build(verbose=True) at several kmeans_iters settings, and checks
the downstream graph recall of each quantizer against the default.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from torchdr_tpu.ops.ivf import ivf_build, ivf_knn, auto_nlist

N, D, K = 1_300_000, 50, 15
NPROBE = 16

rng = np.random.default_rng(0)
centers = rng.normal(scale=10.0, size=(40, D)).astype(np.float32)
key = jax.random.PRNGKey(0)
assign = jax.random.randint(key, (N,), 0, 40)
X = jnp.asarray(centers)[assign] + jax.random.normal(jax.random.PRNGKey(1), (N, D))
X = X.block_until_ready()
print(f"nlist auto = {auto_nlist(N)}", flush=True)

# exact ground truth on a query subsample for recall
QS = 1024
qidx = np.sort(rng.choice(N, QS, replace=False))
Q = X[jnp.asarray(qidx)]
d2 = (
    jnp.sum(Q * Q, 1)[:, None]
    - 2.0 * Q @ X.T
    + jnp.sum(X * X, 1)[None, :]
)
d2 = d2.at[jnp.arange(QS), jnp.asarray(qidx)].set(jnp.inf)
_, gt = jax.lax.top_k(-d2, K)
gt = np.asarray(gt)
print("ground truth done", flush=True)


def recall(idx_all):
    got = np.asarray(idx_all[jnp.asarray(qidx)])
    hits = sum(len(set(got[i]) & set(gt[i])) for i in range(QS))
    return hits / (QS * K)


for iters in (25, 10, 6):
    for rep in range(2):
        t0 = time.perf_counter()
        index = ivf_build(X, kmeans_iters=iters, verbose=(rep == 1))
        jax.block_until_ready(index.X_sorted)
        t_build = time.perf_counter() - t0
        t0 = time.perf_counter()
        D_, I_ = ivf_knn(None, index=index, k=K, nprobe=NPROBE)
        float(D_[0, 0])  # force
        t_search = time.perf_counter() - t0
        if rep == 1:
            print(
                f"iters={iters}: build={t_build:.1f}s search={t_search:.1f}s "
                f"recall={recall(I_):.4f}",
                flush=True,
            )
        del index, D_, I_
