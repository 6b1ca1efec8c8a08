"""UMAP affinity: single-device vs mesh-sharded construction agree exactly
(reference: examples/affinities/single_vs_multi_gpu_umap_affinity.py).

Run with a virtual mesh:
  XLA_FLAGS=--xla_force_host_platform_device_count=8 \
  python examples/affinities/single_vs_multi_device_umap_affinity.py
"""

import os

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")

import jax

if jax.default_backend() not in ("tpu",):
    jax.config.update("jax_platforms", "cpu")

import numpy as np

from torchdr_tpu.ops.distance import knn_graph
from torchdr_tpu.ops.sparse import sparse_to_dense, symmetrize_sparse
from torchdr_tpu.parallel import (
    distributed_symmetrize_sparse,
    knn_graph_ring,
    make_mesh,
)


def main():
    n_dev = len(jax.devices())
    mesh = make_mesh(n_dev)
    rng = np.random.default_rng(0)
    X = rng.normal(size=(512, 16)).astype(np.float32)

    # single-device kNN + symmetrization
    d1, i1 = knn_graph(X, k=15)
    v1, j1 = symmetrize_sparse(np.exp(-d1), i1, mode="sum_minus_prod")

    # mesh: ring kNN (ppermute, O(n/p) memory) + all_to_all symmetrization
    d2, i2 = knn_graph_ring(X, 15, mesh)
    v2, j2 = distributed_symmetrize_sparse(
        np.exp(-d2), i2, mesh, mode="sum_minus_prod"
    )

    D1 = np.asarray(sparse_to_dense(v1, j1, 512))
    D2 = np.asarray(sparse_to_dense(v2, j2, 512))
    print(f"devices: {n_dev}; fuzzy-union max |single - mesh| = "
          f"{np.abs(D1 - D2).max():.2e}")


if __name__ == "__main__":
    main()
