"""Distributed kNN label accuracy, per-chunk over the mesh
(reference: examples/distributed/knn_accuracy_benchmark.py).

Run: XLA_FLAGS=--xla_force_host_platform_device_count=8 \
     python examples/distributed/knn_accuracy_benchmark.py
"""

import os

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")

import time

import jax

if jax.default_backend() not in ("tpu",):
    jax.config.update("jax_platforms", "cpu")

import numpy as np

import torchdr_tpu as tdr
from torchdr_tpu.parallel import make_mesh


def main():
    mesh = make_mesh(len(jax.devices()))
    rng = np.random.default_rng(0)
    centers = rng.normal(scale=8.0, size=(10, 32))
    y = rng.integers(0, 10, 20_000)
    X = (centers[y] + rng.normal(size=(20_000, 32))).astype(np.float32)

    Z = tdr.UMAP(n_neighbors=15, max_iter=200, random_state=0,
                 distributed=True, mesh=mesh).fit_transform(X)

    t0 = time.perf_counter()
    acc_single = tdr.knn_label_accuracy(np.asarray(Z), y, k=10)
    t1 = time.perf_counter()
    acc_mesh = tdr.knn_label_accuracy(np.asarray(Z), y, k=10, mesh=mesh)
    t2 = time.perf_counter()
    print(f"knn label accuracy: single {acc_single:.4f} ({t1 - t0:.2f}s) | "
          f"mesh {acc_mesh:.4f} ({t2 - t1:.2f}s) on {mesh.devices.size} devices")


if __name__ == "__main__":
    main()
