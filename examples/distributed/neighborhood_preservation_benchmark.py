"""Distributed neighborhood preservation: UMAP vs LargeVis over the mesh
(reference: examples/distributed/neighborhood_preservation_benchmark.py,
benchmarks/umap_vs_largevis_distributed.py).

Run: XLA_FLAGS=--xla_force_host_platform_device_count=8 \
     python examples/distributed/neighborhood_preservation_benchmark.py
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
    centers = rng.normal(scale=6.0, size=(12, 32))
    y = rng.integers(0, 12, 10_000)
    X = (centers[y] + rng.normal(size=(10_000, 32))).astype(np.float32)

    for name, model in {
        "UMAP": tdr.UMAP(n_neighbors=15, max_iter=300, random_state=0,
                         distributed=True, mesh=mesh),
        "LargeVis": tdr.LargeVis(perplexity=15, max_iter=300, random_state=0,
                                 distributed=True, mesh=mesh),
    }.items():
        t0 = time.perf_counter()
        Z = np.asarray(model.fit_transform(X))
        dt = time.perf_counter() - t0
        pres = tdr.neighborhood_preservation(X, Z, K=15, mesh=mesh)
        print(f"{name:9s} fit {dt:6.1f}s  preservation@15 = {pres:.4f}")


if __name__ == "__main__":
    main()
