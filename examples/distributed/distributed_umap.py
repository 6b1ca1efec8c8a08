"""SPMD UMAP over all local TPU chips (or a virtual CPU mesh).

Run without hardware:
  XLA_FLAGS=--xla_force_host_platform_device_count=8 python examples/distributed_umap.py --cpu
"""

import argparse
import sys

import numpy as np


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--cpu", action="store_true", help="force a virtual CPU mesh")
    parser.add_argument("--n", type=int, default=4096)
    args = parser.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import torchdr_tpu as tdr
    from torchdr_tpu.parallel import make_mesh

    mesh = make_mesh()
    print(f"mesh: {mesh}")

    rng = np.random.default_rng(0)
    centers = rng.normal(scale=8.0, size=(8, 32))
    lab = rng.integers(0, 8, args.n)
    X = (centers[lab] + rng.normal(size=(args.n, 32))).astype(np.float32)

    model = tdr.UMAP(n_neighbors=15, max_iter=200, random_state=0, distributed=True, mesh=mesh)
    Z = model.fit_transform(X)
    print(f"silhouette: {tdr.silhouette_score(Z, lab):.3f}")


if __name__ == "__main__":
    sys.exit(main())
