"""Single-cell-scale UMAP benchmark (analog of the reference's
benchmarks/benchmark_umap_single_cell.py: 50-PCA dims, 500 iterations).
Uses synthetic clustered data at the Zheng-1.3M scale (configurable) since
the environment has no network access for the real datasets.
"""

import argparse
import time

import numpy as np


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--n", type=int, default=200_000)
    parser.add_argument("--pca-dims", type=int, default=50)
    parser.add_argument("--iters", type=int, default=500)
    parser.add_argument("--distributed", action="store_true")
    args = parser.parse_args()

    import torchdr_tpu as tdr

    rng = np.random.default_rng(0)
    centers = rng.normal(scale=5.0, size=(40, args.pca_dims)).astype(np.float32)
    lab = rng.integers(0, 40, args.n)
    X = centers[lab] + rng.normal(size=(args.n, args.pca_dims)).astype(np.float32)

    model = tdr.UMAP(
        n_neighbors=30, max_iter=args.iters, random_state=0,
        distributed=args.distributed,
    )
    t0 = time.perf_counter()
    Z = model.fit_transform(X)
    dt = time.perf_counter() - t0
    sil = tdr.silhouette_score(np.asarray(Z)[:: max(1, args.n // 5000)], lab[:: max(1, args.n // 5000)])
    print(f"UMAP n={args.n} d={args.pca_dims} iters={args.iters}: {dt:.1f}s silhouette={sil:.3f}")


if __name__ == "__main__":
    main()
