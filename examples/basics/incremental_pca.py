"""Streaming PCA over batches (reference: examples/basics/incremental_pca.py).

Run: python examples/basics/incremental_pca.py
"""

import numpy as np

import torchdr_tpu as tdr


def batch_stream(n_batches=20, batch=512, d=64, seed=0):
    rng = np.random.default_rng(seed)
    basis = rng.normal(size=(8, d)) * np.linspace(10, 1, 8)[:, None]
    for _ in range(n_batches):
        coeff = rng.normal(size=(batch, 8))
        yield (coeff @ basis + rng.normal(size=(batch, d)) * 0.1).astype(np.float32)


def main():
    # one-pass approximate (Ross et al. incremental SVD)
    ipca = tdr.IncrementalPCA(n_components=4)
    Z = ipca.fit_transform(batch_stream())
    print(f"IncrementalPCA: {np.asarray(Z).shape}, "
          f"explained variance ratio = {np.round(ipca.explained_variance_ratio_, 3)}")

    # two-pass exact (covariance accumulation)
    epca = tdr.ExactIncrementalPCA(n_components=4, batch_size=512)
    Z2 = epca.fit_transform(list(batch_stream()))
    print(f"ExactIncrementalPCA: {np.asarray(Z2).shape}, "
          f"explained variance = {np.round(np.asarray(epca.explained_variance_), 2)}")


if __name__ == "__main__":
    main()
