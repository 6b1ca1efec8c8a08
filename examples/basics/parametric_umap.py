"""Parametric UMAP: train an encoder, embed unseen data."""

import numpy as np

import torchdr_tpu as tdr
from torchdr_tpu.utils.encoders import make_mlp_encoder


def main():
    rng = np.random.default_rng(0)
    centers = rng.normal(scale=6.0, size=(5, 20))
    lab = rng.integers(0, 5, 1000)
    X = (centers[lab] + rng.normal(size=(1000, 20))).astype(np.float32)

    encoder = make_mlp_encoder(2, hidden=(64, 32))
    model = tdr.UMAP(
        n_neighbors=15, max_iter=300, optimizer="Adam", lr=1e-3,
        encoder=encoder, random_state=0,
    )
    Z_train = model.fit_transform(X[:800])
    Z_new = model.transform(X[800:])  # out-of-sample extension
    print("train:", np.asarray(Z_train).shape, "new:", np.asarray(Z_new).shape)
    print("silhouette (new data):", tdr.silhouette_score(Z_new, lab[800:]))


if __name__ == "__main__":
    main()
