"""Basic usage: UMAP / TSNE on a toy dataset with quality metrics."""

import numpy as np
from sklearn.datasets import make_moons

import torchdr_tpu as tdr


def main():
    X, y = make_moons(n_samples=500, noise=0.05, random_state=0)
    X = X.astype(np.float32)

    for name, model in [
        ("UMAP", tdr.UMAP(n_neighbors=15, random_state=0)),
        ("TSNE", tdr.TSNE(perplexity=30, random_state=0)),
        ("LargeVis", tdr.LargeVis(perplexity=30, random_state=0)),
        ("PCA", tdr.PCA()),
    ]:
        Z = model.fit_transform(X)
        print(
            f"{name}: silhouette={tdr.silhouette_score(Z, y):.3f} "
            f"knn-acc={tdr.knn_label_accuracy(Z, y, k=10):.3f} "
            f"preservation={tdr.neighborhood_preservation(X, Z, K=15):.3f}"
        )


if __name__ == "__main__":
    main()
