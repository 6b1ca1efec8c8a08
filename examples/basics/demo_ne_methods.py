"""Compare neighbor-embedding methods on one dataset
(reference: examples/basics/demo_ne_methods_affinity_matcher.py).

Run: python examples/basics/demo_ne_methods.py
"""

import time

import numpy as np
from sklearn.datasets import make_moons

import torchdr_tpu as tdr


def main():
    X, y = make_moons(n_samples=500, noise=0.05, random_state=0)
    X = X.astype(np.float32)

    methods = {
        "TSNE": tdr.TSNE(perplexity=30, max_iter=500, random_state=0),
        "SNE": tdr.SNE(perplexity=30, max_iter=500, random_state=0),
        "UMAP": tdr.UMAP(n_neighbors=30, max_iter=500, random_state=0),
        "LargeVis": tdr.LargeVis(perplexity=30, max_iter=500, random_state=0),
        "InfoTSNE": tdr.InfoTSNE(perplexity=30, max_iter=500, random_state=0),
        "PACMAP": tdr.PACMAP(n_neighbors=10, max_iter=450, random_state=0),
    }
    for name, model in methods.items():
        t0 = time.perf_counter()
        Z = model.fit_transform(X)
        sil = tdr.silhouette_score(np.asarray(Z), y)
        print(f"{name:9s}  {time.perf_counter() - t0:6.1f}s  silhouette={sil:.3f}")


if __name__ == "__main__":
    main()
