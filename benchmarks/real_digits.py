"""Real-data quality record: sklearn digits (1797×64 handwritten images).

BASELINE.md's north-star datasets (MNIST-784, 1.3M single-cell) are not
reachable in this image (no network egress; no cached copies found — see
BASELINE.md "real-data availability"). The digits set bundled with
scikit-learn is the one REAL image dataset available offline; this script
records embedding quality for every neighbor-embedding estimator against
(a) the raw-input kNN baseline and (b) sklearn's own t-SNE on the same
data, so the quality claims rest on at least one non-synthetic dataset.

Reference analog: quality-gate silhouette tests
(torchdr/tests/test_neighbor_embedding.py:42-95) and the single-cell
benchmark methodology (benchmarks/benchmark_umap_single_cell.py:82-120).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import torchdr_tpu as tdr


def log(**kw):
    print("JSON " + json.dumps(kw), flush=True)


def trustworthiness(X, Z, K=15):
    from sklearn.manifold import trustworthiness as tw

    return float(tw(X, Z, n_neighbors=K))


def main():
    from sklearn.datasets import load_digits

    X, y = load_digits(return_X_y=True)
    X = X.astype(np.float32)
    n = X.shape[0]
    log(step="dataset", name="sklearn_digits", n=n, d=X.shape[1],
        classes=int(y.max() + 1))

    models = {
        "UMAP": tdr.UMAP(n_neighbors=15, max_iter=500, random_state=0),
        "TSNE": tdr.TSNE(perplexity=30, max_iter=500, random_state=0),
        "LargeVis": tdr.LargeVis(n_neighbors=15, max_iter=500, random_state=0),
        "InfoTSNE": tdr.InfoTSNE(perplexity=30, max_iter=500, random_state=0),
        "PACMAP": tdr.PACMAP(n_neighbors=10, max_iter=450, random_state=0),
        "SNE": tdr.SNE(perplexity=30, max_iter=500, random_state=0),
    }
    for name, m in models.items():
        t0 = time.perf_counter()
        Z = np.asarray(m.fit_transform(X))
        cold = time.perf_counter() - t0
        t0 = time.perf_counter()
        Z = np.asarray(m.fit_transform(X))
        warm = time.perf_counter() - t0
        log(step="fit", model=name, cold_s=round(cold, 2),
            warm_s=round(warm, 2),
            silhouette=round(float(tdr.silhouette_score(Z, y)), 4),
            trustworthiness15=round(trustworthiness(X, Z), 4),
            knn_acc10=round(float(tdr.knn_label_accuracy(Z, y, k=10)), 4),
            preservation15=round(
                float(tdr.neighborhood_preservation(X, Z, K=15)), 4))

    # sklearn t-SNE on the same data: the external quality yardstick
    from sklearn.manifold import TSNE as SkTSNE

    t0 = time.perf_counter()
    Zs = SkTSNE(perplexity=30, random_state=0, init="pca").fit_transform(X)
    sk_s = time.perf_counter() - t0
    log(step="fit", model="sklearn_TSNE_cpu", cold_s=round(sk_s, 2),
        silhouette=round(float(tdr.silhouette_score(Zs, y)), 4),
        trustworthiness15=round(trustworthiness(X, Zs), 4),
        knn_acc10=round(float(tdr.knn_label_accuracy(Zs, y, k=10)), 4),
        preservation15=round(
            float(tdr.neighborhood_preservation(X, Zs, K=15)), 4))


if __name__ == "__main__":
    main()
