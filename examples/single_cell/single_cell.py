"""TSNE / LargeVis on single-cell RNA-seq data
(reference: examples/single_cell/single_cell_readme.py, census.py).

The reference downloads the Macosko-2015 retina and 10x-mouse-Zheng
datasets (PCA-50 features) and embeds them with TSNE and LargeVis. This
environment has no network egress, so the script is gated: it uses the
real datasets when a local copy exists (same pickle format as the
opentsne benchmark files), otherwise it synthesizes single-cell-like
PCA-50 features — many imbalanced cell-type clusters with
branch-structured (trajectory) geometry — at the Macosko size.

Run: python examples/single_cell/single_cell.py [--n 44808]
"""

import argparse
import gzip
import os
import pickle
import time

import numpy as np

import torchdr_tpu as tdr

LOCAL_CANDIDATES = [
    "/root/data/macosko_2015.pkl.gz",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), "macosko_2015.pkl.gz"),
]


def real_dataset():
    for path in LOCAL_CANDIDATES:
        if os.path.exists(path):
            with gzip.open(path, "rb") as f:
                data = pickle.load(f)
            X = data["pca_50"].astype(np.float32)
            cell_types = np.asarray(data["CellType1"]).astype(str)
            _, y = np.unique(cell_types, return_inverse=True)
            return X, y
    raise FileNotFoundError("no local single-cell dataset")


def synthetic_dataset(n, rng):
    """Single-cell-like PCA-50: imbalanced cell types + branch trajectories."""
    n_types = 12
    # Imbalanced cluster sizes (rod cells dominate Macosko retina data).
    weights = rng.dirichlet(np.ones(n_types) * 0.5)
    labels = rng.choice(n_types, size=n, p=weights)
    centers = rng.normal(size=(n_types, 50)) * 6.0
    X = centers[labels] + rng.normal(size=(n, 50))
    # Branch structure: half the types get a 1-d trajectory direction.
    for t in range(0, n_types, 2):
        mask = labels == t
        direction = rng.normal(size=50)
        direction /= np.linalg.norm(direction)
        X[mask] += np.outer(rng.uniform(0, 8, size=mask.sum()), direction)
    return X.astype(np.float32), labels


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--n", type=int, default=44_808)  # Macosko-2015 size
    args = parser.parse_args()

    try:
        X, y = real_dataset()
        print(f"Macosko-2015: {X.shape}")
    except Exception:
        print("(local dataset not found; using synthetic single-cell features)")
        X, y = synthetic_dataset(args.n, np.random.default_rng(0))

    models = {
        "TSNE": tdr.TSNE(perplexity=30, max_iter=500, random_state=0, verbose=True),
        "LargeVis": tdr.LargeVis(
            perplexity=30, max_iter=1000, n_negatives=50, lr=1e0,
            random_state=0, verbose=True,
        ),
    }
    for name, model in models.items():
        t0 = time.perf_counter()
        Z = np.asarray(model.fit_transform(X))
        dt = time.perf_counter() - t0
        sil = tdr.silhouette_score(Z, y)
        print(f"{name}: {X.shape[0]} cells in {dt:.1f}s, cell-type silhouette {sil:.3f}")

        try:
            import matplotlib

            matplotlib.use("Agg")
            import matplotlib.pyplot as plt

            plt.figure(figsize=(6, 6))
            plt.scatter(*Z.T, c=y, s=1, cmap="tab20")
            plt.title(f"{name} on single-cell PCA-50")
            out = f"/tmp/single_cell_{name.lower()}.png"
            plt.savefig(out, dpi=120)
            plt.close()
            print(f"saved {out}")
        except Exception:
            pass


if __name__ == "__main__":
    main()
