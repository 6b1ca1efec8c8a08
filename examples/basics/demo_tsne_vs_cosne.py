"""Euclidean TSNE vs hyperbolic COSNE on hierarchical data
(reference: examples/basics/demo_tsne_vs_cosne.py).

Run: python examples/basics/demo_tsne_vs_cosne.py
"""

import numpy as np

import torchdr_tpu as tdr


def hierarchical_blobs(n=400, seed=0):
    """Two-level cluster hierarchy — the regime hyperbolic space embeds
    with less distortion than the plane."""
    rng = np.random.default_rng(seed)
    tops = rng.normal(scale=20.0, size=(4, 16))
    X, y = [], []
    for t_idx, top in enumerate(tops):
        subs = top + rng.normal(scale=4.0, size=(3, 16))
        for sub in subs:
            X.append(sub + rng.normal(scale=0.5, size=(n // 12, 16)))
            y.append(np.full(n // 12, t_idx))
    return np.concatenate(X).astype(np.float32), np.concatenate(y)


def main():
    X, y = hierarchical_blobs()
    Zt = tdr.TSNE(perplexity=20, max_iter=500, random_state=0).fit_transform(X)
    Zc = tdr.COSNE(
        perplexity=20, max_iter=500, lr=1e-1, gamma=2.0, random_state=0
    ).fit_transform(X)
    print(f"TSNE  silhouette: {tdr.silhouette_score(np.asarray(Zt), y):.3f}")
    print(f"COSNE silhouette: {tdr.silhouette_score(np.asarray(Zc), y):.3f} "
          f"(Poincaré disk: max |z| = {np.abs(np.asarray(Zc)).max():.3f} < 1)")

    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        from torchdr_tpu.utils.visu import plot_poincare_disk

        plot_poincare_disk(np.asarray(Zc), y)
        plt.savefig("/tmp/cosne_disk.png", dpi=120)
        print("saved /tmp/cosne_disk.png")
    except Exception:
        pass


if __name__ == "__main__":
    main()
