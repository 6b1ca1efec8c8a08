"""TSNE on the swiss roll (reference: examples/basics/demo_tsne_swiss_roll.py).

Run: python examples/basics/demo_tsne_swiss_roll.py
"""

import numpy as np
from sklearn.datasets import make_swiss_roll

import torchdr_tpu as tdr


def main():
    X, t = make_swiss_roll(n_samples=1000, noise=0.05, random_state=0)
    X = X.astype(np.float32)

    Z = tdr.TSNE(perplexity=30, max_iter=800, random_state=0).fit_transform(X)
    pres = tdr.neighborhood_preservation(X, np.asarray(Z), K=15)
    print(f"TSNE swiss-roll: embedding {np.asarray(Z).shape}, "
          f"neighborhood preservation@15 = {pres:.3f}")

    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        plt.scatter(*np.asarray(Z).T, c=t, s=3, cmap="viridis")
        plt.title("TSNE on swiss roll")
        plt.savefig("/tmp/tsne_swiss_roll.png", dpi=120)
        print("saved /tmp/tsne_swiss_roll.png")
    except Exception:
        pass


if __name__ == "__main__":
    main()
