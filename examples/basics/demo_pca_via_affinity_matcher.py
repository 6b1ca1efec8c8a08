"""PCA via SVD and via AffinityMatcher
(reference: examples/basics/demo_pca_via_affinity_matcher.py).

A custom scalar-product Affinity plugged into AffinityMatcher with the
square loss recovers the PCA subspace — the same demonstration as the
reference, exercising the user-extension API (subclass Affinity, override
``_compute_affinity``) end to end through the compiled fit loop.

Run: python examples/basics/demo_pca_via_affinity_matcher.py
"""

import numpy as np

import torchdr_tpu as tdr
from torchdr_tpu.affinity import Affinity


class ScalarProductAffinity(Affinity):
    """Scalar-product affinity X @ X.T (reference demo's custom class)."""

    def __init__(self, device="auto", verbose=False):
        super().__init__(device=device, verbose=verbose, zero_diag=False)

    def _compute_affinity(self, X, **kwargs):
        return X @ X.T


def subspace_alignment(A, B):
    """Mean principal-angle cosine between the column spaces of A and B."""
    Qa, _ = np.linalg.qr(A)
    Qb, _ = np.linalg.qr(B)
    s = np.linalg.svd(Qa.T @ Qb, compute_uv=False)
    return float(s.mean())


def main():
    try:
        from sklearn.datasets import load_digits

        X = load_digits().data.astype(np.float32)
    except Exception:
        rng = np.random.default_rng(0)
        X = rng.normal(size=(500, 64)).astype(np.float32)
    X = X - X.mean(axis=0)

    # Closed-form PCA.
    Z_pca = np.asarray(tdr.PCA(n_components=2, random_state=0).fit_transform(X))

    # Same solution through the generic affinity-matching engine.
    model = tdr.AffinityMatcher(
        affinity_in=ScalarProductAffinity(),
        affinity_out=ScalarProductAffinity(),
        loss_fn="square_loss",
        init="normal",
        lr=1e1,
        max_iter=500,
        random_state=0,
        verbose=True,
    )
    Z_am = np.asarray(model.fit_transform(X))

    align = subspace_alignment(Z_pca, Z_am)
    print(f"PCA vs AffinityMatcher subspace alignment: {align:.4f} (1.0 = identical)")


if __name__ == "__main__":
    main()
