"""Entropic affinity adapts its bandwidth to local density
(reference: examples/affinities/demo_ea_adaptivity.py).

Run: python examples/affinities/demo_ea_adaptivity.py
"""

import numpy as np


from torchdr_tpu.affinity import EntropicAffinity, NormalizedGaussianAffinity


def main():
    rng = np.random.default_rng(0)
    # two clusters with a 10x density contrast
    dense = rng.normal(scale=0.1, size=(150, 2))
    sparse = np.array([4.0, 0.0]) + rng.normal(scale=1.0, size=(150, 2))
    X = np.concatenate([dense, sparse]).astype(np.float32)

    def row_perplexity(P):
        # row-normalize, then perplexity = exp(shannon entropy)
        P = P / P.sum(axis=1, keepdims=True)
        H = -np.sum(np.where(P > 0, P * np.log(np.maximum(P, 1e-30)), 0.0), axis=1)
        return np.exp(H)

    ea = EntropicAffinity(perplexity=30, sparsity=False)
    P, _ = ea(X)
    pp = row_perplexity(np.asarray(P))
    print(f"EntropicAffinity row perplexities: dense cluster "
          f"{pp[:150].mean():.1f}, sparse cluster {pp[150:].mean():.1f} "
          f"(target 30 everywhere)")
    print(f"calibrated eps range: {float(ea.eps_.min()):.4f} .. "
          f"{float(ea.eps_.max()):.4f} (adapts ~1000x across densities)")

    # fixed-bandwidth Gaussian: effective neighborhood varies with density
    ga = NormalizedGaussianAffinity(sigma=1.0, normalization_dim=1)
    ppg = row_perplexity(np.asarray(ga(X)))
    print(f"fixed-sigma Gaussian row perplexities: dense {ppg[:150].mean():.1f}, "
          f"sparse {ppg[150:].mean():.1f} (no adaptivity)")


if __name__ == "__main__":
    main()
