"""UMAP / TSNE over image-encoder features — CIFAR-10 scale
(reference: examples/images/cifar10.py, cifar100.py, panorama_readme.py).

The reference embeds CIFAR images with a pretrained DINOv2 encoder
(facebook/dinov2-base), then runs TorchDR estimators on the 768-d
features. This environment has no network egress, so the script is
gated: when the HuggingFace dataset + model are available in a local
cache it reproduces the reference pipeline; otherwise it synthesizes
DINO-like features (60k x 768, 10 classes on a low-dimensional
manifold) so the DR stage — the part this framework owns — runs either
way, at the real CIFAR-10 geometry.

Run: python examples/images/cifar10.py [--n 20000]
"""

import argparse
import time

import numpy as np

import torchdr_tpu as tdr


def real_features():
    """Reference pipeline: DINOv2 features for CIFAR-10 (needs local caches)."""
    import torch
    from datasets import load_dataset
    from transformers import AutoImageProcessor, Dinov2Model

    dataset = load_dataset("cifar10")
    images = dataset["train"]["img"] + dataset["test"]["img"]
    processor = AutoImageProcessor.from_pretrained("facebook/dinov2-base")
    model = Dinov2Model.from_pretrained("facebook/dinov2-base").eval()
    labels = np.asarray(dataset["train"]["label"] + dataset["test"]["label"])

    feats = []
    with torch.no_grad():
        for i in range(0, len(images), 256):
            inputs = processor(images[i : i + 256], return_tensors="pt")
            feats.append(model(**inputs).last_hidden_state.mean(dim=1).numpy())
    return np.concatenate(feats).astype(np.float32), labels


def synthetic_features(n, rng):
    """DINO-like features: 10 classes, 16-d latent manifold, 768-d ambient."""
    n_classes, latent_d, ambient_d = 10, 16, 768
    labels = rng.integers(0, n_classes, size=n)
    centers = rng.normal(size=(n_classes, latent_d)) * 4.0
    latent = centers[labels] + rng.normal(size=(n, latent_d))
    lift = rng.normal(size=(latent_d, ambient_d)) / np.sqrt(latent_d)
    X = latent @ lift + 0.05 * rng.normal(size=(n, ambient_d))
    return X.astype(np.float32), labels


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--n", type=int, default=20_000)
    args = parser.parse_args()

    try:
        X, y = real_features()
        print(f"CIFAR-10 DINOv2 features: {X.shape}")
    except Exception as exc:
        print(f"(real pipeline unavailable: {type(exc).__name__}; using synthetic features)")
        X, y = synthetic_features(args.n, np.random.default_rng(0))

    for name, model in {
        "UMAP": tdr.UMAP(n_neighbors=30, max_iter=500, random_state=0, verbose=True),
        "TSNE": tdr.TSNE(perplexity=30, max_iter=500, random_state=0, verbose=True),
    }.items():
        t0 = time.perf_counter()
        Z = np.asarray(model.fit_transform(X))
        dt = time.perf_counter() - t0
        sil = tdr.silhouette_score(Z, y)
        print(f"{name}: {X.shape[0]} pts in {dt:.1f}s, class silhouette {sil:.3f}")

        try:
            import matplotlib

            matplotlib.use("Agg")
            import matplotlib.pyplot as plt

            plt.figure(figsize=(6, 6))
            plt.scatter(*Z.T, c=y, s=1, cmap="tab10")
            plt.title(f"{name} on CIFAR-10-scale features")
            out = f"/tmp/cifar10_{name.lower()}.png"
            plt.savefig(out, dpi=120)
            plt.close()
            print(f"saved {out}")
        except Exception:
            pass


if __name__ == "__main__":
    main()
