"""kNN graph benchmark following the reference's Faiss methodology
(reference: benchmarks/faiss/run_benchmark.py — clustered/random data,
k=15, recall vs exact; B200 numbers in BENCHMARK_RESULTS.md).

Tiers benchmarked:
  exact/f32   — Flat-equivalent, 100% recall
  exact/bf16  — fast MXU path (recall reported)
  approx      — lax.approx_min_k (TPU PartialReduce), tunable recall
"""

import argparse
import time

import numpy as np


def make_data(n, d, kind, seed=0):
    rng = np.random.default_rng(seed)
    if kind == "clustered":
        centers = rng.normal(scale=10.0, size=(1000, d)).astype(np.float32)
        return centers[rng.integers(0, 1000, n)] + rng.normal(size=(n, d)).astype(np.float32)
    return rng.uniform(size=(n, d)).astype(np.float32)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--n", type=int, default=100_000)
    parser.add_argument("--d", type=int, default=128)
    parser.add_argument("--k", type=int, default=15)
    parser.add_argument("--kind", choices=["clustered", "random"], default="clustered")
    args = parser.parse_args()

    import jax.numpy as jnp

    from torchdr_tpu.eval.knn_metrics import knn_recall
    from torchdr_tpu.ops.distance import knn_graph

    X = jnp.asarray(make_data(args.n, args.d, args.kind))
    n_sample = min(2000, args.n)

    results = {}
    reference_idx = None
    for label, kwargs in [
        ("exact/f32", dict(mode="exact", precision="highest")),
        ("exact/bf16", dict(mode="exact", precision="default")),
        ("approx@0.95", dict(mode="approx", recall_target=0.95)),
    ]:
        d, i = knn_graph(X, k=args.k, block_size=2048, **kwargs)
        float(jnp.sum(d))  # compile + run
        t0 = time.perf_counter()
        d, i = knn_graph(X, k=args.k, block_size=2048, **kwargs)
        float(jnp.sum(d))
        dt = time.perf_counter() - t0
        if reference_idx is None:
            reference_idx = i
            rec = 1.0
        else:
            rec = knn_recall(i[:n_sample], reference_idx[:n_sample])
        results[label] = (dt, rec)
        print(f"{label:>14}: {dt:7.3f}s  recall@{args.k}={rec:.4f}")


if __name__ == "__main__":
    main()
