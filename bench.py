"""Benchmark driver: prints ONE JSON line for the round record.

Headline metric: end-to-end UMAP fit (n_neighbors=30, 500 iters, PCA init)
on MNIST-scale synthetic clustered data (d=784) on one TPU chip — the
BASELINE.json north-star config "UMAP n_neighbors=30 on full MNIST-784".

Robustness: the fit runs in a subprocess (the remote TPU worker has been
observed to crash on the largest configs); on failure the driver falls
back to the next size down so the round always records a number. A
persistent compile cache (.jax_cache) keeps repeat runs warm.

``vs_baseline``: the reference publishes no wall-clock for this config
(README.md:103-108 is a figure), so we anchor on the only hard number in
the reference repo — B200 Faiss-Flat kNN throughput (10.19 s for 1M×128,
benchmarks/faiss/BENCHMARK_RESULTS.md:3-12), flop-scaled to this
workload's kNN. vs_baseline = projected_reference_seconds / our_total_fit
seconds (>1 ⇒ our WHOLE fit beats the projected B200 graph build alone).
"""

import json
import os
import subprocess
import sys
import time

SIZES = [60_000, 30_000, 15_000]
D, K, ITERS = 784, 30, 500


def _run_fit(n: int) -> dict:
    """Child process: one UMAP fit; prints a JSON dict on success."""
    import jax

    cache = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    except Exception:
        pass

    import numpy as np

    import torchdr_tpu as tdr
    from torchdr_tpu.eval.knn_metrics import knn_recall
    from torchdr_tpu.ops.distance import knn_graph

    rng = np.random.default_rng(0)
    centers = rng.normal(scale=6.0, size=(100, D)).astype(np.float32)
    lab = rng.integers(0, 100, n)
    X = centers[lab] + rng.normal(size=(n, D)).astype(np.float32)
    import jax.numpy as jnp

    X_jax = jnp.asarray(X)

    # First fit pays the (remote, uncacheable) compiles; the second hits the
    # in-process jit cache and is the steady-state number.
    cold0 = time.perf_counter()
    tdr.UMAP(n_neighbors=K, max_iter=ITERS, random_state=0, init="pca").fit_transform(
        X_jax
    )
    cold_s = time.perf_counter() - cold0

    model = tdr.UMAP(n_neighbors=K, max_iter=ITERS, random_state=1, init="pca")
    t0 = time.perf_counter()
    Z = np.asarray(model.fit_transform(X_jax))
    fit_s = time.perf_counter() - t0

    # kNN-graph recall@K of the graph tier actually used (exact → 1.0 by
    # construction; measured against brute-force over the FULL database on a
    # query subsample).
    sub = min(2000, n)
    _, i_true = knn_graph(
        X_jax[:sub], X_jax, k=K + 1, precision="highest", exclude_diag=False
    )
    i_true = np.asarray(i_true)
    i_true = np.stack(
        [row[row != r][:K] for r, row in zip(range(sub), i_true)]
    )  # strip self
    _, i_used = knn_graph(X_jax, k=K, precision="highest", block_size=2048)
    recall = knn_recall(np.asarray(i_used)[:sub], i_true)
    step = max(1, n // 3000)
    sil = tdr.silhouette_score(Z[::step], lab[::step])
    return {"n": n, "fit_s": fit_s, "cold_s": cold_s, "recall": recall, "sil": sil}


def main():
    if len(sys.argv) > 1 and sys.argv[1] == "--fit":
        result = _run_fit(int(sys.argv[2]))
        print("RESULT " + json.dumps(result))
        return

    result = None
    for n in SIZES:
        try:
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--fit", str(n)],
                capture_output=True, text=True, timeout=2400,
            )
            for line in proc.stdout.splitlines():
                if line.startswith("RESULT "):
                    result = json.loads(line[len("RESULT "):])
                    break
            if result is not None:
                break
            print(f"[bench] n={n} failed:\n{proc.stderr[-2000:]}", file=sys.stderr)
        except subprocess.TimeoutExpired:
            print(f"[bench] n={n} timed out", file=sys.stderr)
    if result is None:
        print(json.dumps({
            "metric": f"umap_{SIZES[0]}x{D}_k{K}_fit_seconds",
            "value": -1.0, "unit": "s", "vs_baseline": 0.0,
        }))
        return

    n, fit_s = result["n"], result["fit_s"]
    ref_pairs_per_s = (1_000_000.0**2) / 10.19  # B200 Faiss Flat, d=128
    projected_ref_s = (float(n) ** 2) * (D / 128.0) / ref_pairs_per_s
    vs_baseline = projected_ref_s / fit_s

    print(
        f"[bench] n={n} fit={fit_s:.2f}s (cold {result.get('cold_s', -1):.1f}s) "
        f"recall@{K}={result['recall']:.4f} "
        f"silhouette={result['sil']:.3f} projected_B200_knn={projected_ref_s:.2f}s",
        file=sys.stderr,
    )
    print(json.dumps({
        "metric": f"umap_{n}x{D}_k{K}_fit_seconds",
        "value": round(fit_s, 3),
        "unit": "s",
        "vs_baseline": round(vs_baseline, 4),
    }))


if __name__ == "__main__":
    main()
