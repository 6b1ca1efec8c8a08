"""Budget shape-cliff autopsy: diff the optimized HLO of a fast (70) and
a slow (76) budget at the 2M replay geometry (see _ivf2m_cliff.py).

Captures the exact _ivf_search invocation via a spy, lowers/compiles it
per budget, and reports op histograms + cost analysis so the divergent
compiler decision is visible without a trace viewer.
"""

import collections
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import jax.numpy as jnp
import numpy as np

import torchdr_tpu.ops.ivf as ivf_mod

N, D, K = 2_000_000, 128, 15


def main():
    rng = np.random.default_rng(0)
    centers = rng.normal(scale=10.0, size=(2000, D)).astype(np.float32)
    X = jnp.asarray(
        centers[rng.integers(0, 2000, N)] + rng.normal(size=(N, D)).astype(np.float32)
    )
    index = ivf_mod.ivf_build(
        X, n_clusters=3277, chunk=128, kmeans_iters=15, split_bytes=0
    )
    del X

    orig = ivf_mod._ivf_search
    texts = {}
    for budget in (70, 76):
        captured = {}

        def spy(*a, **k):
            captured.setdefault("ak", (a, k))
            return orig(*a, **k)

        ivf_mod._ivf_search = spy
        ivf_mod.ivf_knn(
            None, k=K, nprobe=12, m=16, index=index, rerank=False,
            budget=budget, scan_precision="high",
        )
        ivf_mod._ivf_search = orig
        a, kw = captured["ak"]
        comp = orig.lower(*a, **kw).compile()
        txt = comp.as_text()
        texts[budget] = txt
        hist = collections.Counter(
            m.group(1)
            for m in re.finditer(r"^\s*(?:ROOT )?[%\w.\-]+ = \S+ (\w+)\(", txt, re.M)
        )
        cost = comp.cost_analysis()
        cost = cost[0] if isinstance(cost, (list, tuple)) else cost
        mem = comp.memory_analysis()
        print(f"=== budget {budget} ===", flush=True)
        print("flops:", cost.get("flops"), "bytes accessed:",
              cost.get("bytes accessed"), flush=True)
        if mem is not None:
            print("temp bytes:", getattr(mem, "temp_size_in_bytes", None),
                  "output bytes:", getattr(mem, "output_size_in_bytes", None),
                  flush=True)
        for op, c in sorted(hist.items(), key=lambda t: -t[1])[:25]:
            print(f"  {op}: {c}", flush=True)
        with open(f"/tmp/hlo_budget{budget}.txt", "w") as f:
            f.write(txt)

    # fusion-kind histogram diff
    for budget, txt in texts.items():
        kinds = collections.Counter(
            m.group(1) for m in re.finditer(r"kind=(\w+)", txt)
        )
        loops = collections.Counter(
            m.group(1) for m in re.finditer(r"fusion\(.*?\), kind=(\w+)", txt)
        )
        print(f"budget {budget}: fusion kinds {dict(kinds)}", flush=True)


if __name__ == "__main__":
    main()
