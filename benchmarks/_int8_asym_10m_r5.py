"""Driver `py` script: int8 symmetric vs asymmetric scoring at 10M.

Run inside `_ivf10m_driver2.py` (state/recall/log/ivf_mod in scope).
Sequence: reconstruct f32 rows from the resident split index, rebuild
int8 (keeping X resident), then A/B `scoring="symmetric"` (X=None path
semantics) vs `scoring="asymmetric"` (exact f32 queries) at the headline
budget. VERDICT r4 #7: the ceiling A/B showed +0.3-0.4% recall free
because the scan is selection-bound.
"""

import gc
import time

import numpy as np

idx0 = state["index"]
if idx0.scales is None:
    # rebuild to int8, keeping the exact rows for the asymmetric side
    state["index"] = None
    src_full = reconstruct_rows(idx0)
    n_old = idx0.n
    del idx0
    gc.collect()
    X_exact = src_full[:n_old]
    X_exact.block_until_ready()
    del src_full
    gc.collect()
    t0 = time.perf_counter()
    state["index"] = ivf_mod.ivf_build(
        X_exact, n_clusters=16384, chunk=128, kmeans_iters=15,
        n_superlist=256, storage="int8", verbose=True,
    )
    gc.collect()
    log(step="build_int8", build_s=round(time.perf_counter() - t0, 1),
        int8=state["index"].scales is not None,
        max_cell=int(np.max(np.asarray(state["index"].counts))))
    globals()["X_exact_holder"] = [X_exact]
    del X_exact
else:
    log(step="int8_already", note="index already int8; X_exact must be in scope")

Xe = globals()["X_exact_holder"][0]
for scoring, xarg in (("symmetric", None), ("asymmetric", Xe)):
    for budget in (128,):
        try:
            kw = dict(k=K, index=state["index"], scan_precision="high",
                      nprobe=12, budget=budget, scoring=scoring)
            t0 = time.perf_counter()
            d, i = ivf_mod.ivf_knn(xarg, **kw)
            force(d)
            cold = time.perf_counter() - t0
            t0 = time.perf_counter()
            d, i = ivf_mod.ivf_knn(xarg, **kw)
            force(d)
            warm = time.perf_counter() - t0
            log(step="int8_ab", scoring=scoring, budget=budget,
                cold_s=round(cold, 1), warm_s=round(warm, 2),
                recall=round(recall(i), 5))
            del d, i
            gc.collect()
        except Exception as e:
            import traceback
            log(step="int8_ab_error", scoring=scoring,
                error=traceback.format_exc()[-600:])
