"""1.3M x 50 UMAP warm-fit phase profile (round 5).

Splits the 82 s warm flagship fit (groups12, round 4) into its host-side
phases (kNN+affinity, pruning, init, training loop) and micro-times the
training-step components (attraction vs repulsion vs full gradient) at
the real shapes with the real consts/carry. Motivated by the round-5
finding that a standalone 13M-index embedding gather runs in ~0.06 ms
(VMEM-resident table), contradicting the round-3 "5.8 ns/idx attraction
wall" autopsy — so where does the step time actually go?
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

import torchdr_tpu as tdr

N, D = 1_300_000, 50


def log(**kw):
    print("JSON " + json.dumps(kw), flush=True)


def timeit(f, *args, reps=10):
    jax.block_until_ready(f(*args))
    t0 = time.perf_counter()
    for _ in range(reps):
        out = f(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps


def main():
    rng = np.random.default_rng(0)
    centers = rng.normal(scale=6.0, size=(40, D)).astype(np.float32)
    lab = rng.integers(0, 40, N)
    X = centers[lab] + rng.normal(size=(N, D)).astype(np.float32)

    model = tdr.UMAP(
        n_neighbors=30, max_iter=500, random_state=0,
        knn_mode=tdr.KnnConfig(mode="ivf", nprobe=16),
        shared_negatives=True, n_shared_negatives=512,
        edge_groups=12, max_iters_per_dispatch=20,
    )

    # host-side phase timers around the pipeline methods
    phases = {}

    def wrap(name, fn):
        def inner(*a, **k):
            t0 = time.perf_counter()
            out = fn(*a, **k)
            jax.block_until_ready(getattr(model, "affinity_in_", 0))
            phases[name] = phases.get(name, 0.0) + time.perf_counter() - t0
            return out

        return inner

    model._compute_input_affinity = wrap(
        "affinity", model._compute_input_affinity
    )
    model.on_affinity_computation_end = wrap(
        "prune", model.on_affinity_computation_end
    )

    loop = 58.1  # last full-fit measurement (phases step below)
    if not os.environ.get("COMPONENTS_ONLY"):
        t0 = time.perf_counter()
        model.fit_transform(X)
        cold = time.perf_counter() - t0
        phases.clear()
        t0 = time.perf_counter()
        Z = model.fit_transform(X)
        warm = time.perf_counter() - t0
        loop = warm - sum(phases.values())
        log(step="phases", cold_s=round(cold, 1), warm_s=round(warm, 1),
            loop_s=round(loop, 1),
            **{k: round(v, 2) for k, v in phases.items()})
        Zj = jnp.asarray(Z, jnp.float32)
    else:
        Zj = jax.random.normal(jax.random.PRNGKey(1), (N, 2), jnp.float32)

    # ---- per-step component timing at the real shapes ----
    # the fit cleans up affinity_in_; recompute the input graph state
    Xj = jnp.asarray(X)
    model._compute_input_affinity(Xj)
    model.on_affinity_computation_end()
    consts = model._build_consts(Xj)
    carry = model._init_carry(consts)
    key = jax.random.PRNGKey(0)
    itv = jnp.asarray(3, jnp.int32)

    consts_a = {k: v for k, v in consts.items() if hasattr(v, "ndim")}
    static = {k: v for k, v in consts.items() if not hasattr(v, "ndim")}

    def attr(Z, carry, it, key, ca):
        g, c2 = model._attractive_gradients(Z, {**ca, **static}, carry, it, key)
        return g, c2["active_edges"]

    def rep(Z, carry, it, key, ca):
        g, _ = model._repulsive_gradients(Z, {**ca, **static}, carry, it, key)
        return g

    def full(Z, carry, it, key, ca):
        g, c2 = model._gradients(Z, {**ca, **static}, carry, it, key, 1.0)
        return g, c2["active_edges"]

    ja = jax.jit(attr)
    jr = jax.jit(rep)
    jf = jax.jit(full)
    t_attr = timeit(ja, Zj, carry, itv, key, consts_a)
    # repulsion consumes active_edges from the attraction
    _, act = ja(Zj, carry, itv, key, consts_a)
    carry2 = dict(carry, active_edges=act)
    t_rep = timeit(jr, Zj, carry2, itv, key, consts_a)
    t_full = timeit(jf, Zj, carry, itv, key, consts_a)
    log(step="step_components", attraction_ms=round(t_attr * 1e3, 2),
        repulsion_ms=round(t_rep * 1e3, 2),
        full_grad_ms=round(t_full * 1e3, 2),
        loop_ms_per_iter=round(loop / 500 * 1e3, 2))


if __name__ == "__main__":
    main()
