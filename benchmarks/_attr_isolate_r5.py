"""Isolate the 1.3M attraction slowdown: standalone vs in-while_loop.

The xplane autopsy shows the in-loop gather fusion at 67 ms/iter
(5.2 ns/idx) while the identical standalone gather runs in 0.06 ms
(VMEM-resident table). This bench replicates the loop structure piece
by piece to find the trigger: the while_loop carry, the eons state
chain, the coef math, or the (n,W,2) diff materialization.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

N, W = 1_300_000, 10
A, B = 1.577, 0.895


def log(**kw):
    print("JSON " + json.dumps(kw), flush=True)


def force(x):
    # axon-relay block_until_ready does not synchronize; a scalar
    # reduction pulled to host does
    leaves = jax.tree_util.tree_leaves(x)
    return float(jnp.sum(leaves[0].ravel()[:8].astype(jnp.float32)))


def timeit(f, *args, reps=10):
    force(f(*args))
    t0 = time.perf_counter()
    for _ in range(reps):
        out = f(*args)
    force(out)  # device executions serialize; one final sync covers all
    return (time.perf_counter() - t0) / reps


def attr_core(Z, NN, eps, eons, it):
    diff = Z[:, None, :] - Z[NN]
    D = jnp.sum(diff * diff, axis=-1)
    positive = D > 0
    t = D**B
    coef = 2.0 * A * B * t / (jnp.maximum(D, 1e-20) * (1.0 + A * t))
    coef = jnp.where(positive, coef, 0.0)
    now = jnp.asarray(it + 1, eons.dtype)
    due = now - eons
    c = jnp.where(due >= 0, jnp.floor(due / eps) + 1.0, 0.0)
    c = jnp.where(jnp.isfinite(eps), c, 0.0)
    eons = eons + jnp.where(c > 0, c * eps, 0.0)
    coef = coef * c
    grad = jnp.clip(jnp.sum(diff * coef[:, :, None], axis=1), -4.0, 4.0)
    return grad, eons, c


def main():
    key = jax.random.PRNGKey(0)
    Z = jax.random.normal(key, (N, 2), jnp.float32)
    NN = jax.random.randint(key, (N, W), 0, N).astype(jnp.int32)
    eps = jnp.abs(jax.random.normal(jax.random.fold_in(key, 1), (N, W))) + 1.0
    eons = eps

    # 1. bare gather+sum
    t = timeit(jax.jit(lambda Z, NN: jnp.sum(Z[NN], axis=1)), Z, NN)
    log(case="gather_sum", ms=round(t * 1e3, 3))

    # 2. gather + distance + coef (no eons chain)
    def coef_only(Z, NN):
        diff = Z[:, None, :] - Z[NN]
        D = jnp.sum(diff * diff, axis=-1)
        t_ = D**B
        coef = 2.0 * A * B * t_ / (jnp.maximum(D, 1e-20) * (1.0 + A * t_))
        return jnp.sum(diff * coef[:, :, None], axis=1)

    t = timeit(jax.jit(coef_only), Z, NN)
    log(case="coef_only", ms=round(t * 1e3, 3))

    # 3. full attr_core standalone
    t = timeit(jax.jit(lambda Z, NN, eps, eons: attr_core(Z, NN, eps, eons, 3)),
               Z, NN, eps, eons)
    log(case="attr_core", ms=round(t * 1e3, 3))

    # 4. attr_core in a 20-iter while_loop with (Z, eons) carry
    @jax.jit
    def loop(Z, NN, eps, eons):
        def body(state):
            it, Z, eons = state
            grad, eons, c = attr_core(Z, NN, eps, eons, it)
            return it + 1, Z - 0.01 * grad, eons

        def cond(state):
            return state[0] < 20

        _, Zf, ef = lax.while_loop(cond, body, (jnp.asarray(0, jnp.int32), Z, eons))
        return Zf, ef

    t = timeit(loop, Z, NN, eps, eons)
    log(case="while20_attr", ms=round(t * 1e3, 2), ms_per_iter=round(t / 20 * 1e3, 3))

    # 5. while_loop, gather+sum only (no eons, no coef)
    @jax.jit
    def loop_gather(Z, NN):
        def body(state):
            it, Z = state
            g = jnp.sum(Z[NN], axis=1)
            return it + 1, Z - 1e-6 * g

        _, Zf = lax.while_loop(lambda s: s[0] < 20, body,
                               (jnp.asarray(0, jnp.int32), Z))
        return Zf

    t = timeit(loop_gather, Z, NN)
    log(case="while20_gather", ms=round(t * 1e3, 2), ms_per_iter=round(t / 20 * 1e3, 3))

    # 6. like 4 but with the (n,120) full eons + dynamic_slice per iter
    eps_full = jnp.tile(eps, (1, 12))
    eons_full = jnp.tile(eons, (1, 12))
    NN_full = jnp.tile(NN, (1, 12))

    @jax.jit
    def loop_sliced(Z, NN_full, eps_full, eons_full):
        def body(state):
            it, Z, eons_full = state
            g = jnp.mod(it, 12)
            NNg = lax.dynamic_slice(NN_full, (0, g * W), (N, W))
            epsg = lax.dynamic_slice(eps_full, (0, g * W), (N, W))
            eonsg = lax.dynamic_slice(eons_full, (0, g * W), (N, W))
            grad, eonsg, c = attr_core(Z, NNg, epsg, eonsg, it)
            eons_full = lax.dynamic_update_slice(eons_full, eonsg, (0, g * W))
            return it + 1, Z - 0.01 * grad, eons_full

        _, Zf, ef = lax.while_loop(lambda s: s[0] < 20, body,
                                   (jnp.asarray(0, jnp.int32), Z, eons_full))
        return Zf, ef

    t = timeit(loop_sliced, Z, NN_full, eps_full, eons_full)
    log(case="while20_sliced", ms=round(t * 1e3, 2), ms_per_iter=round(t / 20 * 1e3, 3))


if __name__ == "__main__":
    main()
