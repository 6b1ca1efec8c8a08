"""Budget cliff isolation: microbench the per-block pieces at fast (70)
vs slow (76) budget shapes — whole-chunk gather, scan matmul, tournament
selection — to find which op owns the 1.6x warm-time jump
(_ivf2m_cliff.py; HLO structure is identical per _ivf2m_cliff_hlo.py).

Pieces are timed inside a lax.map over dummy blocks to reproduce the
real program's sequencing (per-block dispatch is where the 10M search
spends its fixed cost).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import jax.numpy as jnp
import numpy as np
from jax import lax

D, CHUNK, BLOCK, K, T = 128, 128, 256, 15, 16
NROWS = 2_000_000
NBLOCKS = 256  # enough blocks to amortize dispatch; scale up in report


def pull(out):
    # block_until_ready does NOT synchronize under the axon relay; only a
    # host pull of the value does (same trick as the sweep drivers' force())
    leaf = jax.tree_util.tree_leaves(out)[0]
    return float(jnp.sum(leaf.astype(jnp.float32)))


def bench(fn, *args, reps=3):
    pull(fn(*args))
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        pull(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    key = jax.random.PRNGKey(0)
    Xs = jax.random.normal(key, (NROWS + CHUNK, D), jnp.bfloat16)
    n_ch = NROWS // CHUNK

    for budget in (70, 76, 128):
        W = budget * CHUNK
        slots = jax.random.randint(key, (NBLOCKS, budget), 0, n_ch)

        # 1) whole-chunk gather: (budget, chunk, d) take per block
        def g_chunks(Xs, slots):
            def pb(sl):
                xg = jnp.take(
                    Xs.reshape(-1, CHUNK, D), sl, axis=0, mode="clip"
                ).reshape(W, D)
                return jnp.max(xg.astype(jnp.float32), axis=0)
            return lax.map(pb, slots)

        t_g = bench(jax.jit(g_chunks), Xs, slots)

        # 2) scan matmul: (block, d) @ (d, W) bf16→f32 per block
        Q = jax.random.normal(key, (NBLOCKS, BLOCK, D), jnp.bfloat16)
        Xg = jax.random.normal(key, (W, D), jnp.bfloat16)

        def g_mm(Q, Xg):
            def pb(q):
                return jnp.max(jnp.matmul(
                    q, Xg.T, preferred_element_type=jnp.float32
                ), axis=1)
            return lax.map(pb, Q)

        t_mm = bench(jax.jit(g_mm), Q, Xg)

        # 3) tournament: per-slot top-T then top-K over survivors
        buf = jax.random.normal(key, (NBLOCKS, BLOCK, W), jnp.float32)

        def g_tour(buf):
            def pb(b):
                b3 = b.reshape(BLOCK, budget, CHUNK)
                neg1, i1 = lax.top_k(b3, T)
                flat = neg1.reshape(BLOCK, budget * T)
                neg2, i2 = lax.top_k(flat, K)
                return neg2
            return lax.map(pb, buf)

        t_tour = bench(jax.jit(g_tour), buf)

        # 4) gather+matmul fused (the real program's pairing)
        def g_both(Xs, slots, Q):
            def pb(args):
                sl, q = args
                xg = jnp.take(
                    Xs.reshape(-1, CHUNK, D), sl, axis=0, mode="clip"
                ).reshape(W, D)
                return jnp.max(jnp.matmul(
                    q, xg.T, preferred_element_type=jnp.float32
                ), axis=1)
            return lax.map(pb, (slots, Q))

        t_both = bench(jax.jit(g_both), Xs, slots, Q)

        print(
            "JSON "
            + json.dumps(
                dict(
                    budget=budget,
                    gather_ms=round(t_g / NBLOCKS * 1e3, 4),
                    matmul_ms=round(t_mm / NBLOCKS * 1e3, 4),
                    tournament_ms=round(t_tour / NBLOCKS * 1e3, 4),
                    gather_matmul_ms=round(t_both / NBLOCKS * 1e3, 4),
                )
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
