"""XLA gather variants at the 1.3M UMAP attraction shape.

The round-3/4 autopsy pinned the attraction step on XLA's dynamic
gather (~5.8 ns/index, index-bound). Before building a Pallas window
kernel (which needs edge bucketing + a scatter return), check whether
the XLA gather itself has cheap headroom:

  rows_f32    — Z[NN] with Z (n,2) f32: the shipped formulation
  rows_pad4   — Z padded to (n,4): row = 16 B = one sublane word?
  scalar_c64  — Z viewed as (n,) complex64: ONE gathered element per
                index instead of two (does XLA pay per element?)
  scalar_u64  — same trick via bitcast to uint64 (int path)
  take_sorted — gather with per-row sorted indices (locality hint)
  onehot_mxu  — full one-hot bf16 matmul per 512-row source chunk, XLA
                level (no Pallas): cost model says slow, sanity anchor
"""

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

N = 1_300_000
W = 10  # groups12 per-step width at the 120-wide 1.3M graph


def force(x):
    # axon-relay block_until_ready does not synchronize; pull a scalar
    return float(jnp.sum(x.ravel()[:8]))


def timeit(f, *args, reps=30):
    force(f(*args))
    t0 = time.perf_counter()
    for _ in range(reps):
        out = f(*args)
    force(out)  # device executions serialize; one final sync covers all
    return (time.perf_counter() - t0) / reps


def report(name, t, n_idx):
    print(json.dumps({"variant": name, "ms": round(t * 1e3, 2),
                      "ns_per_idx": round(t / n_idx * 1e9, 3)}), flush=True)


def main():
    key = jax.random.PRNGKey(0)
    Z = jax.random.normal(key, (N, 2), jnp.float32)
    NN = jax.random.randint(key, (N, W), 0, N).astype(jnp.int32)
    n_idx = N * W

    @jax.jit
    def rows_f32(Z, NN):
        return jnp.sum(Z[NN], axis=1)

    report("rows_f32", timeit(rows_f32, Z, NN), n_idx)

    Z4 = jnp.pad(Z, ((0, 0), (0, 2)))

    @jax.jit
    def rows_pad4(Z4, NN):
        return jnp.sum(Z4[NN], axis=1)[:, :2]

    report("rows_pad4", timeit(rows_pad4, Z4, NN), n_idx)

    @jax.jit
    def scalar_c64(Z, NN):
        Zc = jax.lax.bitcast_convert_type(Z, jnp.complex64).reshape(-1)
        G = Zc[NN]  # (N, W) complex64 — one element per index
        Gf = jax.lax.bitcast_convert_type(G[..., None], jnp.float32)
        return jnp.sum(Gf.reshape(N, W, 2), axis=1)

    try:
        report("scalar_c64", timeit(scalar_c64, Z, NN), n_idx)
    except Exception as e:
        print(json.dumps({"variant": "scalar_c64", "error": str(e)[:200]}),
              flush=True)

    @jax.jit
    def scalar_u64(Z, NN):
        Zu = jax.lax.bitcast_convert_type(
            jax.lax.bitcast_convert_type(Z, jnp.uint32).reshape(N, 2),
            jnp.uint64,
        ).reshape(-1)
        G = Zu[NN]
        Gf = jax.lax.bitcast_convert_type(G, jnp.uint32)
        return jnp.sum(
            jax.lax.bitcast_convert_type(Gf, jnp.float32).reshape(N, W, 2),
            axis=1,
        )

    try:
        report("scalar_u64", timeit(scalar_u64, Z, NN), n_idx)
    except Exception as e:
        print(json.dumps({"variant": "scalar_u64", "error": str(e)[:200]}),
              flush=True)

    NNs = jnp.sort(NN, axis=1)

    @jax.jit
    def take_sorted(Z, NNs):
        return jnp.sum(Z[NNs], axis=1)

    report("take_sorted", timeit(take_sorted, Z, NNs), n_idx)


if __name__ == "__main__":
    main()
