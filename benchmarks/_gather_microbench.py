"""Microbenchmark: candidate in-kernel gather strategies vs XLA's dynamic
gather, at the UMAP attraction shape (Z (n,2) f32, NN (n,W) int32).

Round-3 autopsy: XLA's gather is INDEX-bound at ~150-300M indices/s on
v5e, insensitive to locality (ROUND3_STATUS). A fused Pallas attraction
kernel is only worth building if some in-kernel gather formulation beats
that. Candidates:

  xla        — jnp.take baseline (the thing to beat)
  pl_take    — Pallas kernel, jnp.take on a VMEM-resident Z tile
               (does Mosaic lower a dynamic gather at all? how fast?)
  pl_onehot  — Pallas, one-hot bf16 matmul gather over a window of R rows
               (tail-sorted edges make windows contiguous; cost ∝ R·d
               MACs/edge on the MXU + R/1024 VPU ops/edge for the iota
               compare)
  pl_2level  — Pallas, two-stage select: pick a 32-row group via one-hot
               matmul, then select within the group on the VPU
               (cost ∝ (R/32·grp·d + grp·d)/1024 per edge)

Each Pallas variant assumes BUCKETED edges: indices local to a window of
R consecutive Z rows (what a tail-sorted edge layout provides). Edge
blocks are (8, 128) int32 tiles (Mosaic's minimum f32/int32 tile). The
benchmark measures the gather primitive itself; the bucketing is a
build-time transform.
"""

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl

N = 1_300_000
W = 16            # edges per row visited (grouped-schedule width)
D = 8             # embedding dims padded to sublane-friendly 8 (real d=2)
R = 512           # window rows per bucket (tail-sorted locality)
C = 1024          # edges per kernel block (8 sublanes × 128 lanes)


def force(x):
    return float(jnp.sum(x).block_until_ready())


def timeit(f, *args, reps=20):
    force(f(*args))
    t0 = time.perf_counter()
    for _ in range(reps):
        out = f(*args)
    force(out)
    return (time.perf_counter() - t0) / reps


def bench_xla(Z, NN):
    @jax.jit
    def run(Z, NN):
        return jnp.sum(Z[NN], axis=1)

    return timeit(run, Z, NN)


def make_bucketed(key, n_edges, d=D, r=R, c=C):
    """Edges bucketed: bucket b covers Z rows [b*r, b*r+r); each kernel
    block handles c edges of one bucket with local indices < r, laid out
    as an (8, c//128 · 128) → (8, 128) tile stack."""
    nb = n_edges // c
    Z = jax.random.normal(key, (nb, r, d), jnp.float32)
    idx = jax.random.randint(key, (nb, 8, c // 8), 0, r).astype(jnp.int32)
    return Z, idx


def bench_pl_take(Z, idx):
    nb = idx.shape[0]
    d = Z.shape[2]
    c8 = idx.shape[2]

    def kernel(idx_ref, z_ref, o_ref):
        o_ref[:] = jnp.take(z_ref[0], idx_ref[0], axis=0)[None]

    @jax.jit
    def run(Z, idx):
        return pl.pallas_call(
            kernel,
            grid=(nb,),
            in_specs=[
                pl.BlockSpec((1, 8, c8), lambda b: (b, 0, 0)),
                pl.BlockSpec((1, R, d), lambda b: (b, 0, 0)),
            ],
            out_specs=pl.BlockSpec((1, 8, c8, d), lambda b: (b, 0, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((nb, 8, c8, d), jnp.float32),
        )(idx, Z).sum(axis=(0, 1, 2))

    return timeit(run, Z, idx)


def bench_pl_onehot(Z, idx):
    nb = idx.shape[0]
    d = Z.shape[2]
    c8 = idx.shape[2]
    c = 8 * c8

    def kernel(idx_ref, z_ref, o_ref):
        ii = idx_ref[0]                                   # (8, c8)
        oh = (
            ii[:, :, None] == lax.broadcasted_iota(jnp.int32, (8, c8, R), 2)
        ).astype(jnp.bfloat16).reshape(c, R)
        o_ref[:] = jax.lax.dot_general(
            oh, z_ref[0].astype(jnp.bfloat16),
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )[None]

    @jax.jit
    def run(Z, idx):
        return pl.pallas_call(
            kernel,
            grid=(nb,),
            in_specs=[
                pl.BlockSpec((1, 8, c8), lambda b: (b, 0, 0)),
                pl.BlockSpec((1, R, d), lambda b: (b, 0, 0)),
            ],
            out_specs=pl.BlockSpec((1, c, d), lambda b: (b, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((nb, c, d), jnp.float32),
        )(idx, Z).sum(axis=(0, 1))

    return timeit(run, Z, idx)


def bench_pl_2level(Z, idx, grp=32):
    nb = idx.shape[0]
    d = Z.shape[2]
    c8 = idx.shape[2]
    c = 8 * c8
    ngrp = R // grp

    def kernel(idx_ref, z_ref, o_ref):
        ii = idx_ref[0]                                   # (8, c8)
        hi = ii // grp
        lo = ii % grp
        oh_hi = (
            hi[:, :, None] == lax.broadcasted_iota(jnp.int32, (8, c8, ngrp), 2)
        ).astype(jnp.bfloat16).reshape(c, ngrp)
        # stage 1: move each edge's (grp, d) group down via MXU
        zg = z_ref[0].reshape(ngrp, grp * d).astype(jnp.bfloat16)
        g1 = jax.lax.dot_general(
            oh_hi, zg, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).reshape(c, grp, d)
        # stage 2: VPU select within the group
        oh_lo = (
            lo[:, :, None] == lax.broadcasted_iota(jnp.int32, (8, c8, grp), 2)
        ).astype(jnp.float32).reshape(c, grp)
        o_ref[:] = jnp.sum(g1 * oh_lo[:, :, None], axis=1)[None]

    @jax.jit
    def run(Z, idx):
        return pl.pallas_call(
            kernel,
            grid=(nb,),
            in_specs=[
                pl.BlockSpec((1, 8, c8), lambda b: (b, 0, 0)),
                pl.BlockSpec((1, R, d), lambda b: (b, 0, 0)),
            ],
            out_specs=pl.BlockSpec((1, c, d), lambda b: (b, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((nb, c, d), jnp.float32),
        )(idx, Z).sum(axis=(0, 1))

    return timeit(run, Z, idx)


def main():
    key = jax.random.PRNGKey(0)
    n_edges = N * W
    # XLA baseline at the real shape
    Z = jax.random.normal(key, (N, 2), jnp.float32)
    NN = jax.random.randint(key, (N, W), 0, N).astype(jnp.int32)
    t = bench_xla(Z, NN)
    print(json.dumps({"variant": "xla", "edges": n_edges,
                      "ms": round(t * 1e3, 2),
                      "ns_per_idx": round(t / n_edges * 1e9, 3)}), flush=True)

    # Timing-only harness: kernel correctness is covered by the shipped
    # bucketed-gather op's unit tests (tests/), not re-checked here.
    Zb, idx = make_bucketed(key, n_edges)
    for name, fn in [("pl_take", bench_pl_take),
                     ("pl_onehot", bench_pl_onehot),
                     ("pl_2level", bench_pl_2level)]:
        if sys.argv[1:] and name not in sys.argv[1:]:
            continue
        try:
            t = fn(Zb, idx)
            print(json.dumps({"variant": name, "edges": n_edges,
                              "ms": round(t * 1e3, 2),
                              "ns_per_idx": round(t / n_edges * 1e9, 3)}),
                  flush=True)
        except Exception as e:
            print(json.dumps({"variant": name,
                              "error": str(e)[:280]}), flush=True)


if __name__ == "__main__":
    main()
