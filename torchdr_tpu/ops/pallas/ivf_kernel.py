"""Pallas TPU kernel: fused IVF probe scan with in-VMEM top-m selection.

The XLA formulation of the IVF probe (ops/ivf.py) must materialize a
(block × budget·chunk) candidate-score buffer in HBM and run a separate
k-selection pass over it — measured at 1M×128 on v5e, that buffer traffic
plus the ``lax.top_k``/``approx_min_k`` selection costs 2-4× the scan
matmuls themselves, and ``approx_min_k``'s binning loses recall that only
a large margin can hide.

This kernel fuses scan + selection for one query block: for each probe
tile it computes the distance scores on the MXU, masks dead/self rows,
and folds the tile into a running per-query top-m buffer held in VMEM
scratch (scores + flat positions). Selection is exact: m rounds of
vectorized extract-min, executed ONLY when the tile can improve the
running top-m (``pl.when`` on a tile-level test — for a typical probe set
only the query's home-cell tiles pass, so most tiles cost just the matmul
and one row-min). No (block × W) buffer ever reaches HBM.

The caller gathers the probed rows into a contiguous (W, d) slab first
(one XLA take of chunk-length runs, ~50 GB/s measured) and maps the
returned flat positions back through its row index.

STATUS — demoted to opt-in (``scan_impl="pallas"``), not in the auto
tier. Measured at 1M×128 the m-round extract-min makes it VPU-bound
(~14 s vs ~2 s for the XLA path with the approx/tournament merges), and
it has no split-storage path (auto-falls back to "xla" on residual
indexes). It remains correct (exact selection, covered by tests) and is
the right starting point if a future bitonic in-VMEM selector lands;
until then the XLA tournament merge dominates it on every measured
geometry.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

MASK = 1e12


def _scan_kernel(
    q_ref,      # VMEM (block, d)
    qrow_ref,   # VMEM (block, 1) int32
    x_ref,      # VMEM (chunk, d) — tile s of the gathered slab
    id_ref,     # VMEM (chunk, 1) int32
    out_s_ref,  # VMEM (block, m)
    out_p_ref,  # VMEM (block, m) int32
    acc_s,      # scratch (block, m)
    acc_p,      # scratch (block, m) int32
    *,
    m: int,
    chunk: int,
    precision,
):
    s = pl.program_id(0)
    n_slots = pl.num_programs(0)

    @pl.when(s == 0)
    def _():
        acc_s[:] = jnp.full_like(acc_s, MASK)
        acc_p[:] = jnp.full_like(acc_p, -1)

    q = q_ref[:]
    x = x_ref[:]
    ids = id_ref[:]      # (chunk, 1)
    qrows = qrow_ref[:]  # (block, 1)

    g = lax.dot_general(
        q, x,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=precision,
    )
    nc = jnp.sum(x * x, axis=-1)  # (chunk,)
    sc = nc[None, :] - 2.0 * g    # rank-equivalent within a query row
    invalid = (ids[:, 0][None, :] < 0) | (ids[:, 0][None, :] == qrows)
    sc = jnp.where(invalid, MASK, sc)

    # a tile can only change the running top-m if some score beats some
    # row's current worst kept entry; most (far-cell) tiles can't
    worst = jnp.max(acc_s[:], axis=1, keepdims=True)  # (block, 1)
    improves = jnp.any(sc < worst)

    @pl.when(improves)
    def _():
        base = s * chunk
        cols = lax.broadcasted_iota(jnp.int32, sc.shape, 1)
        t_s = sc
        cur_s = acc_s[:]
        cur_p = acc_p[:]
        mcols = lax.broadcasted_iota(jnp.int32, cur_s.shape, 1)
        big = jnp.int32(2**30)

        # m rounds of extract-min over the tile, each immediately replacing
        # the running buffer's current worst entry when it improves on it.
        # arg-extraction is expressed as min-of-masked-iota (first match) —
        # only min/max/where reductions, which Mosaic lowers natively.
        # Unrolled Python loop (fori_loop carries crash the Mosaic
        # compiler here); the enlarged vmem_limit_bytes below covers the
        # unrolled live range.
        for _ in range(m):
            mn = jnp.min(t_s, axis=1, keepdims=True)  # (block, 1)
            am = jnp.min(
                jnp.where(t_s == mn, cols, big), axis=1, keepdims=True
            )  # (block, 1) argmin
            t_s = jnp.where(cols == am, MASK, t_s)
            w = jnp.max(cur_s, axis=1, keepdims=True)
            aw = jnp.min(
                jnp.where(cur_s == w, mcols, big), axis=1, keepdims=True
            )  # (block, 1) argmax position
            take = (mn < w) & (mcols == aw)           # (block, m)
            cur_s = jnp.where(take, mn, cur_s)
            cur_p = jnp.where(take, base + am, cur_p)
        acc_s[:] = cur_s
        acc_p[:] = cur_p

    @pl.when(s == n_slots - 1)
    def _():
        out_s_ref[:] = acc_s[:]
        out_p_ref[:] = acc_p[:]


@functools.partial(
    jax.jit,
    static_argnames=("m", "chunk", "scan_precision", "interpret"),
)
def ivf_scan_block_pallas(
    Qb: jnp.ndarray,      # (block, d) query block
    q_rows: jnp.ndarray,  # (block,) int32 original row ids (−1/−2 = dead)
    Xg: jnp.ndarray,      # (W, d) gathered probe slab, W % chunk == 0
    idg: jnp.ndarray,     # (W,) int32 original ids of slab rows, −1 = dead
    m: int = 32,
    chunk: int = 512,
    scan_precision: str = "high",
    interpret: bool = False,
):
    """Exact top-m of one query block over its probe slab.

    Returns (scores (block, m), flat slab positions (block, m)).
    """
    block, d = Qb.shape
    W = Xg.shape[0]
    budget = W // chunk
    # Mosaic supports only DEFAULT/HIGHEST dot precisions; "high" promotes
    # to HIGHEST (the in-kernel selection is exact, so scan rank fidelity
    # is the only precision question)
    prec = {
        "default": lax.Precision.DEFAULT,
        "high": lax.Precision.HIGHEST,
        "highest": lax.Precision.HIGHEST,
    }[scan_precision]

    return pl.pallas_call(
        functools.partial(_scan_kernel, m=m, chunk=chunk, precision=prec),
        grid=(budget,),
        in_specs=[
            pl.BlockSpec((block, d), lambda s: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block, 1), lambda s: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk, d), lambda s: (s, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk, 1), lambda s: (s, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((block, m), lambda s: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block, m), lambda s: (0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((block, m), jnp.float32),
            jax.ShapeDtypeStruct((block, m), jnp.int32),
        ),
        scratch_shapes=[
            pltpu.VMEM((block, m), jnp.float32),
            pltpu.VMEM((block, m), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            # the unrolled m-round extraction keeps ~m tile-sized values
            # live; the default 16M scoped-VMEM budget is too small
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(
        Qb,
        q_rows[:, None].astype(jnp.int32),
        Xg,
        idg[:, None].astype(jnp.int32),
    )
