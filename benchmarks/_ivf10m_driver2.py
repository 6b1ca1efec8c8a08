"""Persistent 10M IVF experiment driver, v2 — on-device datagen.

v1 (`_ivf10m_driver.py`) paid a 3-22 min host push of the 10M dataset
over the axon tunnel. v2 generates the same clustered distribution
(10k centers, sigma-10 spread, unit noise) directly on device in 1M-row
donated segments: total startup (datagen + ground truth + build) is
~2 min, and the dataset never touches the host.

Commands via /tmp/ivf_driver_cmd.json (polled every 2 s), results to
/tmp/ivf_driver_out.jsonl:

  {"op": "sweep", "configs": [{...ivf_knn kwargs...}]}
  {"op": "rebuild", "kwargs": {...ivf_build kwargs...}}   # reloads ops.ivf,
      reconstructs f32 rows from the residual index (c + hi + lo), rebuilds
  {"op": "reload"}   # importlib.reload of ops.ivf (search-side code edits)
  {"op": "py", "file": "/tmp/exp.py"}   # exec a script in the driver's
      namespace (state["index"], ivf_mod, jnp, recall, log are in scope) —
      the hook for HLO dumps, jax.profiler traces, and one-off experiments
  {"op": "quit"}
"""

import functools
import gc
import importlib
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
from jax import lax, random

import torchdr_tpu.ops.ivf as ivf_mod
import torchdr_tpu.ops.kmeans as kmeans_mod
from torchdr_tpu.ops.distance import knn_graph

N, D, K = 10_000_000, 128, 15
NC = 10_000
SUB = 1000
SEG = 1_000_000
CMD = "/tmp/ivf_driver_cmd.json"
OUT = "/tmp/ivf_driver_out.jsonl"


def log(**kw):
    line = json.dumps(kw)
    print("JSON " + line, flush=True)
    with open(OUT, "a") as f:
        f.write(line + "\n")


def force(x):
    return float(jnp.sum(jnp.where(jnp.isfinite(x), x, 0)))


@functools.partial(jax.jit, donate_argnums=(0,), static_argnames=("seg",))
def _gen_seg(out, centers, key, a, seg):
    lab = random.randint(key, (seg,), 0, centers.shape[0])
    noise = random.normal(random.fold_in(key, 1), (seg, centers.shape[1]))
    return lax.dynamic_update_slice_in_dim(out, centers[lab] + noise, a, 0)


def reconstruct_rows(idx):
    """f32 database rows in ORIGINAL row order from an index.

    Unpermutes the sorted layout through ids_sorted (dead pad rows land
    on a spill slot and are dropped): the rebuilt index's self-query
    outputs then stay aligned with the cached ground truth. A
    layout-order rebuild is silently catastrophic twice over — recall
    reads ~0.001 (id spaces differ) and ~10% of the db becomes phantom
    centroid-copies (dead rows reconstruct to exactly the cell centroid).
    Measured CPU repro: first build 1.0, layout-order rebuild 0.001,
    unpermuted rebuild 1.0. Caller must free the source index BEFORE
    slicing off the spill row (peak = out + planes otherwise).
    """
    if idx.scales is not None:
        raise ValueError(
            "int8 reconstruction is lossy — rebuild from a split/f32 index "
            "instead (order int8 builds last)."
        )
    total, d = idx.X_sorted.shape
    n = idx.n
    residual = idx.X_lo is not None
    seg = 1 << 21

    @functools.partial(jax.jit, donate_argnums=(0,), static_argnames=("seg",))
    def rec_seg(out, hi, lo, cells, cent, ids, a, seg):
        h = lax.dynamic_slice_in_dim(hi, a, seg, 0).astype(jnp.float32)
        if residual:
            h = h + lax.dynamic_slice_in_dim(lo, a, seg, 0).astype(jnp.float32)
            h = h + cent[lax.dynamic_slice_in_dim(cells, a, seg, 0)]
        ids_s = lax.dynamic_slice_in_dim(ids, a, seg, 0)
        sid = jnp.where(ids_s >= 0, ids_s, n)
        return out.at[sid].set(h)

    out = jnp.zeros((n + 1, d), jnp.float32)
    starts = list(range(0, total - seg, seg)) + [max(0, total - seg)]
    for a in starts:
        out = rec_seg(out, idx.X_sorted, idx.X_lo, idx.cells_sorted,
                      idx.centroids, idx.ids_sorted,
                      jnp.asarray(a, jnp.int32), min(seg, total))
    out.block_until_ready()
    return out


def main():
    t0 = time.perf_counter()
    rng = np.random.default_rng(0)
    centers = jnp.asarray(
        rng.normal(scale=10.0, size=(NC, D)).astype(np.float32)
    )
    key0 = random.key(0)
    X = jnp.zeros((N, D), jnp.float32)
    for i, a in enumerate(range(0, N, SEG)):
        X = _gen_seg(X, centers, random.fold_in(key0, i),
                     jnp.asarray(a, jnp.int32), SEG)
    X.block_until_ready()
    del centers
    log(step="datagen", secs=round(time.perf_counter() - t0, 1))

    t0 = time.perf_counter()
    gt_cache = "/tmp/i_true.npy"
    if os.path.exists(gt_cache):
        # deterministic datagen (fixed keys) → the cached exact kNN of the
        # first SUB rows is still valid across driver restarts
        i_true = np.load(gt_cache)
        log(step="groundtruth", cached=True)
    else:
        _, i_t = knn_graph(X[:SUB], X, k=K + 1, exclude_diag=False,
                           precision="highest")
        i_t = np.asarray(i_t)
        i_true = np.stack(
            [row[row != r][:K] for r, row in zip(range(SUB), i_t)]
        )
        np.save(gt_cache, i_true)
        log(step="groundtruth", secs=round(time.perf_counter() - t0, 1))

    X_holder = [X]
    del X

    def recall(i):
        ig = np.asarray(i[:SUB])
        return float(
            np.mean([len(set(ig[j]) & set(i_true[j])) / K for j in range(SUB)])
        )

    state = {"index": None}

    def do_build(**kw):
        t0 = time.perf_counter()
        if state["index"] is None:
            src = X_holder.pop()
        else:
            idx_old = state["index"]
            state["index"] = None
            src_full = reconstruct_rows(idx_old)
            n_old = idx_old.n
            del idx_old
            gc.collect()
            src = src_full[:n_old]
            src.block_until_ready()
            del src_full
            gc.collect()
        kwargs = dict(n_clusters=16384, chunk=128, kmeans_iters=15,
                      verbose=True)
        kwargs.update(kw)
        holder = [src]
        del src
        state["index"] = ivf_mod.ivf_build(holder.pop(), **kwargs)
        gc.collect()
        idx = state["index"]
        log(step="build", build_s=round(time.perf_counter() - t0, 1),
            split=idx.X_lo is not None, int8=idx.scales is not None,
            rows=int(idx.X_sorted.shape[0]),
            max_cell=int(np.max(np.asarray(idx.counts))),
            **{k: v for k, v in kwargs.items() if k != "verbose"})

    build0 = {"n_superlist": 256}
    build0.update(json.loads(os.environ.get("IVF_DRIVER_BUILD", "{}")))
    do_build(**build0)

    log(step="ready")
    last_mtime = 0.0
    while True:
        try:
            mt = os.path.getmtime(CMD)
        except OSError:
            time.sleep(2)
            continue
        if mt <= last_mtime:
            time.sleep(2)
            continue
        last_mtime = mt
        try:
            cmd = json.load(open(CMD))
        except Exception as e:
            log(step="cmd_error", error=str(e)[:200])
            continue
        op = cmd.get("op")
        if op == "quit":
            log(step="quit")
            return
        if op == "reload":
            importlib.reload(kmeans_mod)
            globals()["ivf_mod"] = importlib.reload(ivf_mod)
            log(step="reloaded")
        elif op == "py":
            try:
                src = open(cmd["file"]).read()
                ns = dict(globals())
                ns.update(state=state, recall=recall, log=log, force=force,
                          ivf_mod=ivf_mod, i_true=i_true)
                exec(compile(src, cmd["file"], "exec"), ns)
                log(step="py_done", file=cmd["file"])
            except Exception as e:
                import traceback
                log(step="py_error", error=traceback.format_exc()[-800:])
        elif op == "rebuild":
            try:
                importlib.reload(kmeans_mod)
                globals()["ivf_mod"] = importlib.reload(ivf_mod)
                do_build(**cmd.get("kwargs", {}))
            except Exception as e:
                log(step="rebuild_error", error=repr(e)[:400])
        elif op == "sweep":
            for cfg in cmd.get("configs", []):
                try:
                    kw = dict(k=K, index=state["index"], scan_precision="high")
                    kw.update(cfg)
                    t0 = time.perf_counter()
                    d, i = ivf_mod.ivf_knn(None, **kw)
                    force(d)
                    cold = time.perf_counter() - t0
                    t0 = time.perf_counter()
                    d, i = ivf_mod.ivf_knn(None, **kw)
                    force(d)
                    warm = time.perf_counter() - t0
                    log(step="search", **cfg, cold_s=round(cold, 1),
                        warm_s=round(warm, 2), recall=round(recall(i), 5))
                    del d, i
                    gc.collect()
                except Exception as e:
                    log(step="search_error", **cfg, error=repr(e)[:400])
        else:
            log(step="unknown_op", op=op)


if __name__ == "__main__":
    main()
