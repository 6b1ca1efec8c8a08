"""1.3M UMAP loop xplane autopsy (round 5, VERDICT #3/#5).

One process, normal fit pipeline (so every compile is the shipped one):
cold fit, then a warm fit that captures the compiled loop's real
arguments, then a jax.profiler trace of ONE 20-iteration dispatch
segment. The xplane is parsed op-by-op (device plane, durations summed
by op name) to show where the 116 ms/step actually goes — the round-3
"attraction gather wall" number (5.8 ns/idx) does not reproduce
standalone (a 13M-index gather from a VMEM-resident (1.3M,2) table runs
in ~0.06 ms), so the wall must be elsewhere in the loop.
"""

import glob
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
TRACE_DIR = "/tmp/xplane_umap_r5"


def log(**kw):
    print("JSON " + json.dumps(kw), flush=True)


def parse_xplane(trace_dir, top=30):
    """Sum device-plane event durations by op name from the newest
    .xplane.pb under trace_dir."""
    paths = sorted(
        glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"), recursive=True),
        key=os.path.getmtime,
    )
    if not paths:
        return None, "no xplane.pb found"
    try:
        from tensorflow.core.profiler.protobuf import xplane_pb2
    except Exception:
        try:
            from tensorboard_plugin_profile.protobuf import xplane_pb2
        except Exception as e:
            return None, f"no xplane proto: {e}"
    space = xplane_pb2.XSpace()
    with open(paths[-1], "rb") as f:
        space.ParseFromString(f.read())
    out = {}
    for plane in space.planes:
        if "TPU" not in plane.name and "device" not in plane.name.lower():
            continue
        meta = {m_id: m.name for m_id, m in plane.event_metadata.items()}
        for line in plane.lines:
            # op-level lines only; skip step/trace markers
            if "step" in line.name.lower():
                continue
            for ev in line.events:
                name = meta.get(ev.metadata_id, str(ev.metadata_id))
                out[name] = out.get(name, 0.0) + ev.duration_ps / 1e12
    items = sorted(out.items(), key=lambda kv: -kv[1])[:top]
    return items, f"{len(out)} distinct ops, plane file {paths[-1]}"


def main():
    rng = np.random.default_rng(0)
    centers = rng.normal(scale=6.0, size=(40, D)).astype(np.float32)
    X = (centers[rng.integers(0, 40, N)] + rng.normal(size=(N, D))).astype(
        np.float32
    )

    model = tdr.UMAP(
        n_neighbors=30, max_iter=500, random_state=0,
        knn_mode=tdr.KnnConfig(mode="ivf", nprobe=16),
        shared_negatives=True, n_shared_negatives=512,
        edge_groups=12, max_iters_per_dispatch=20,
    )

    t0 = time.perf_counter()
    model.fit_transform(X)
    log(step="cold", secs=round(time.perf_counter() - t0, 1))

    cap = {}
    key_, real = model._compiled_run_

    def wrapper(state, consts_arrays, it_end):
        if "args" not in cap:
            cap["args"] = (state, consts_arrays)
        return real(state, consts_arrays, it_end)

    model._compiled_run_ = (key_, wrapper)
    t0 = time.perf_counter()
    model.fit_transform(X)
    warm = time.perf_counter() - t0
    log(step="warm", secs=round(warm, 1))

    state0, consts_arrays = cap["args"]
    it_end = jnp.asarray(int(state0[0]) + 20, jnp.int32)
    # re-time the single segment (pure loop, no affinity)
    st, Z = real(state0, consts_arrays, it_end)
    jax.block_until_ready(Z)
    t0 = time.perf_counter()
    st, Z = real(state0, consts_arrays, it_end)
    jax.block_until_ready(Z)
    seg_s = time.perf_counter() - t0
    log(step="segment20", secs=round(seg_s, 3),
        ms_per_iter=round(seg_s / 20 * 1e3, 2))

    with jax.profiler.trace(TRACE_DIR):
        st, Z = real(state0, consts_arrays, it_end)
        jax.block_until_ready(Z)

    items, note = parse_xplane(TRACE_DIR)
    log(step="xplane", note=note)
    if items:
        for name, secs in items:
            log(step="op", name=name[:120], total_ms=round(secs * 1e3, 3),
                ms_per_iter=round(secs / 20 * 1e3, 3))


if __name__ == "__main__":
    main()
