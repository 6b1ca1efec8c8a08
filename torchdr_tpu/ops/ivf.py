"""IVF-style approximate kNN: coarse quantization + block-sparse probe.

The ANN tier replacing Faiss IVFFlat (reference: torchdr/distance/
faiss.py:323-473; B200 numbers in benchmarks/faiss/BENCHMARK_RESULTS.md).
Designed for the MXU rather than translated from Faiss's per-query list
scanning:

- **Build**: k-means centroids (ops/kmeans.py, on a subsample), assign all
  points by blockwise argmin, sort the database by cluster so each inverted
  list is a contiguous row range, padded to a fixed ``chunk`` granularity
  for static-shape slicing.
- **Search** (self-kNN fast path): the sorted database rows ARE the
  cluster-coherent query order, so no assignment/argsort/gather is paid at
  query time. Queries are processed in blocks; each block *votes* for the
  cells its queries want probed, the winning cells are expanded greedily
  (in vote order) into a static budget of fixed-size row chunks, and each
  (query-block × chunk) pair is one dense MXU matmul at reduced precision
  feeding a candidate-score buffer. One ``approx_min_k`` pulls the top-m
  per query, and an m-margin exact f32 re-rank (difference form, fused
  VPU) fixes the final ranks.

Design choices are measurement-driven (see benchmarks/_ivf_phases.py and
docs/ROUND2_STATUS.md): exact ``lax.top_k``/``take_along_axis`` merges and
batched-matvec einsums are 5-20× slower than this structure on v5e; plain
row gathers run at ~50 GB/s and are fine at m ≈ 2k.

Like Faiss IVF this is approximate (a query whose true neighbors live in
un-probed cells misses them); unlike Faiss the probe set is chosen per
query *block*, which is what makes the memory access TPU-shaped.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from .metrics import MASK_VALUE, sq_dists_from_gram
from .kmeans import kmeans_fit


class IVFIndex(NamedTuple):
    centroids: jnp.ndarray   # (ncells, d)
    X_sorted: jnp.ndarray    # (n_pad + chunk, d) database rows grouped by cell
    ids_sorted: jnp.ndarray  # (n_pad + chunk,) original row ids (-1 padding)
    offsets: jnp.ndarray     # (ncells,) start of each cell in X_sorted
    counts: jnp.ndarray      # (ncells,) cell sizes
    chunk: int               # probe granularity (static slice length)
    n: int                   # number of real database rows


def auto_nlist(n: int) -> int:
    """Faiss-style heuristic (reference: faiss.py:335-342)."""
    return int(max(16, min(4 * (n ** 0.5), n / 39, 8192)))


def ivf_build(
    X,
    n_clusters: int | None = None,
    key=None,
    train_size: int = 25_600,
    kmeans_iters: int = 25,
    chunk: int | None = None,
    align: bool = True,
) -> IVFIndex:
    """Build the inverted file index (host-synced shapes; build once).

    With ``align=True`` each cell's rows are padded to a multiple of
    ``chunk`` (dead rows carry id −1 and are masked at scan time): every
    probe slot is then a *block-aligned* slice, which both simplifies
    masking and lets the Pallas scan kernel address chunks through plain
    BlockSpec index maps. Memory overhead ≈ nlist·chunk/2 rows.

    ``X`` may be a **numpy (host) array**: the permutation then runs
    host-side and only the training sample, per-segment assignment
    batches, and the final sorted database cross the host↔device link.
    This matters when that link is thin (measured on the axon tunnel:
    push 0.37 GB/s, pull 0.03 GB/s — a 10M×128 device→host pull alone is
    ~170 s). Device arrays keep the on-device permutation path.
    """
    import numpy as np

    is_host = isinstance(X, np.ndarray)
    n, d = X.shape
    nlist = n_clusters or auto_nlist(n)
    key = key if key is not None else jax.random.PRNGKey(0)
    if chunk is None:
        # probe granularity ~ the mean cell size (aligned-pad waste and
        # per-slot masking both grow when chunk >> cell)
        mean_cell = max(1, n // max(1, nlist))
        chunk = int(min(512, max(64, -(-int(1.3 * mean_cell) // 64) * 64)))
    chunk = min(chunk, max(64, n))

    # Faiss guidance: ≥39 training points per centroid; thin samples give
    # bad coarse quantizers and tank recall.
    train_size = min(n, max(train_size, 64 * nlist))
    if n <= train_size:
        train = jnp.asarray(X, jnp.float32)
    elif is_host:
        sel = np.random.default_rng(int(jax.random.randint(key, (), 0, 1 << 30))).choice(
            n, train_size, replace=False
        )
        train = jnp.asarray(X[np.sort(sel)], jnp.float32)
    else:
        train = jax.random.choice(key, X, (train_size,), replace=False)
    # the coarse quantizer uses random init (the Faiss convention): ++'s
    # sequential n_clusters-step seeding loop dominates build time at
    # nlist ≳ 4k and buys no recall for cell assignment
    centroids, _, _ = kmeans_fit(
        train, nlist, key, max_iter=kmeans_iters,
        init="random" if nlist >= 2048 else "++",
    )

    if is_host:
        labels_h = _assign_host_segmented(X, centroids)
        labels = None
        counts = jnp.asarray(
            np.bincount(labels_h, minlength=nlist).astype(np.int32)
        )
    else:
        labels = _assign_blockwise(X, centroids)
        labels_h = np.asarray(labels)  # (n,) int32 — small pull
        counts = jnp.zeros((nlist,), jnp.int32).at[labels].add(1)

    if align:
        counts_h = np.bincount(labels_h, minlength=nlist).astype(np.int64)
        padded = (np.ceil(counts_h / chunk).astype(np.int64) * chunk)
        offs_h = np.concatenate([[0], np.cumsum(padded)[:-1]]).astype(np.int64)
        total = int(padded.sum())
        # destination slot of each sorted row: cell base + rank within cell
        raw_offs = np.concatenate([[0], np.cumsum(counts_h)[:-1]])
        order_h = np.argsort(labels_h, kind="stable")
        lab_sorted = labels_h[order_h]
        within = np.arange(n) - raw_offs[lab_sorted]
        dest_h = offs_h[lab_sorted] + within
        if is_host or n * d * 4 > 1 << 30:
            # host permutation: zero device→host data pulls; one push
            Xs_h = np.zeros((total + chunk, d), np.float32)
            Xs_h[dest_h] = np.asarray(X)[order_h] if not is_host else X[order_h]
            ids_h = np.full((total + chunk,), -1, np.int32)
            ids_h[dest_h] = order_h
            X_sorted = jnp.asarray(Xs_h)
            ids_sorted = jnp.asarray(ids_h)
        else:
            dest = jnp.asarray(dest_h, jnp.int32)
            order = jnp.asarray(order_h, jnp.int32)
            X_sorted = jnp.zeros((total + chunk, d), X.dtype).at[dest].set(X[order])
            ids_sorted = (
                jnp.full((total + chunk,), -1, jnp.int32).at[dest].set(order)
            )
        offsets = jnp.asarray(offs_h, jnp.int32)
        return IVFIndex(centroids, X_sorted, ids_sorted, offsets, counts, chunk, n)

    order_h = np.argsort(labels_h, kind="stable")
    offsets = jnp.concatenate([jnp.zeros((1,), jnp.int32), jnp.cumsum(counts)[:-1]])
    order = jnp.asarray(order_h, jnp.int32)
    X_sorted = jnp.asarray(X)[order] if not is_host else jnp.asarray(X[order_h])
    ids_sorted = order
    # pad the tail so dynamic slices of length `chunk` never run off the end
    X_sorted = jnp.concatenate([X_sorted, jnp.zeros((chunk, d), X_sorted.dtype)], axis=0)
    ids_sorted = jnp.concatenate([ids_sorted, jnp.full((chunk,), -1, jnp.int32)])
    return IVFIndex(centroids, X_sorted, ids_sorted, offsets, counts, chunk, n)


def _assign_host_segmented(Xh, centroids, seg: int = 1 << 20):
    """Blockwise argmin assignment for a host-resident dataset.

    Pushes ``seg``-row batches to the device and pulls only the int32
    labels back — the dataset itself never crosses the link twice. Each
    segment is its own dispatch (bounded device time per call).
    """
    import numpy as np

    n = Xh.shape[0]
    out = np.empty((n,), np.int32)
    for a in range(0, n, seg):
        b = min(n, a + seg)
        out[a:b] = np.asarray(
            _assign_blockwise(jnp.asarray(Xh[a:b], jnp.float32), centroids)
        )
    return out


@jax.jit
def _assign_blockwise(X, centroids, block: int = 4096):
    n = X.shape[0]
    n_pad = -(-n // block) * block
    Xp = jnp.zeros((n_pad, X.shape[1]), X.dtype).at[:n].set(X)
    c_norm = jnp.sum(centroids * centroids, axis=-1)

    def process(b):
        Xb = lax.dynamic_slice_in_dim(Xp, b * block, block, axis=0)
        g = jnp.matmul(Xb, centroids.T, preferred_element_type=jnp.float32)
        D = sq_dists_from_gram(jnp.sum(Xb * Xb, -1), c_norm, g)
        return jnp.argmin(D, axis=1).astype(jnp.int32)

    return lax.map(process, jnp.arange(n_pad // block)).reshape(-1)[:n]


@functools.partial(
    jax.jit,
    static_argnames=(
        "k", "ncells", "budget", "block", "chunk", "m", "scan_precision", "scan_impl",
        "merge", "max_ch",
    ),
)
def _ivf_search(
    Qs, q_rows, index_arrays, k, ncells, budget, block, chunk, m, scan_precision,
    scan_impl="xla", merge="approx", max_ch=None,
):
    """The probe kernel. See the module docstring for the design rationale.

    ``ncells`` is the number of cells probed per query block; ``budget`` is
    the static number of ``chunk``-row scan slots the winning cells expand
    into (work ∝ budget·chunk rows per query).
    """
    centroids, X_sorted, ids_sorted, offsets, counts = index_arrays
    nq = Qs.shape[0]
    n_blocks = nq // block
    nlist = centroids.shape[0]
    n_total = X_sorted.shape[0] - chunk  # valid rows (tail is padding)
    c_norm = jnp.sum(centroids * centroids, axis=-1)
    per_query_probes = max(2, min(nlist, ncells // 2))
    if max_ch is None:
        max_ch = max(1, -(-int(budget) // max(1, ncells)) + 3)
    aligned = n_total % chunk == 0 and scan_impl != "slices"
    if aligned:
        X_r = X_sorted[:n_total].reshape(n_total // chunk, chunk, X_sorted.shape[1])
        ids_r = ids_sorted[:n_total].reshape(n_total // chunk, chunk)
    prec = {
        "default": lax.Precision.DEFAULT,
        "high": lax.Precision.HIGH,
        "highest": lax.Precision.HIGHEST,
    }[scan_precision]

    def process(b):
        Qb = lax.dynamic_slice_in_dim(Qs, b * block, block, axis=0)
        rows = lax.dynamic_slice_in_dim(q_rows, b * block, block, axis=0)
        qn = jnp.sum(Qb * Qb, axis=-1)
        gq = jnp.matmul(Qb, centroids.T, preferred_element_type=jnp.float32)
        Dc = sq_dists_from_gram(qn, c_norm, gq)  # (block, ncells_total)
        # Shared probe set by rank-weighted per-query voting: every query
        # nominates its nearest cells; the block probes the most-nominated.
        _, nom = lax.top_k(-Dc, per_query_probes)
        weights = 1.0 / (1.0 + jnp.arange(per_query_probes, dtype=jnp.float32))
        # dead queries (pad rows, negative ids) don't get a vote
        w_q = (rows >= 0).astype(jnp.float32)[:, None] * weights[None, :]
        votes = (
            jnp.zeros((nlist,), jnp.float32)
            .at[nom.reshape(-1)]
            .add(w_q.reshape(-1))
        )
        score = votes - jnp.min(Dc, axis=0) / 1e12
        _, cells = lax.top_k(score, ncells)  # vote-ordered winning cells

        # Expand vote-ordered cells into `budget` chunk slots, round-robin:
        # the top-voted cell (the block's home cell) gets ALL its chunks
        # first, then every other cell's 1st chunk, 2nd chunk, … — so a
        # tight budget truncates the deep tails of big low-priority cells
        # instead of dropping whole cells. All in (ncells · max_ch)-sized
        # index arithmetic; every scanned slot is productive.
        cnts = counts[cells]                              # (ncells,)
        nch = (cnts + (chunk - 1)) // chunk               # chunks per cell
        ci_g = jnp.tile(jnp.arange(ncells, dtype=jnp.int32), max_ch)
        w_g = jnp.repeat(jnp.arange(max_ch, dtype=jnp.int32), ncells)
        live = w_g < nch[ci_g]
        # priority: home cell (ci==0) first, then (chunk depth, vote rank)
        prio = jnp.where(
            ci_g == 0, w_g, max_ch + w_g * ncells + ci_g
        )
        prio = jnp.where(live, prio, jnp.iinfo(jnp.int32).max)
        order = jnp.argsort(prio)[:budget]                # tiny sort
        sel_ci = ci_g[order]
        sel_w = w_g[order]
        sel_live = live[order]
        slot_start = jnp.where(
            sel_live, offsets[cells[sel_ci]] + sel_w * chunk, n_total
        )  # (budget,); dead slots point at the padded tail
        slot_valid = jnp.where(sel_live, cnts[sel_ci] - sel_w * chunk, 0)

        # ONE gather of every probed row (contiguous chunk-length runs —
        # near-memcpy), then ONE query-block matmul. No per-slot loop: the
        # measured per-slot XLA overhead (~15 µs: fusion boundaries +
        # dynamic_update_slice handling) was the kernel's cost floor.
        row_idx = (slot_start[:, None] + jnp.arange(chunk)[None, :]).reshape(-1)
        if scan_impl == "slices":
            # dynamic-slice scan: the only formulation the TPU AOT compiler
            # accepts for databases over 4 GB (chunked jnp.take from such a
            # buffer crashes it; plain dynamic slices and small row gathers
            # are fine). ~1 s slower than the flat-gather path at 1M.
            def scan_slot(s, bufc):
                start = slot_start[s]
                Xc = lax.dynamic_slice_in_dim(X_sorted, start, chunk, 0)
                idc = lax.dynamic_slice_in_dim(ids_sorted, start, chunk, 0)
                gg = jnp.matmul(
                    Qb, Xc.T, preferred_element_type=jnp.float32, precision=prec
                )
                scx = jnp.sum(Xc * Xc, -1)[None, :] - 2.0 * gg
                inv = (
                    (jnp.arange(chunk)[None, :] >= slot_valid[s])
                    | (idc[None, :] < 0)
                    | (idc[None, :] == rows[:, None])
                )
                scx = scx + MASK_VALUE * inv.astype(scx.dtype)
                return lax.dynamic_update_slice(bufc, scx, (0, s * chunk))

            buf = lax.fori_loop(
                0, budget, scan_slot,
                jnp.full((block, budget * chunk), MASK_VALUE, jnp.float32),
            )
            if merge == "exact":
                neg, cidx = lax.top_k(-buf, m)
                vals = -neg
            else:
                vals, cidx = lax.approx_min_k(buf, m, recall_target=0.99)
            pos = row_idx[cidx]
            Xg = X_sorted[pos]
            diff = Qb[:, None, :] - Xg
            D2 = jnp.sum(diff * diff, axis=-1)
            D2 = jnp.where(vals >= MASK_VALUE * 0.5, MASK_VALUE, D2)
            negk, sel = lax.top_k(-D2, k)
            return -negk, ids_sorted[jnp.take_along_axis(pos, sel, axis=1)]

        if aligned:
            # chunk-aligned layout: gather WHOLE chunks (contiguous 100KB+
            # runs lower far better than a row gather of the same bytes).
            # Dead slots point past the last chunk — clamp: jnp.take's
            # default out-of-bounds FILL is NaN, which poisons the whole
            # buffer's reductions (their columns are masked regardless).
            cid = jnp.minimum(slot_start // chunk, n_total // chunk - 1)
            Xg_all = jnp.take(X_r, cid, axis=0).reshape(-1, X_sorted.shape[1])
            idg = jnp.take(ids_r, cid, axis=0).reshape(-1)
        else:
            Xg_all = X_sorted[row_idx]  # (budget·chunk, d)
            idg = ids_sorted[row_idx]
        col_dead = (
            jnp.arange(chunk)[None, :] >= slot_valid[:, None]
        ).reshape(-1)
        idg = jnp.where(col_dead, -1, idg)

        if scan_impl == "pallas":
            # fused scan + exact in-VMEM top-m (ops/pallas/ivf_kernel.py):
            # no (block, W) buffer, no separate selection pass
            from .pallas.ivf_kernel import ivf_scan_block_pallas

            vals, p = ivf_scan_block_pallas(
                Qb, rows, Xg_all, idg, m=m, chunk=chunk,
                scan_precision=scan_precision,
                interpret=jax.default_backend() == "cpu",
            )
            pos = row_idx[jnp.maximum(p, 0)]
        else:
            ng = jnp.sum(Xg_all * Xg_all, axis=-1)  # consistent with the
            # gathered rows by construction (and cheaper than a row gather)
            g = jnp.matmul(
                Qb, Xg_all.T, preferred_element_type=jnp.float32, precision=prec
            )
            sc = ng[None, :] - 2.0 * g  # rank-equivalent within each row
            invalid = (idg[None, :] < 0) | (idg[None, :] == rows[:, None])
            buf = sc + MASK_VALUE * invalid.astype(sc.dtype)
            if merge == "exact":
                # approx_min_k's ~(1-recall_target) per-item loss is its
                # contract; ≥99.9% end-to-end recall needs exact selection
                neg, cidx = lax.top_k(-buf, m)
                vals = -neg
            else:
                vals, cidx = lax.approx_min_k(buf, m, recall_target=0.99)
            pos = row_idx[cidx]         # (block, m): direct flat mapping

        # exact f32 re-rank of the m survivors (difference form: fused VPU,
        # no catastrophic cancellation, no norm gathers)
        Xg = X_sorted[pos]  # (block, m, d) row gather — ~50 GB/s, cheap
        diff = Qb[:, None, :] - Xg
        D2 = jnp.sum(diff * diff, axis=-1)
        D2 = jnp.where(vals >= MASK_VALUE * 0.5, MASK_VALUE, D2)
        negk, sel = lax.top_k(-D2, k)
        return -negk, ids_sorted[jnp.take_along_axis(pos, sel, axis=1)]

    d, i = lax.map(process, jnp.arange(n_blocks))
    # NOTE: returned 3D (n_blocks, block, k); the caller reshapes OUTSIDE
    # the jit — reshaping BOTH outputs inside this program crashes the TPU
    # AOT compiler at ≳10M-row shapes (bisected; either alone compiles)
    return d, i


def ivf_knn(
    X: jnp.ndarray | None,
    k: int = 15,
    nprobe: int = 12,
    n_clusters: int | None = None,
    index: IVFIndex | None = None,
    key=None,
    block: int = 256,
    exclude_self: bool = True,
    m: int | None = None,
    scan_precision: str = "high",
    budget: int | None = None,
    scan_impl: str = "xla",
    merge: str = "approx",
    seg_rows: int = 1 << 21,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Approximate self-kNN of X through an IVF index.

    Returns (dists, indices) of shape (n, k) in original row order.
    Pass a prebuilt ``index`` to amortize the build across calls.

    ``nprobe`` is the number of cells probed per query block (Faiss
    semantics); the scan work is ``budget`` fixed-size chunks (default:
    enough for nprobe average-sized cells, +2 slack), expanded greedily
    from the block's vote-ordered cells.

    Self-query fast path: the index stores X sorted by cell, which IS the
    cluster-coherent query order — no per-query assignment, argsort, or
    input gather (measured ~2.3 s of fixed overhead at 1M×128 when
    re-sorting queries from scratch).
    """
    import numpy as np

    if index is None:
        if X is None:
            raise ValueError("[TorchDR-TPU] ERROR : pass X or a prebuilt index.")
        index = ivf_build(X, n_clusters=n_clusters, key=key)
    # X itself is not needed beyond the build (the index holds the sorted
    # rows); callers at memory-bound scales pass X=None with a prebuilt
    # index so only one copy of the database is resident
    n = index.n
    arrays = (
        index.centroids, index.X_sorted, index.ids_sorted, index.offsets, index.counts,
    )
    chunk = index.chunk
    ncells_total = int(index.offsets.shape[0])
    nprobe = min(nprobe, ncells_total)
    counts_h = np.asarray(index.counts, np.float64)
    if budget is None:
        # expected chunks over the probed cells: cells are probed roughly
        # in proportion to their mass (queries live inside them), so use
        # the size-biased mean of per-cell chunk counts, plus slack
        total = counts_h.sum()
        if total > 0:
            sb_chunks = float(
                (counts_h * np.ceil(counts_h / chunk)).sum() / total
            )
        else:
            sb_chunks = 1.0
        budget = int(np.ceil(nprobe * max(1.0, sb_chunks)) + 4)
    budget = min(budget, (index.X_sorted.shape[0] - chunk) // chunk + 1)
    m_eff = m if m is not None else max(2 * k, 32)

    # Self-query fast path over the (possibly chunk-aligned) sorted layout:
    # dead pad rows (id −1) ride along as dead queries — they are excluded
    # from probe voting and their outputs are dropped by the scatter.
    total = index.X_sorted.shape[0] - chunk
    if (total + chunk) % block == 0:
        # zero-copy: the queries ARE the database buffer (its tail pad rows
        # ride along as dead queries). Slicing would duplicate the whole
        # database on device — fatal at 10M×128 (5.7 GB each).
        total = total + chunk
        Qs = index.X_sorted
        out_ids = index.ids_sorted
    else:
        n_pad = -(-total // block) * block
        Qs = index.X_sorted[:total]
        out_ids = index.ids_sorted[:total]
        if n_pad != total:
            Qs = jnp.concatenate(
                [Qs, jnp.full((n_pad - total, Qs.shape[1]), 1e12, Qs.dtype)]
            )
            out_ids = jnp.concatenate(
                [out_ids, jnp.full((n_pad - total,), -2, jnp.int32)]
            )
        total = Qs.shape[0]
    # exclusion ids: shifted out of range when self-matches are allowed,
    # negative (vote-dead) for pad rows either way
    q_rows = jnp.where(
        out_ids >= 0, out_ids + (0 if exclude_self else n), out_ids
    )

    # expansion depth must cover the BIGGEST cell, or large home cells
    # silently lose their tail chunks (observed as recall stuck across
    # nprobe increases)
    max_ch = int(np.ceil(float(np.max(counts_h)) / chunk)) if counts_h.size else 1
    if scan_impl == "xla" and index.X_sorted.nbytes > (4 << 30):
        scan_impl = "slices"  # chunked takes from >4GB buffers crash the
        # TPU AOT compiler; dynamic slices compile at any size

    # Host-level query segmentation: one dispatch over 10M queries keeps
    # the MXU saturated for minutes, which the TPU runtime treats as a
    # wedged worker and kills (same failure as the 1M exact tier —
    # docs/ROUND2_STATUS.md). Cap each dispatch at ~2M queries; every
    # segment reuses the same compiled program (identical static shapes;
    # a short tail segment is padded with dead queries).
    if total > seg_rows:
        seg_blocks = max(1, seg_rows // block)
        seg = seg_blocks * block
        d_parts, i_parts = [], []
        for a in range(0, total, seg):
            b = min(total, a + seg)
            Q_seg, r_seg = Qs[a:b], q_rows[a:b]
            if b - a < seg:  # pad the tail with dead queries
                pad = seg - (b - a)
                Q_seg = jnp.concatenate(
                    [Q_seg, jnp.full((pad, Q_seg.shape[1]), 1e12, Q_seg.dtype)]
                )
                r_seg = jnp.concatenate([r_seg, jnp.full((pad,), -2, jnp.int32)])
            ds, is_ = _ivf_search(
                Q_seg, r_seg, arrays, k, nprobe, budget, block, chunk, m_eff,
                scan_precision, scan_impl, merge, max_ch,
            )
            d_parts.append(ds.reshape(-1, k)[: b - a])
            i_parts.append(is_.reshape(-1, k)[: b - a])
        d = jnp.concatenate(d_parts, axis=0)
        i = jnp.concatenate(i_parts, axis=0)
    else:
        d, i = _ivf_search(
            Qs, q_rows, arrays, k, nprobe, budget, block, chunk, m_eff,
            scan_precision, scan_impl, merge, max_ch,
        )
        d = d.reshape(-1, k)
        i = i.reshape(-1, k)
    # scatter back to original row order; dead rows land in the spill slot
    scatter_ids = jnp.where(out_ids >= 0, out_ids, n)
    out_d = jnp.zeros((n + 1, k), d.dtype).at[scatter_ids].set(d[:total])
    out_i = jnp.zeros((n + 1, k), jnp.int32).at[scatter_ids].set(i[:total])
    return out_d[:n], out_i[:n]
