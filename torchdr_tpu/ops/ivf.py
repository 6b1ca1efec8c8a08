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
  feeding a candidate-score buffer. A merge stage pulls the top-m per
  query — ``approx_min_k`` for wide-chunk f32 indexes, the hierarchical
  exact "tournament" (per-slot top-t, then top-m of the survivors; exact
  for k ≤ t) for residual indexes — and an m-margin exact f32 re-rank
  (difference form, fused VPU) fixes the final ranks.

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
import numpy as np
from jax import lax

from ..utils.compile_cache import enable_compile_cache
from .metrics import MASK_VALUE, sq_dists_from_gram
from .kmeans import kmeans_fit


class IVFIndex(NamedTuple):
    centroids: jnp.ndarray   # (ncells, d)
    X_sorted: jnp.ndarray    # (n_pad + chunk, d) database rows grouped by cell
    # — f32, or the bf16 HIGH half under split-precision storage (below)
    ids_sorted: jnp.ndarray  # (n_pad + chunk,) original row ids (-1 padding)
    offsets: jnp.ndarray     # (ncells,) start of each cell in X_sorted
    counts: jnp.ndarray      # (ncells,) cell sizes
    chunk: int               # probe granularity (static slice length)
    n: int                   # number of real database rows
    X_lo: jnp.ndarray | None = None  # residual split-precision storage:
    # past the 4 GB chunk-take AOT limit the database is held as TWO bf16
    # planes of the CELL RESIDUAL r = x − centroid(cell(x)) — X_sorted is
    # r_hi = bf16(r), X_lo is r_lo = bf16(r − r_hi) — plus exact f32 row
    # norms (xnorm2). Residuals are small (within-cell offsets), so bf16's
    # relative rounding gives ~5× smaller ABSOLUTE score error than
    # quantizing raw rows (measured: raw-bf16 scan displaced true
    # neighbors past an m=64 margin → 96.4% recall at 10M; residuals keep
    # f32-grade ranks). The scan reads only r_hi (half the bytes of f32,
    # back under the 4 GB chunk-take AOT limit so the fast aligned path
    # stays usable); scores use q·x = q·c_cell (f32 centroid matmul) +
    # (q−c_home)·r (one bf16 MXU matmul) + c_home·r (f32 matvec); the
    # re-rank reconstructs x ≈ c + r_hi + r_lo to ~2⁻¹⁶ relative. Same
    # total bytes as f32 — NOT a second copy (the f32+bf16
    # double-residency OOM'd at 10M).
    xnorm2: jnp.ndarray | None = None  # (n_pad + chunk,) f32 |x|² under
    # residual storage (pad rows 0); None for plain f32 storage
    cells_sorted: jnp.ndarray | None = None  # (n_pad + chunk,) int32 cell
    # id per layout row under residual storage: one flat gather replaces a
    # per-use binary search over offsets (searchsorted lowered to ~10
    # chained gathers per lookup inside the hot block loop — measured
    # +2.7 s at 1M)
    super_centroids: jnp.ndarray | None = None  # (S, d) two-level coarse
    # quantizer: k-means of the centroids themselves. The per-block
    # nomination first picks the top-voted supers from an (block, S)
    # matmul, then scores only their member cells — the (block, nlist)
    # HIGH-precision matmul + nlist-wide approx_min_k that dominated the
    # width-independent per-block cost at nlist ≥ 8k (~39 s of the 10M
    # search) shrinks to S + n_supers·W wide.
    super_members: jnp.ndarray | None = None  # (S, W) int32 member cell ids
    # per super, −1 padding; W = padded max membership
    cell_adj: jnp.ndarray | None = None  # (ncells, P) int32 — each cell's P
    # nearest cells (self first). Self-kNN nomination reduces to the
    # adjacency rows of a block's home cells (known for free from the
    # sorted layout): candidate sets are ~100 wide and geometrically
    # exact, vs the (block, nlist) matmul + nlist-wide selection of flat
    # nomination (the measured fixed-cost floor at nlist ≥ 8k), or super
    # means that smear 40 natural clusters at 10M and cost ~9% recall.
    scales: jnp.ndarray | None = None  # (ncells, d) f32 dequantization
    # scales of the int8 compressed tier (storage="int8"): X_sorted holds
    # q = round(clip(r/s, ±127)) int8 where r = x − centroid(cell(x)) and
    # s[cell, dim] = max|r|/127 over the cell's rows. The TPU-native
    # answer to the reference's IVFPQ memory tier (torchdr/distance/
    # faiss.py:113-221): PQ's per-code ADC lookups are gather-bound and
    # hostile to the MXU, while per-cell-per-dim affine int8 keeps the
    # scan a dense matmul at ¼ the resident bytes of f32 — and, unlike
    # IVFPQ's 20-33% recall ceiling on clustered data
    # (reference benchmarks/faiss/BENCHMARK_RESULTS.md:11-13), int8
    # residuals hold ~98% recall even at 10M density. xnorm2 carries the
    # norms of the RECONSTRUCTED rows |c + s·q|², so scan scores are
    # exactly squared distances to the reconstructed points — consistent
    # quantized geometry (see _int8_quant_seg_jit for why exact norms
    # were a recall bug).


def auto_nlist(n: int) -> int:
    """Faiss-style heuristic (reference: faiss.py:335-342)."""
    return int(max(16, min(4 * (n ** 0.5), n / 39, 8192)))


def _balance_allocate(counts_h: np.ndarray, extras: int) -> np.ndarray:
    """Greedy water-filling of ``extras`` split centroids over cells.

    Each extra goes to the cell with the largest residual share
    count/(e+1) — minimizing the post-split maximum cell size. A cell
    never receives more extras than members−1 (can't split a c-row cell
    into more than c parts). Host-side; O(extras·log nlist).
    """
    import heapq

    e = np.zeros(counts_h.shape[0], np.int64)
    heap = [(-float(c), int(i)) for i, c in enumerate(counts_h) if c > 1]
    heapq.heapify(heap)
    for _ in range(int(extras)):
        if not heap:
            break
        _, i = heapq.heappop(heap)
        e[i] += 1
        if e[i] + 1 < counts_h[i]:
            heapq.heappush(heap, (-counts_h[i] / (e[i] + 1.0), i))
    return e


#: fallback device-memory budget for the build's 2×-data transient permute
#: (v5e HBM is 16 GB; leave headroom for XLA workspace + fragmentation)
_PERMUTE_HBM_BUDGET = 13 << 30


def _permute_hbm_budget() -> int:
    """Device HBM budget for the permute transient, from the runtime device
    when it reports memory stats (smaller-HBM devices would otherwise pick
    the 2×-data device path and OOM instead of falling back to host)."""
    try:
        stats = jax.local_devices()[0].memory_stats()
        limit = int(stats.get("bytes_limit", 0))
        if limit > 0:
            return limit - (3 << 30)  # XLA workspace + fragmentation headroom
    except Exception:
        pass
    return _PERMUTE_HBM_BUDGET


def _lloyd_means(X, labels_h: np.ndarray, centroids, is_host: bool):
    """One full-data Lloyd mean update; empty cells keep their centroid."""
    nlist, d = centroids.shape
    counts = np.bincount(labels_h, minlength=nlist).astype(np.float32)
    if is_host:
        try:
            import torch

            sums_t = torch.zeros((nlist, d), dtype=torch.float32)
            sums_t.index_add_(
                0, torch.from_numpy(labels_h.astype(np.int64)),
                torch.from_numpy(np.ascontiguousarray(X, np.float32)),
            )
            sums = jnp.asarray(sums_t.numpy())
        except ImportError:
            sums_h = np.zeros((nlist, d), np.float32)
            np.add.at(sums_h, labels_h, np.asarray(X, np.float32))
            sums = jnp.asarray(sums_h)
    else:
        sums = jax.ops.segment_sum(
            X.astype(jnp.float32), jnp.asarray(labels_h), num_segments=nlist
        )
    cnt = jnp.asarray(counts)[:, None]
    return jnp.where(cnt > 0, sums / jnp.maximum(cnt, 1.0),
                     centroids.astype(jnp.float32))


def ivf_build(
    X,
    n_clusters: int | None = None,
    key=None,
    train_size: int = 25_600,
    kmeans_iters: int = 25,
    chunk: int | None = None,
    align: bool = True,
    verbose: bool = False,
    split_bytes: int = 4 << 30,
    n_superlist: int | None = None,
    storage: str = "auto",
    balance_extra: int | None = None,
) -> IVFIndex:
    """Build the inverted file index (host-synced shapes; build once).

    ``balance_extra`` caps cell imbalance: after the first assignment the
    heaviest cells are split by seeding up to that many extra centroids
    from their own members (greedy water-filling on cell mass) and
    reassigning once. A sample-trained coarse quantizer otherwise leaves
    cells 25×+ the mean (10M×128 @ nlist=16384: max 16 224 rows = 127
    chunks), which eat the scan budget and lose their tail chunks under
    tight budgets. Default ``None`` = 0 (off): the round-5 10M A/B
    (docs/ROUND5_STATUS.md) showed the auto search budget covering the
    biggest cell reaches HIGHER recall at the same speed, while the
    split caps the plateau at 0.9988 — balance is for memory-bound
    tight-budget searches only.
    Role of Faiss's balanced-clustering guidance for IVF training
    (reference: torchdr/distance/faiss.py builds flat IVF with
    faiss-default kmeans; imbalance handling is left to nprobe there).

    ``storage`` selects the database representation:

    - ``"auto"`` (default): plain f32 rows, switching to the bf16
      residual split past ``split_bytes`` (f32-grade scan scores, scan
      bytes halved, same total resident bytes).
    - ``"f32"`` / ``"split"``: force either tier.
    - ``"int8"``: compressed tier — per-cell-per-dim affine int8 of the
      cell residuals (see :class:`IVFIndex`), ¼ the resident bytes of
      f32. The TPU-native role of the reference's IVFPQ
      (torchdr/distance/faiss.py:113-221) with a dense-matmul scan
      instead of gather-bound ADC lookups.

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
    import time as _time

    enable_compile_cache()
    _t0 = _time.perf_counter()
    _marks = []

    def _mark(name):
        if verbose:
            _marks.append((name, _time.perf_counter() - _t0))
            print(
                f"[ivf_build] {name}: +{_marks[-1][1] - (_marks[-2][1] if len(_marks) > 1 else 0.0):.1f}s "
                f"(t={_marks[-1][1]:.1f}s)",
                flush=True,
            )

    if storage not in ("auto", "f32", "split", "int8"):
        raise ValueError(f"[TorchDR-TPU] ERROR : unknown storage {storage!r}")
    if storage in ("split", "int8") and not align:
        raise ValueError(
            f"[TorchDR-TPU] ERROR : storage={storage!r} needs the "
            "chunk-aligned layout (align=True)."
        )
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
    centroids.block_until_ready()
    _mark("kmeans")

    # Device-resident big build: when the dataset + a second permute buffer
    # fit HBM, push ONCE (segmented) and keep everything on device — the
    # host-permute path crosses the thin axon link three times (assign
    # pushes + permuted push) and measured 400-650 s at 10M×128.
    x_bytes = n * X.shape[1] * 4
    hbm_budget = _permute_hbm_budget()
    if is_host and (1 << 30) < x_bytes and 2 * x_bytes + (1 << 30) < hbm_budget:
        X = _push_segmented(np.ascontiguousarray(X, np.float32))
        X.block_until_ready()
        is_host = False
        _mark("push dataset")

    def _assign(cent):
        if is_host:
            lab = _assign_host_segmented(X, cent)
        else:
            lab = np.asarray(_assign_blockwise(X, cent))  # small pull
        return lab, np.bincount(lab, minlength=cent.shape[0]).astype(np.int64)

    labels_h, counts_h64 = _assign(centroids)
    _mark("assign")

    if balance_extra is None:
        # Round-5 10M A/B (docs/ROUND5_STATUS.md "10M operating point"):
        # splitting fat cells recovers tight-budget recall (b70: 0.9922 →
        # 0.9988) but CAPS the recall plateau at 0.9988 (split siblings
        # fall outside nprobe) and costs build time, while covering the
        # biggest cell's depth with the search budget (the auto-budget
        # rule in _resolve_search_knobs) reaches 0.99913 at the SAME
        # 43.8 s search. Balance is therefore opt-in — for memory-bound
        # tight-budget searches only.
        balance_extra = 0
    balance_extra = int(min(balance_extra, max(0, n - nlist)))
    if balance_extra > 0:
        e = _balance_allocate(counts_h64, balance_extra)
        order0 = np.argsort(labels_h, kind="stable")
        raw = np.concatenate([[0], np.cumsum(counts_h64)[:-1]])
        seed_idx, seed_cell = [], []
        for i in np.nonzero(e)[0]:
            mem = order0[raw[i]: raw[i] + counts_h64[i]]
            pos = np.linspace(0, len(mem) - 1, e[i] + 2)[1:-1].astype(np.int64)
            pos = np.unique(pos)
            seed_idx.append(mem[pos])
            seed_cell.append(np.full(len(pos), i, np.int64))
        if seed_idx:
            seed_idx = np.concatenate(seed_idx)
            seed_cell = np.concatenate(seed_cell)
            prev_max = int(counts_h64.max())
            members = (
                jnp.asarray(np.ascontiguousarray(X[seed_idx], np.float32))
                if is_host
                else jnp.take(X, jnp.asarray(seed_idx, jnp.int32), axis=0)
            )
            # Seed at centroid + ε·(member − centroid), NOT at the member:
            # a tight cell's members live on a shell √d from its mean, so
            # every point is closer to the retained mean-centroid than to
            # any member (√d vs √2d) and a member-seeded split captures
            # nothing in high d. ε-cones through the centroid partition
            # the cell by projection direction at any dimension (the
            # Faiss big-cluster ε-split, generalized to e seeds whose
            # directions come from the cell's own members).
            home = centroids[jnp.asarray(seed_cell, jnp.int32)]
            seeds = home + 0.25 * (members.astype(jnp.float32) - home)
            centroids = jnp.concatenate(
                [centroids, seeds.astype(centroids.dtype)], axis=0
            )
            nlist = int(centroids.shape[0])
            labels_h, counts_h64 = _assign(centroids)
            # One full-data Lloyd step, then a final assignment: the cone
            # seeds sit ε from the old centroid, so their raw Voronoi
            # sectors cut straight through neighborhoods (measured: recall
            # 0.98 → 0.946 on the 6k CPU gate without this). The mean
            # update moves each seed to the center of the mass it
            # captured, turning angular sectors into spatial sub-clusters;
            # it also full-data-refines every OTHER centroid for free
            # (kmeans only ever saw the training sample).
            centroids = _lloyd_means(X, labels_h, centroids, is_host)
            labels_h, counts_h64 = _assign(centroids)
            if verbose:
                print(
                    f"[ivf_build] balance: +{len(seed_idx)} cells, "
                    f"max cell {prev_max} -> {int(counts_h64.max())}",
                    flush=True,
                )
            _mark("balance split")

    # Two-level coarse quantizer for hierarchical nomination: k-means the
    # centroids themselves into supers + fixed-width member lists. Cheap
    # (nlist points) and only worth carrying once nlist is in the
    # thousands (the per-block nomination cost it removes scales ~nlist).
    # Built AFTER the balance split so super membership covers the final
    # cell table; the contiguous-range relabel is applied to the labels.
    if n_superlist is None:
        n_superlist = max(32, nlist // 64) if nlist >= 1024 else 0
    if n_superlist and n_superlist < nlist:
        perm_s, supers, members = _build_supers(centroids, int(n_superlist), key)
        centroids = centroids[perm_s]  # relabel: supers = contiguous id ranges
        inv_perm = np.empty((nlist,), np.int64)
        inv_perm[np.asarray(perm_s)] = np.arange(nlist)
        labels_h = inv_perm[labels_h].astype(np.int32)
        counts_h64 = counts_h64[np.asarray(perm_s)]
        _mark("supers")
    else:
        supers = members = None
    cell_adj = _build_cell_adjacency(centroids)
    if cell_adj is not None:
        _mark("cell adjacency")

    counts = jnp.asarray(counts_h64.astype(np.int32))

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
        f32_bytes = (total + chunk) * d * 4
        want_split = storage == "split" or (
            storage == "auto" and f32_bytes > split_bytes
        )
        X_lo = xnorm2 = scales = None
        # per-row cell table: the residual scan needs it, and adjacency
        # nomination locates a block's home cells through it (4 bytes/row)
        cells_dev = jnp.asarray(_cells_of_layout(padded, chunk, nlist))
        if not is_host and f32_bytes <= (1 << 30):
            # small device path: one whole-array scatter
            dest = jnp.asarray(dest_h, jnp.int32)
            order = jnp.asarray(order_h, jnp.int32)
            X_sorted = jnp.zeros((total + chunk, d), X.dtype).at[dest].set(X[order])
            ids_sorted = (
                jnp.full((total + chunk,), -1, jnp.int32).at[dest].set(order)
            )
            if storage == "int8":
                X_sorted, scales, xnorm2 = _int8_quantize_device(
                    X_sorted.astype(jnp.float32), cells_dev, centroids,
                    ids_sorted,
                )
            elif want_split:
                cells_dev = jnp.asarray(_cells_of_layout(padded, chunk, nlist))
                X_sorted, X_lo, xnorm2 = _residual_split_device(
                    X_sorted.astype(jnp.float32), cells_dev, centroids
                )
        elif not is_host and 2 * f32_bytes + (1 << 30) < hbm_budget:
            # on-device permute: segmented gather+scatter into a donated
            # output buffer (peak ≈ 2×data + one segment — the single-shot
            # scatter's 3×-data transient OOM'd at 10M×128)
            ids_h = np.full((total + chunk,), -1, np.int32)
            ids_h[dest_h] = order_h
            X_sorted = _permute_device(X, order_h, dest_h, total + chunk, d)
            del X  # drop the unsorted copy before the split doubles buffers
            X_sorted.block_until_ready()
            ids_sorted = jnp.asarray(ids_h)
            _mark("device permute")
            if storage == "int8":
                X_sorted, scales, xnorm2 = _int8_quantize_device(
                    X_sorted, cells_dev, centroids, ids_sorted
                )
                X_sorted.block_until_ready()
                _mark("int8 quantize")
            elif want_split:
                cells_dev = jnp.asarray(_cells_of_layout(padded, chunk, nlist))
                X_sorted, X_lo, xnorm2 = _residual_split_device(
                    X_sorted, cells_dev, centroids
                )
                X_sorted.block_until_ready()
                _mark("residual split")
        else:
            # host permutation: zero device→host data pulls; one push.
            # Single scatter pass (dest-of-source, not gather-then-scatter),
            # through torch when available — its index_copy_ is
            # multithreaded; numpy fancy indexing is single-threaded and
            # measured 127 s on 10M×128.
            if is_host:
                Xh = X
            else:
                # device→host pull (only reached when the device permute's
                # 2×-data transient exceeds HBM): segmented like the push —
                # one monolithic pull degrades superlinearly on the tunnel
                Xh = _pull_segmented(X)
            # normalize dtype/layout once: covers f64 numpy inputs (np.random
            # default) for both the torch index_copy_ branch (which would
            # raise on dtype mismatch) and the numpy branch
            Xh = np.ascontiguousarray(Xh, np.float32)
            dest_src = np.empty((n,), np.int64)
            dest_src[order_h] = dest_h  # row j of X lands at dest_src[j]
            ids_h = np.full((total + chunk,), -1, np.int32)
            ids_h[dest_h] = order_h
            try:
                import torch

                out = torch.zeros((total + chunk, d), dtype=torch.float32)
                out.index_copy_(
                    0, torch.from_numpy(dest_src), torch.from_numpy(Xh)
                )
                Xs_h = out.numpy()
            except ImportError:
                Xs_h = np.zeros((total + chunk, d), np.float32)
                Xs_h[dest_src] = Xh
            _mark("host permute")
            if storage == "int8":
                cells_h = _cells_of_layout(padded, chunk, nlist)
                q8_h, scales_h, xn_h = _int8_quantize_host(
                    Xs_h, cells_h, np.asarray(centroids, np.float32), ids_h,
                    offs_h,
                )
                _mark("host int8 quantize")
                X_sorted = _push_segmented(q8_h)
                scales = jnp.asarray(scales_h)
                xnorm2 = jnp.asarray(xn_h)
                cells_dev = jnp.asarray(cells_h)
            elif want_split:
                # residual split on host (ml_dtypes bf16), push both
                # planes — same total bytes as the f32 push, half the
                # resident HBM and f32-grade scan scores (see IVFIndex)
                import ml_dtypes

                bf16 = ml_dtypes.bfloat16
                cells_h = _cells_of_layout(padded, chunk, nlist)
                cent_h = np.asarray(centroids, np.float32)
                xn_h = np.einsum("ij,ij->i", Xs_h, Xs_h).astype(np.float32)
                Xs_h -= cent_h[cells_h]
                hi_h = Xs_h.astype(bf16)
                lo_h = (Xs_h - hi_h.astype(np.float32)).astype(bf16)
                _mark("host residual split")
                X_sorted = _push_segmented(hi_h)
                X_lo = _push_segmented(lo_h)
                xnorm2 = jnp.asarray(xn_h)
                cells_dev = jnp.asarray(cells_h)
                X_lo.block_until_ready()
            else:
                X_sorted = _push_segmented(Xs_h)
            ids_sorted = jnp.asarray(ids_h)
            X_sorted.block_until_ready()
            _mark("push sorted db")
        offsets = jnp.asarray(offs_h, jnp.int32)
        return IVFIndex(
            centroids, X_sorted, ids_sorted, offsets, counts, chunk, n,
            X_lo, xnorm2, cells_dev, supers, members, cell_adj, scales,
        )

    order_h = np.argsort(labels_h, kind="stable")
    offsets = jnp.concatenate([jnp.zeros((1,), jnp.int32), jnp.cumsum(counts)[:-1]])
    order = jnp.asarray(order_h, jnp.int32)
    X_sorted = jnp.asarray(X)[order] if not is_host else jnp.asarray(X[order_h])
    ids_sorted = order
    # pad the tail so dynamic slices of length `chunk` never run off the end
    X_sorted = jnp.concatenate([X_sorted, jnp.zeros((chunk, d), X_sorted.dtype)], axis=0)
    ids_sorted = jnp.concatenate([ids_sorted, jnp.full((chunk,), -1, jnp.int32)])
    return IVFIndex(
        centroids, X_sorted, ids_sorted, offsets, counts, chunk, n,
        super_centroids=supers, super_members=members,
    )


def _pull_segmented(X, seg_bytes: int = 512 << 20) -> np.ndarray:
    """Device→host transfer in ~512 MB row slices (the monolithic pull
    degrades superlinearly on thin links, mirroring the push)."""
    n = X.shape[0]
    row_bytes = max(1, int(np.prod(X.shape[1:])) * X.dtype.itemsize)
    seg = max(1, seg_bytes // row_bytes)
    if n <= seg:
        return np.asarray(X)
    out = None
    for a in range(0, n, seg):
        seg_h = np.asarray(X[a : a + seg])
        if out is None:
            out = np.empty(X.shape, seg_h.dtype)
        out[a : a + seg] = seg_h
    return out


def _push_segmented(Xh, seg_bytes: int = 512 << 20):
    """Host→device transfer in ~512 MB slices + one device concat.

    Measured on the axon tunnel: a single push degrades superlinearly with
    size (1 GB → 0.37 GB/s, 2 GB → 0.16, 6.5 GB → 0.036); ~512 MB slices
    hold the per-slice rate, turning a 182 s push into ~20 s.
    """
    n = Xh.shape[0]
    row_bytes = max(1, int(np.prod(Xh.shape[1:])) * Xh.dtype.itemsize)
    seg = max(1, seg_bytes // row_bytes)
    if n <= seg:
        return jnp.asarray(Xh)
    parts = [jnp.asarray(Xh[a : a + seg]) for a in range(0, n, seg)]
    return jnp.concatenate(parts, axis=0)


@functools.partial(jax.jit, donate_argnums=(0,))
def _permute_seg_jit(out, X, order, dest):
    # out-of-range dest rows (segment tail padding) are dropped
    return out.at[dest].set(X[order], mode="drop")


def _permute_device(X, order_h, dest_h, out_rows, d, seg_bytes: int = 512 << 20):
    """Row permutation on device: ``out[dest] = X[order]`` in ~512 MB
    segments, donating ``out`` each step (peak HBM ≈ 2×data + 1 segment).
    One compile serves every segment (tails pad to out-of-range = drop)."""
    seg = max(1, seg_bytes // max(1, d * 4))
    nn = order_h.shape[0]
    out = jnp.zeros((out_rows, d), jnp.float32)
    for a in range(0, nn, seg):
        m = min(seg, nn - a)
        o = np.zeros((seg,), np.int32)
        dst = np.full((seg,), out_rows, np.int32)  # oob → dropped
        o[:m] = order_h[a : a + m]
        dst[:m] = dest_h[a : a + m]
        out = _permute_seg_jit(out, X, jnp.asarray(o), jnp.asarray(dst))
    return out


def _bf16_split(r):
    """Exact round-to-nearest (hi, lo) bf16 split of f32.

    The naive ``lo = r − f32(bf16(r))`` is UNSOUND under XLA: the TPU
    backend's excess-precision simplification elides f32→bf16→f32
    convert chains, compiling lo to bf16(r − r) = 0 — the residual
    plane silently stored zeros (bisected at 500k: reconstruction error
    was half a bf16 ulp, and scan_fidelity='full' ≡ 'hi' bit-for-bit).
    An optimization_barrier on hi keeps the simplifier from seeing
    through the round trip, preserving round-to-nearest hi (half the
    hi-plane error of a mantissa-truncation split — measurably better
    for the hi-only scan and approx-merge margins).
    """
    hi = lax.optimization_barrier(r.astype(jnp.bfloat16))
    return hi, (r - hi.astype(jnp.float32)).astype(jnp.bfloat16)


@functools.partial(jax.jit, donate_argnums=(0, 1, 2), static_argnames=("seg",))
def _residual_seg_jit(r_hi, r_lo, xn, x, cells, centroids, a, seg):
    """One segment of the residual split: r = x − c, bf16 hi/lo planes +
    exact f32 row norms, written in place (donated outputs)."""
    x_seg = lax.dynamic_slice_in_dim(x, a, seg, 0)
    c_seg = centroids[lax.dynamic_slice_in_dim(cells, a, seg, 0)]
    r = x_seg - c_seg
    hi, lo = _bf16_split(r)
    return (
        lax.dynamic_update_slice_in_dim(r_hi, hi, a, 0),
        lax.dynamic_update_slice_in_dim(r_lo, lo, a, 0),
        lax.dynamic_update_slice_in_dim(xn, jnp.sum(x_seg * x_seg, -1), a, 0),
    )


def _residual_split_device(x, cells, centroids, seg_bytes: int = 512 << 20):
    """f32 sorted rows → (r_hi, r_lo, xnorm2) residual planes, segmented
    (peak HBM ≈ data + both planes + one segment; one compile for all
    segments). The caller should drop its reference to ``x`` afterwards —
    the planes replace it."""
    n, d = x.shape
    seg = min(n, max(1, seg_bytes // max(1, d * 4)))
    r_hi = jnp.zeros((n, d), jnp.bfloat16)
    r_lo = jnp.zeros((n, d), jnp.bfloat16)
    xn = jnp.zeros((n,), jnp.float32)
    starts = list(range(0, n - seg, seg)) + [n - seg]  # tail re-covered
    for a in starts:
        r_hi, r_lo, xn = _residual_seg_jit(
            r_hi, r_lo, xn, x, cells, centroids, jnp.asarray(a, jnp.int32), seg
        )
    return r_hi, r_lo, xn


@functools.partial(jax.jit, donate_argnums=(0,), static_argnames=("seg",))
def _int8_scale_seg_jit(scales, x, cells, centroids, ids, a, seg):
    """Accumulate per-(cell, dim) max|r| over one row segment (pad rows,
    id < 0, are excluded — their residual is −centroid, not data)."""
    x_seg = lax.dynamic_slice_in_dim(x, a, seg, 0)
    c_seg = lax.dynamic_slice_in_dim(cells, a, seg, 0)
    ids_seg = lax.dynamic_slice_in_dim(ids, a, seg, 0)
    r = jnp.abs(x_seg - centroids[c_seg])
    r = jnp.where((ids_seg >= 0)[:, None], r, 0.0)
    return scales.at[c_seg].max(r)


@functools.partial(jax.jit, donate_argnums=(0, 1), static_argnames=("seg",))
def _int8_quant_seg_jit(q8, xn, x, cells, centroids, scales, a, seg):
    """Quantize one row segment: q = round(clip(r/s, ±127)) int8, plus the
    f32 norms of the RECONSTRUCTED rows |c + s·q|² (written in place,
    donated outputs).

    Reconstructed — NOT exact — norms are load-bearing: the scan scores
    |x|² − 2·q·x_quant, and an exact |x|² against a quantized cross term
    injects a per-row bias ~2·x·ε that swamps the tiny neighbor gaps of
    dense sets (measured round 4 at 10M: 88.8% recall with exact norms vs
    the quantizer's own 98.2% ceiling — `benchmarks/_int8_ceiling.py`
    scores against the reconstructed points CONSISTENTLY and recovers
    it). With |c + s·q|² the score is exactly the squared distance to the
    reconstructed point (plus the per-query constant), i.e. unbiased
    nearest-neighbor ordering in the quantized geometry."""
    x_seg = lax.dynamic_slice_in_dim(x, a, seg, 0)
    c_seg = lax.dynamic_slice_in_dim(cells, a, seg, 0)
    cent_seg = centroids[c_seg]
    r = x_seg - cent_seg
    q = jnp.clip(jnp.round(r / scales[c_seg]), -127.0, 127.0).astype(jnp.int8)
    recon = cent_seg + q.astype(jnp.float32) * scales[c_seg]
    return (
        lax.dynamic_update_slice_in_dim(q8, q, a, 0),
        lax.dynamic_update_slice_in_dim(xn, jnp.sum(recon * recon, -1), a, 0),
    )


def _int8_quantize_device(x, cells, centroids, ids, seg_bytes: int = 512 << 20):
    """f32 sorted rows → (q8, scales, xnorm2) int8 compressed tier,
    segmented (two passes: per-cell max|residual| scales, then quantize).
    The caller should drop its reference to ``x`` afterwards."""
    n, d = x.shape
    nlist = centroids.shape[0]
    seg = min(n, max(1, seg_bytes // max(1, d * 4)))
    starts = list(range(0, n - seg, seg)) + [max(0, n - seg)]  # tail re-covered
    scales = jnp.zeros((nlist, d), jnp.float32)
    for a in starts:
        scales = _int8_scale_seg_jit(
            scales, x, cells, centroids, ids, jnp.asarray(a, jnp.int32), seg
        )
    scales = jnp.maximum(scales, 1e-12) / 127.0
    q8 = jnp.zeros((n, d), jnp.int8)
    xn = jnp.zeros((n,), jnp.float32)
    for a in starts:
        q8, xn = _int8_quant_seg_jit(
            q8, xn, x, cells, centroids, scales, jnp.asarray(a, jnp.int32), seg
        )
    return q8, scales, xn


def _int8_quantize_host(Xs_h, cells_h, cent_h, ids_h, offs_rows):
    """Host-side int8 quantization of the aligned sorted layout.

    ``offs_rows`` are the per-cell row starts in the layout (int64);
    per-cell max|r| runs via ``np.maximum.reduceat`` over the sorted rows
    (ufunc.at is single-element and measured minutes at 10M). Pad rows are
    zeroed in the residual first, so they cannot pollute the scales; empty
    cells pick up a neighboring row's stats (reduceat's empty-segment
    convention), which is harmless — they are never probed."""
    R = Xs_h - cent_h[cells_h]
    R[ids_h < 0] = 0.0
    idx = np.minimum(offs_rows, max(0, R.shape[0] - 1)).astype(np.intp)
    scales = np.maximum.reduceat(np.abs(R), idx, axis=0).astype(np.float32)
    scales = np.maximum(scales, 1e-12) / 127.0
    q8 = np.clip(np.round(R / scales[cells_h]), -127, 127).astype(np.int8)
    # reconstructed-row norms, NOT exact norms — see _int8_quant_seg_jit
    recon = cent_h[cells_h] + q8.astype(np.float32) * scales[cells_h]
    xn = np.einsum("ij,ij->i", recon, recon).astype(np.float32)
    return q8, scales, xn


def _build_supers(centroids, S: int, key):
    """Two-level quantizer with EQUAL-SIZE supers via cell relabeling.

    Returns ``(perm, super_centroids, super_members)`` where ``perm``
    reorders the cell centroids geographically (k-means super label, then
    distance-to-super within each label) and the supers are consecutive
    equal-size groups of the REORDERED cells. The caller must apply
    ``centroids = centroids[perm]`` — cell ids then run contiguously
    within each super, so member lists are balanced by construction
    (plain k-means membership measured max/mean = 8.5× at nlist=16384,
    inflating the member-union matmul past the flat path's cost) and the
    member-centroid gathers are contiguous. A group straddling two
    k-means supers gets a smeared centroid; those are a ≤ S/nlist
    minority and the per-query multi-super vote absorbs them.
    """
    sup_c, labels, _ = kmeans_fit(
        centroids, S, jax.random.fold_in(key, 7), max_iter=25,
        init="random" if S >= 2048 else "++",
    )
    cent_h = np.asarray(centroids, np.float32)
    sup_h = np.asarray(sup_c, np.float32)
    nlist, d = cent_h.shape
    # Capacity-constrained assignment: keep k-means geometry (truncating
    # to equal-size groups smeared group centroids and cost ~4% recall at
    # test geometry) but cap membership at 1.25× the mean so the member
    # union stays narrow. Most-constrained cells (largest best-vs-second
    # gap) pick first; each takes its nearest super with a free slot.
    cap = -(-int(np.ceil(nlist / S * 1.25)) // 4) * 4
    Dm = (
        (cent_h * cent_h).sum(1)[:, None]
        + (sup_h * sup_h).sum(1)[None, :]
        - 2.0 * cent_h @ sup_h.T
    )
    pref = np.argsort(Dm, axis=1)
    gap = Dm[np.arange(nlist), pref[:, 1]] - Dm[np.arange(nlist), pref[:, 0]]
    counts = np.zeros((S,), np.int64)
    assigned = np.empty((nlist,), np.int64)
    for c in np.argsort(-gap):
        for s in pref[c]:
            if counts[s] < cap:
                assigned[c] = s
                counts[s] += 1
                break
    # relabel cells contiguously by (super, distance-to-super): member
    # lists become dense id ranges and the cell id space is geographic
    d_own = Dm[np.arange(nlist), assigned]
    perm = np.lexsort((d_own, assigned))
    a_sorted = assigned[perm]
    members = np.full((S, cap), -1, np.int32)
    starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
    new_ids = np.arange(nlist, dtype=np.int32)
    for s in range(S):
        members[s, : counts[s]] = new_ids[starts[s] : starts[s] + counts[s]]
    # super centroid = mean of actual members (post-capacity)
    cent_sorted = cent_h[perm]
    sums = np.add.reduceat(
        cent_sorted, np.minimum(starts, nlist - 1), axis=0
    ) * (counts > 0)[:, None]
    sup_means = (sums / np.maximum(counts, 1)[:, None]).astype(np.float32)
    return jnp.asarray(perm), jnp.asarray(sup_means), jnp.asarray(members)


def _build_cell_adjacency(centroids, P: int | None = None):
    """(ncells, P) nearest-cell table (self first) for adjacency
    nomination; None below the size where flat nomination is already
    cheap."""
    nlist = centroids.shape[0]
    if nlist < 256:
        return None
    P = P or min(64, int(nlist))
    from .distance import knn_graph

    _, adj = knn_graph(
        centroids, k=P, exclude_diag=False, block_size=1024,
        precision="highest",
    )
    return adj


def _cells_of_layout(padded_h, chunk, nlist):
    """Host: cell id of every row slot in the aligned sorted layout."""
    cells_h = np.repeat(np.arange(nlist, dtype=np.int32), padded_h)
    return np.concatenate([cells_h, np.full((chunk,), max(0, nlist - 1), np.int32)])


def _assign_host_segmented(Xh, centroids, seg: int = 1 << 20):
    """Blockwise argmin assignment for a host-resident dataset.

    Pushes ``seg``-row batches to the device and pulls only the int32
    labels back — the dataset itself never crosses the link twice. Each
    segment is its own dispatch (bounded device time per call); the tail
    segment is zero-padded to the same shape so the whole pass compiles
    exactly once (a second remote compile costs more than the padding).
    """
    n = Xh.shape[0]
    if n <= seg:
        return np.asarray(
            _assign_blockwise(jnp.asarray(Xh, jnp.float32), centroids)
        )
    out = np.empty((n,), np.int32)
    for a in range(0, n, seg):
        b = min(n, a + seg)
        Xs = Xh[a:b]
        if b - a < seg:
            Xs = np.concatenate(
                [Xs, np.zeros((seg - (b - a), Xh.shape[1]), np.float32)]
            )
        out[a:b] = np.asarray(
            _assign_blockwise(jnp.asarray(Xs, jnp.float32), centroids)
        )[: b - a]
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


def _ivf_search_impl(
    Qs, q_rows, index_arrays, k, ncells, budget, block, chunk, m, scan_precision,
    scan_impl="xla", merge="approx", max_ch=None, Qs_lo=None, pos0=0,
    scan_fidelity="full", n_supers=0, queries_raw=False, nominate="flat",
    q_cells=None, rerank=True, budget_order="depth", queries_exact=False,
):
    """The probe kernel. See the module docstring for the design rationale.

    ``ncells`` is the number of cells probed per query block; ``budget`` is
    the static number of ``chunk``-row scan slots the winning cells expand
    into (work ∝ budget·chunk rows per query). Under residual
    split-precision storage ``X_sorted``/``X_lo`` are the bf16 hi/lo
    planes of r = x − c_cell and ``xnorm2`` the exact f32 |x|²; queries
    (= database rows on the self-query path, located at absolute layout
    position ``pos0 + i``) and re-rank rows reconstruct x = c + hi + lo.
    """
    (centroids, X_sorted, ids_sorted, offsets, counts, X_lo, xnorm2,
     cells_sorted, super_centroids, super_members, cell_adj,
     scales) = index_arrays
    int8_storage = scales is not None
    use_supers = (
        nominate == "supers" and n_supers > 0 and super_centroids is not None
    )
    if use_supers:
        S, memb_w = super_members.shape
        n_supers = min(n_supers, S)
        s_norm = jnp.sum(super_centroids * super_centroids, axis=-1)
        if n_supers * memb_w < ncells or n_supers >= S:
            use_supers = False  # member union too thin to pick ncells cells
    use_adj = (
        nominate == "adjacency"
        and cell_adj is not None
        and (q_cells is not None or cells_sorted is not None)
        and cell_adj.shape[1] >= ncells
    )
    residual = xnorm2 is not None
    nq = Qs.shape[0]
    n_blocks = nq // block
    nlist = centroids.shape[0]
    n_total = X_sorted.shape[0] - chunk  # valid rows (tail is padding)
    c_norm = jnp.sum(centroids * centroids, axis=-1)
    # every query nominates ~ncells cells: with fewer (ncells//2) the
    # block vote rescued shared home cells but boundary queries' private
    # cells fell below the cut — measured as a flat ~0.6% recall loss
    # that raising nprobe did NOT fix (10M round G)
    per_query_probes = max(2, min(nlist, ncells))
    if max_ch is None:
        max_ch = max(1, -(-int(budget) // max(1, ncells)) + 3)
    aligned = n_total % chunk == 0 and scan_impl == "xla"
    if aligned:
        X_r = X_sorted[:n_total].reshape(n_total // chunk, chunk, X_sorted.shape[1])
        ids_r = ids_sorted[:n_total].reshape(n_total // chunk, chunk)
        if residual:
            xn_r = xnorm2[:n_total].reshape(n_total // chunk, chunk)
            if X_lo is not None:
                X_lo_r = X_lo[:n_total].reshape(
                    n_total // chunk, chunk, X_lo.shape[1]
                )
    if int8_storage and n_total % chunk != 0:
        raise NotImplementedError(
            "[TorchDR-TPU] int8 storage requires the chunk-aligned layout."
        )
    prec = {
        "default": lax.Precision.DEFAULT,
        "high": lax.Precision.HIGH,
        "highest": lax.Precision.HIGHEST,
    }[scan_precision]

    def cell_of(pos):
        """Cell id of an absolute layout position (aligned layout only) —
        one flat gather from the per-row cell table (a searchsorted here
        lowered to ~10 chained gathers inside the hot block loop and
        measured +2.7 s at 1M)."""
        return cells_sorted[pos]

    def rows_f32(pos):
        """Gather database rows at full precision (c + hi + lo under
        residual split storage; c + s·q under int8 — the best
        reconstruction the compressed tier has)."""
        Xg = X_sorted[pos].astype(jnp.float32)
        if int8_storage:
            Xg = Xg * scales[cell_of(pos)]
        if X_lo is not None:
            Xg = Xg + X_lo[pos].astype(jnp.float32)
        if residual:
            Xg = Xg + centroids[cell_of(pos)]
        return Xg

    def process(b):
        Qb = lax.dynamic_slice_in_dim(Qs, b * block, block, axis=0).astype(
            jnp.float32
        )
        if Qs_lo is not None:
            Qb = Qb + lax.dynamic_slice_in_dim(
                Qs_lo, b * block, block, axis=0
            ).astype(jnp.float32)
        if residual and not queries_raw and not queries_exact:
            # self-queries are residual rows: dequantize (int8) and add
            # back their cell centroid. With queries_exact the caller
            # gathered the ORIGINAL f32 rows into layout order (asymmetric
            # scoring): skip reconstruction and score exact queries
            # against the quantized database — measured +0.4% recall at
            # the int8 quantizer ceiling for free (the scan is
            # selection-bound).
            q_pos = pos0 + b * block + jnp.arange(block, dtype=jnp.int32)
            if int8_storage:
                Qb = Qb * scales[cell_of(q_pos)]
            Qb = Qb + centroids[cell_of(q_pos)]
        rows = lax.dynamic_slice_in_dim(q_rows, b * block, block, axis=0)
        qn = jnp.sum(Qb * Qb, axis=-1)
        weights = 1.0 / (1.0 + jnp.arange(per_query_probes, dtype=jnp.float32))
        # dead queries (pad rows, negative ids) don't get a vote
        alive = (rows >= 0).astype(jnp.float32)
        w_q = alive[:, None] * weights[None, :]
        members = None
        if use_adj:
            # Adjacency nomination: a block's candidate cells are the
            # precomputed nearest-cell lists of its HOME cells — known for
            # free from the sorted layout (self queries) or the assignment
            # labels (raw queries). ~n_home·P wide, geometrically exact;
            # kills the (block, nlist) matmul + nlist-wide selection that
            # was the per-block fixed-cost floor at nlist ≥ 8k, without
            # the super-mean smearing that cost ~9% recall at 10M.
            P_adj = cell_adj.shape[1]
            if queries_raw:
                # raw queries are only sorted by cell: a block can span
                # several cells, so sample more home positions than the
                # chunk-aligned self-query path needs
                n_home = min(8, block)
                samp = b * block + jnp.arange(n_home) * (block // n_home)
                home = q_cells[samp]
            else:
                n_home = max(1, block // chunk)
                samp = pos0 + b * block + jnp.arange(n_home) * chunk
                home = cells_sorted[jnp.minimum(samp, cells_sorted.shape[0] - 1)]
            cand = jnp.sort(cell_adj[home].reshape(-1))  # (n_home·P,)
            dup = jnp.concatenate(
                [jnp.zeros((1,), bool), cand[1:] == cand[:-1]]
            )
            members = jnp.where(dup, -1, cand)
        elif use_supers:
            # Two-level nomination: pick the block's top-voted SUPERS from
            # an (block, S) matmul, then score only their member cells.
            gqs = jnp.matmul(
                Qb, super_centroids.T, preferred_element_type=jnp.float32,
                precision=lax.Precision.HIGH,
            )
            Dcs = sq_dists_from_gram(qn, s_norm, gqs)  # (block, S)
            k_sup = min(4, S)
            _, nom_s = lax.approx_min_k(Dcs, k_sup, recall_target=0.995)
            w_s = alive[:, None] * (
                1.0 / (1.0 + jnp.arange(k_sup, dtype=jnp.float32))
            )[None, :]
            votes_s = (
                jnp.zeros((S,), jnp.float32)
                .at[nom_s.reshape(-1)]
                .add(w_s.reshape(-1))
            )
            votes_s = votes_s - jnp.min(Dcs, axis=0) / 1e12
            _, top_s = lax.top_k(votes_s, n_supers)
            members = super_members[top_s].reshape(-1)  # (M,) −1 pads

        if members is not None:
            # shared member-union scoring: exact per-query distances to the
            # candidate cells, rank-weighted voting, vote-ordered top-ncells
            mvalid = members >= 0
            mem = jnp.maximum(members, 0)
            gq_m = jnp.matmul(
                Qb, centroids[mem].T, preferred_element_type=jnp.float32,
                precision=lax.Precision.HIGH,
            )  # (block, M)
            Dc = sq_dists_from_gram(qn, c_norm[mem], gq_m)
            Dc = Dc + MASK_VALUE * (~mvalid)[None, :].astype(Dc.dtype)
            if Dc.shape[1] <= 1024:
                _, nom = lax.top_k(-Dc, per_query_probes)
            else:
                _, nom = lax.approx_min_k(
                    Dc, per_query_probes, recall_target=0.995
                )
            votes = (
                jnp.zeros((mem.shape[0],), jnp.float32)
                .at[nom.reshape(-1)]
                .add(w_q.reshape(-1))
            )
            votes = jnp.where(mvalid, votes, -1.0)
            score = votes - jnp.min(Dc, axis=0) / 1e12
            sv, msel = lax.top_k(score, ncells)  # vote-ordered member slots
            cells = mem[msel]
            # a slot that fell on member padding (possible only when the
            # union has < ncells valid cells) must scan nothing
            cells_valid = sv > -0.5
            gq_cells = jnp.take_along_axis(
                gq_m, jnp.broadcast_to(msel[None, :], (block, ncells)), axis=1
            )  # (block, ncells) — the residual path's q·c_cell term
        else:
            # HIGH precision: under residual storage gq enters the scan
            # scores (q·c_cell term), where default bf16 rounding of
            # large-magnitude rows would swamp within-cell distance gaps
            gq = jnp.matmul(
                Qb, centroids.T, preferred_element_type=jnp.float32,
                precision=lax.Precision.HIGH,
            )
            Dc = sq_dists_from_gram(qn, c_norm, gq)  # (block, ncells_total)
            # Shared probe set by rank-weighted per-query voting: every
            # query nominates its nearest cells; the block probes the
            # most-nominated. approx_min_k: nomination tolerates binning
            # noise (votes aggregate over the block), and exact top_k over
            # nlist-wide rows was the per-block cost floor at nlist ≥ 8k
            # (~0.9 ms/block = ~35 s over a 10M-query search at
            # nlist=16384).
            _, nom = lax.approx_min_k(Dc, per_query_probes, recall_target=0.995)
            votes = (
                jnp.zeros((nlist,), jnp.float32)
                .at[nom.reshape(-1)]
                .add(w_q.reshape(-1))
            )
            score = votes - jnp.min(Dc, axis=0) / 1e12
            _, cells = lax.top_k(score, ncells)  # vote-ordered winning cells
            cells_valid = jnp.ones((ncells,), bool)
            gq_cells = jnp.take(gq, cells, axis=1)

        # Expand vote-ordered cells into `budget` chunk slots. The home
        # cell (vote rank 0) gets ALL its chunks first, then every other
        # cell's 1st chunk in vote order (each probed cell is represented).
        # Remaining depth is ordered per ``budget_order``:
        #   "depth" (default): round-robin (1st chunks, 2nd chunks, …) —
        #     a tight budget loses a random row fraction of every probed
        #     cell. Measured BEST at 10M geometry: budget=70 recall 99.46%
        #     vs rank's 99.21%, budget=128 99.97% vs rank's 99.69%
        #     (ROUND3_STATUS r3k sweep) — when cells span many chunks the
        #     far cells' first chunks carry more neighbor mass than the
        #     near cells' deep tails.
        #   "rank": rank-major — near cells get their FULL depth before
        #     far cells get any more. Wins at FEW-chunks-per-cell
        #     geometries (CPU test: 0.8734 vs 0.8476 at 2/3 budget);
        #     loses at 10M. Opt-in.
        # All in (ncells · max_ch)-sized index arithmetic; every scanned
        # slot is productive.
        cnts = jnp.where(cells_valid, counts[cells], 0)   # (ncells,)
        nch = (cnts + (chunk - 1)) // chunk               # chunks per cell
        ci_g = jnp.tile(jnp.arange(ncells, dtype=jnp.int32), max_ch)
        w_g = jnp.repeat(jnp.arange(max_ch, dtype=jnp.int32), ncells)
        live = w_g < nch[ci_g]
        if budget_order == "rank":
            prio = jnp.where(
                ci_g == 0,
                w_g,
                jnp.where(
                    w_g == 0,
                    max_ch + ci_g,
                    max_ch + ncells + ci_g * max_ch + w_g,
                ),
            )
        else:
            # priority: home cell first, then (chunk depth, vote rank)
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
                Xc = lax.dynamic_slice_in_dim(X_sorted, start, chunk, 0).astype(
                    jnp.float32
                )
                if int8_storage:
                    Xc = Xc * scales[cells[sel_ci[s]]][None, :]
                if X_lo is not None:
                    Xc = Xc + lax.dynamic_slice_in_dim(
                        X_lo, start, chunk, 0
                    ).astype(jnp.float32)
                if residual:
                    # slots never cross cells (aligned layout): one
                    # centroid reconstructs the slot's rows
                    Xc = Xc + centroids[cells[sel_ci[s]]][None, :]
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
            Xg = rows_f32(pos)
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
            # 'rows': flat row gather. Works on >4 GB buffers (the 3D
            # whole-chunk take crashes the TPU AOT compiler there; plain
            # row gathers — like the re-rank's — compile and run fine).
            Xg_all = X_sorted[row_idx]  # (budget·chunk, d)
            idg = ids_sorted[row_idx]
        col_dead = (
            jnp.arange(chunk)[None, :] >= slot_valid[:, None]
        ).reshape(-1)
        idg = jnp.where(col_dead, -1, idg)

        if residual:
            # Residual scoring: q·x = q·c_col (f32, from the centroid
            # matmul already computed for voting) + (q−c_home)·r (bf16 MXU
            # matmuls) + c_home·r (f32 matvec). |x|² is exact f32 from the
            # index. With scan_fidelity="full" the cross terms qc_hi·r_lo
            # and qc_lo·r_hi ride along (THREE 1-pass bf16 matmuls + the
            # r_lo plane gather): scores are f32-equivalent even for
            # k-means cells that straddle two natural clusters, whose
            # residual coords are ~±10 rather than ~±1 — measured as a
            # flat ~0.5% recall loss under hi-only scoring that neither
            # nprobe nor the m-margin recovered (2M/10M diagnostics).
            if aligned:
                xn_g = jnp.take(xn_r, cid, axis=0).reshape(-1)
                Xg_lo = (
                    jnp.take(X_lo_r, cid, axis=0).reshape(-1, X_lo.shape[1])
                    if scan_fidelity == "full" and X_lo is not None else None
                )
            else:
                xn_g = xnorm2[row_idx]
                Xg_lo = (
                    X_lo[row_idx]
                    if scan_fidelity == "full" and X_lo is not None else None
                )
            c_home = centroids[cells[0]]
            qc32 = Qb - c_home[None, :]
            if int8_storage:
                # int8 dequantization: slots never cross cells (aligned
                # layout), so ONE per-slot scale row broadcasts over the
                # slot's chunk. The dequantized plane is a per-block VMEM
                # transient; HBM-resident bytes stay int8 (the point of
                # the tier). The matmul MUST honor the resolved scan
                # precision: a DEFAULT (single-pass bf16) contraction
                # truncates the f32 query mantissa and pins recall at the
                # known bf16-scan ceiling (~88% at 10M — measured round 4:
                # int8 recall sat at 0.884 flat across budget/nprobe while
                # the quantizer's own ceiling was 0.982; HIGH costs no
                # wall-clock because the 10M search is selection-bound).
                s_slot = scales[cells[sel_ci]]  # (n_slots, d) — n_slots is
                # min(budget, ncells·max_ch), NOT budget
                Xg_f = (
                    Xg_all.astype(jnp.float32).reshape(
                        slot_start.shape[0], chunk, X_sorted.shape[1]
                    ) * s_slot[:, None, :]
                ).reshape(-1, X_sorted.shape[1])
                g1 = jnp.matmul(
                    qc32, Xg_f.T, preferred_element_type=jnp.float32,
                    precision=prec,
                )
                g2 = jnp.matmul(Xg_f, c_home, precision=prec)  # (W,)
            else:
                # _bf16_split, NOT .astype pairs: XLA elides f32→bf16→f32
                # convert chains, which would zero qc_lo (see _bf16_split)
                qc, qc_lo = _bf16_split(qc32)
                g1 = jnp.matmul(qc, Xg_all.T, preferred_element_type=jnp.float32)
                g2 = jnp.matmul(Xg_all.astype(jnp.float32), c_home)  # (W,)
            if Xg_lo is not None:
                g1 = (
                    g1
                    + jnp.matmul(qc, Xg_lo.T, preferred_element_type=jnp.float32)
                    + jnp.matmul(qc_lo, Xg_all.T, preferred_element_type=jnp.float32)
                )
                g2 = g2 + jnp.matmul(Xg_lo.astype(jnp.float32), c_home)
            gq_sel = jnp.take(gq_cells, sel_ci, axis=1)   # (block, budget)
            gq_exp = jnp.repeat(gq_sel, chunk, axis=1)    # (block, W)
            sc = xn_g[None, :] - 2.0 * (g1 + g2[None, :] + gq_exp)
        else:
            # norms in f32 regardless of the scan buffer dtype (bf16
            # accumulation would swamp the m-margin)
            Xg32 = Xg_all.astype(jnp.float32)
            ng = jnp.sum(Xg32 * Xg32, axis=-1)  # consistent with the
            # gathered rows by construction (and cheaper than a row gather)
            g = jnp.matmul(
                Qb.astype(Xg_all.dtype), Xg_all.T,
                preferred_element_type=jnp.float32, precision=prec,
            )
            sc = ng[None, :] - 2.0 * g  # rank-equivalent within each row

        invalid = (idg[None, :] < 0) | (idg[None, :] == rows[:, None])
        buf = sc + MASK_VALUE * invalid.astype(sc.dtype)
        if merge == "exact":
            # approx_min_k's ~(1-recall_target) per-item loss is its
            # contract; ≥99.9% end-to-end recall needs exact selection
            neg, cidx = lax.top_k(-buf, m)
            vals = -neg
        elif merge == "tournament":
            # Hierarchical EXACT selection: per-slot top-t then top-m
            # over the t·nslots survivors. Exact for k ≤ t: a global
            # top-k item is top-k WITHIN its slot for ANY partition of
            # the buffer, so the slot round never drops it. Both
            # top_ks are narrow — far cheaper than one wide exact
            # top_k, and none of approx_min_k's ~1% binning loss.
            # (A finer sub-slot split of wide chunks was measured
            # NEUTRAL at the 1M geometry — 6.34 vs 6.37 s at sub
            # widths 128/256/512 — the tournament there is scan-
            # bound, not selection-bound; chunk-wide slots stay.)
            ts = chunk
            t = min(ts, max(16, k))
            nslots = buf.shape[1] // ts
            b3 = (-buf).reshape(block, nslots, ts)
            neg1, i1 = lax.top_k(b3, t)               # (block, nslots, t)
            flat = neg1.reshape(block, nslots * t)
            neg2, i2 = lax.top_k(flat, min(m, nslots * t))
            vals = -neg2
            within = jnp.take_along_axis(
                i1.reshape(block, nslots * t), i2, axis=1
            )
            cidx = (i2 // t) * ts + within
        else:
            vals, cidx = lax.approx_min_k(buf, m, recall_target=0.99)
        pos = row_idx[cidx]         # (block, m): direct flat mapping

        if not rerank:
            # Scan-score output: the selection scores are already
            # distance-faithful (exact f32 |x|² + f32-grade q·x under
            # full-fidelity residual or high-precision f32 scans), so
            # assembling D² = |x|² − 2q·x + |q|² skips the (block, m, d)
            # survivor row gather — the dominant width-independent cost
            # of the 10M search (~0.5 s per m-unit). Selection ran with
            # m = k, and `vals` is ascending, so outputs are sorted.
            D2 = vals[:, :k] + qn[:, None]
            D2 = jnp.where(
                vals[:, :k] >= MASK_VALUE * 0.5, MASK_VALUE, D2
            )
            return D2, ids_sorted[pos[:, :k]]

        # exact f32 re-rank of the m survivors (difference form: fused VPU,
        # no catastrophic cancellation, no norm gathers)
        Xg = rows_f32(pos)  # (block, m, d) row gather — ~50 GB/s, cheap
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


#: jitted entry; the raw impl is reused inside shard_map by parallel/ivf.py
_ivf_search = functools.partial(
    jax.jit,
    static_argnames=(
        "k", "ncells", "budget", "block", "chunk", "m", "scan_precision", "scan_impl",
        "merge", "max_ch", "scan_fidelity", "n_supers", "queries_raw",
        "nominate", "rerank", "budget_order", "queries_exact",
    ),
)(_ivf_search_impl)


def _resolve_search_knobs(index, k, nprobe, m, budget, merge, scan_impl,
                          nprobe_supers=None, nomination=None,
                          has_q_cells=False, rerank=True):
    """Resolve the data-dependent search knobs for an index.

    Shared by :func:`ivf_knn` and the mesh-sharded query path
    (parallel/ivf.py). Returns (nprobe, budget, m_eff, merge, max_ch,
    scan_impl, n_supers, nominate).
    """
    if scan_impl not in ("xla", "slices", "rows"):
        # "pallas" was removed in round 4: the fused scan+select kernel's
        # in-VMEM extract-min was VPU-bound (~14 s vs ~3 s XLA at 1M,
        # docs/ROUND2_STATUS.md) and every at-scale config demoted it
        # (split/int8 storage, rerank=False, >4 GB buffers).
        raise ValueError(
            f"[TorchDR-TPU] ERROR : unknown scan_impl {scan_impl!r} "
            "(choose 'xla', 'slices' or 'rows')."
        )
    chunk = index.chunk
    nlist_total = int(index.centroids.shape[0])
    n_supers = 0 if nprobe_supers is None else int(nprobe_supers)
    if index.super_centroids is None:
        n_supers = 0
    if nomination is None:
        # adjacency nomination pays off once the flat (block, nlist)
        # matmul + nlist-wide selection dominate the per-block fixed cost;
        # supers stay opt-in (the smeared group means cost ~9% recall at
        # 10M geometry, measured round 3)
        adj_ok = (
            index.cell_adj is not None
            and (index.cells_sorted is not None or has_q_cells)
        )
        if n_supers > 0:
            nomination = "supers"
        elif adj_ok and nlist_total >= 1024:
            # measured: adjacency beats flat already at nlist=1024
            # (1M x 128: 2.26 s vs 2.41 s at m=32, identical recall) and
            # by 1.3x at nlist=16384 (10M); the top-64 adjacency rows are
            # still a sparse fraction of the cell table at 1024
            nomination = "adjacency"
        else:
            nomination = "flat"
    if merge is None:
        # residual (split/int8) indexes pair best with the hierarchical
        # exact tournament (approx_min_k's binning measurably degrades on
        # the residual score structure: 98.2% vs 99.8% at 500k np16),
        # while f32 indexes with wide chunks (the ≤4 GB tier) favor approx
        # (tournament's per-slot top_k cost grows with chunk width)
        compressed = index.X_lo is not None or index.scales is not None
        merge = "tournament" if compressed else "approx"
    ncells_total = int(index.offsets.shape[0])
    nprobe = min(nprobe, ncells_total)
    counts_h = np.asarray(index.counts, np.float64)
    # expansion depth must cover the BIGGEST cell, or large home cells
    # silently lose their tail chunks (observed as recall stuck across
    # nprobe increases)
    max_ch = int(np.ceil(float(np.max(counts_h)) / chunk)) if counts_h.size else 1
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
        # ...and at least full home-cell coverage: a sample-trained coarse
        # quantizer leaves fat cells (10M×128 @ nlist=16384: max cell
        # 16 224 rows = 127 chunks vs a 610-row mean) whose truncation is
        # the tight-budget recall cliff (b70: 0.9922 vs b128: 0.99913 —
        # docs/ROUND5_STATUS.md 10M sweep). b128 was ALSO the fastest
        # measured budget at 10M (power-of-two budget·chunk layout).
        budget = max(budget, max_ch + 1)
    budget = min(budget, (index.X_sorted.shape[0] - chunk) // chunk + 1)
    if not rerank:
        # scan-score output: selection IS the final ranking, so the margin
        # has no role — select exactly k (outputs take the first k columns
        # of a wider explicit m, which only pads the selection). Only sound
        # when the scan scores are distance-faithful: full-fidelity
        # residual scans or high/highest-precision f32 scans (the
        # defaults). The tournament merge keeps the selection itself exact.
        m_eff = k if m is None else max(int(m), k)
    elif m is not None:
        m_eff = m
    elif merge == "tournament":
        # the tournament is exact for k ≤ t and full-fidelity residual
        # scores are f32-grade: measured recall FLAT from m=32 down to
        # m=16 at 10M while each unit of m costs ~0.5 s of re-rank row
        # gather — keep only a small safety margin
        m_eff = max(k + 5, 20)
    else:
        # wider margin under approx merges: rank displacement of the
        # binned/quantized scores must stay inside the exactly-re-ranked
        # m survivors
        m_eff = max(2 * k, 64 if index.X_lo is not None else 32)
    if index.X_sorted.nbytes > (4 << 30) and scan_impl == "xla":
        # chunked takes from >4 GB buffers crash the TPU AOT compiler —
        # only reachable when split-precision storage was disabled (the
        # bf16 hi plane is half the f32 bytes and stays under the limit)
        scan_impl = "slices"
    return nprobe, budget, m_eff, merge, max_ch, scan_impl, n_supers, nomination


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
    merge: str | None = None,
    seg_rows: int = 1 << 21,
    scan_fidelity: str = "full",
    nprobe_supers: int | None = None,
    nomination: str | None = None,
    rerank: bool = True,
    budget_order: str = "depth",
    storage: str = "auto",
    scoring: str = "symmetric",
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Approximate self-kNN of X through an IVF index.

    ``storage`` is forwarded to :func:`ivf_build` (ignored with a prebuilt
    ``index``): ``"int8"`` selects the compressed tier (¼ the resident
    bytes of f32; self-queries are reconstructed from the quantized rows,
    so both sides of the score carry the int8 rounding).

    ``scoring`` selects the query side of the score under lossy (int8)
    storage. ``"symmetric"`` (default) reconstructs self-queries from the
    quantized rows — both sides carry the same rounding and X need not
    stay resident. ``"asymmetric"`` gathers the caller's ORIGINAL f32
    rows into layout order per query segment and scores them against the
    quantized database — the Faiss ADC convention; measured +0.4% recall
    at the int8 quantizer ceiling for free (the scan is selection-bound),
    at the cost of keeping X resident next to the index. Requires ``X``;
    a no-op gain for f32/split storage (reconstruction is already
    f32-grade there). The cross-query path (:func:`ivf_knn_queries`) is
    always asymmetric — callers hand it exact queries.

    ``rerank=False`` returns scan-score distances directly (selection runs
    at width k, skipping the exact f32 survivor re-rank — the dominant
    width-independent cost at 10M). Distances are f32-grade assemblies
    |x|² − 2q·x + |q|² rather than exact recomputation; sound with the
    default full-fidelity/high-precision scans.

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
    if scoring not in ("symmetric", "asymmetric"):
        raise ValueError(
            f"[TorchDR-TPU] ERROR : unknown scoring {scoring!r} "
            "(choose 'symmetric' or 'asymmetric')."
        )
    if index is None:
        if X is None:
            raise ValueError("[TorchDR-TPU] ERROR : pass X or a prebuilt index.")
        index = ivf_build(X, n_clusters=n_clusters, key=key, storage=storage)
    # X itself is not needed beyond the build (the index holds the sorted
    # rows); callers at memory-bound scales pass X=None with a prebuilt
    # index so only one copy of the database is resident — unless
    # scoring="asymmetric", which reads the exact rows at query time
    asym = scoring == "asymmetric"
    if asym:
        if X is None:
            raise ValueError(
                "[TorchDR-TPU] ERROR : scoring='asymmetric' needs X (the "
                "exact f32 rows) alongside the index."
            )
        X_exact = jnp.asarray(X, jnp.float32)
    n = index.n
    nprobe, budget, m_eff, merge, max_ch, scan_impl, n_supers, nominate = (
        _resolve_search_knobs(
            index, k, nprobe, m, budget, merge, scan_impl, nprobe_supers,
            nomination, rerank=rerank,
        )
    )
    arrays = (
        index.centroids, index.X_sorted, index.ids_sorted, index.offsets,
        index.counts, index.X_lo, index.xnorm2, index.cells_sorted,
        index.super_centroids, index.super_members, index.cell_adj,
        index.scales,
    )
    chunk = index.chunk

    # Self-query fast path over the (possibly chunk-aligned) sorted layout:
    # dead pad rows (id −1) ride along as dead queries — they are excluded
    # from probe voting and their outputs are dropped by the scatter.
    total = index.X_sorted.shape[0] - chunk
    Qs_lo = index.X_lo
    if (total + chunk) % block == 0:
        # zero-copy: the queries ARE the database buffer(s) (tail pad rows
        # ride along as dead queries). Slicing would duplicate the whole
        # database on device — fatal at 10M×128 (5.7 GB each).
        total = total + chunk
        Qs = index.X_sorted
        out_ids = index.ids_sorted
    else:
        n_pad = -(-total // block) * block
        Qs = index.X_sorted[:total]
        Qs_lo = None if Qs_lo is None else Qs_lo[:total]
        out_ids = index.ids_sorted[:total]
        if n_pad != total:
            qpad = 1e12 if jnp.issubdtype(Qs.dtype, jnp.floating) else 0
            Qs = jnp.concatenate(
                [Qs, jnp.full((n_pad - total, Qs.shape[1]), qpad, Qs.dtype)]
            )
            if Qs_lo is not None:
                Qs_lo = jnp.concatenate(
                    [Qs_lo, jnp.zeros((n_pad - total, Qs.shape[1]), Qs_lo.dtype)]
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

    # Host-level query segmentation: one dispatch over 10M queries keeps
    # the MXU saturated for minutes, which the TPU runtime treats as a
    # wedged worker and kills (same failure as the 1M exact tier —
    # docs/ROUND2_STATUS.md). Cap each dispatch at ~2M queries; every
    # segment reuses the same compiled program (identical static shapes;
    # a short tail segment is padded with dead queries).
    # scatter slot per query row (original order); dead rows → spill slot n
    scatter_ids = jnp.where(out_ids >= 0, out_ids, n)
    if total > seg_rows:
        seg_blocks = max(1, seg_rows // block)
        seg = seg_blocks * block
        # preallocated outputs + donated per-segment scatter: the
        # accumulate-parts-then-concatenate formulation held an extra
        # 2×(n,k) transient (~2.4 GB at 10M) at peak
        out_d = jnp.zeros((n + 1, k), jnp.float32)
        out_i = jnp.zeros((n + 1, k), jnp.int32)
        for a in range(0, total, seg):
            b = min(total, a + seg)
            if asym:
                # exact-query gather per segment (≤ seg·d f32 transient;
                # a whole-layout gather would hold a second full-size f32
                # copy — fatal next to a 10M int8 index). Dead layout rows
                # (id −1) gather row 0; they are vote-dead and their
                # outputs land on the spill slot regardless.
                Q_seg = X_exact[jnp.maximum(out_ids[a:b], 0)]
                Ql_seg = None
            else:
                Q_seg = Qs[a:b]
                Ql_seg = None if Qs_lo is None else Qs_lo[a:b]
            r_seg = q_rows[a:b]
            sid = scatter_ids[a:b]
            if b - a < seg:  # pad the tail with dead queries
                pad = seg - (b - a)
                qpad = (
                    1e12 if jnp.issubdtype(Q_seg.dtype, jnp.floating) else 0
                )
                Q_seg = jnp.concatenate(
                    [Q_seg, jnp.full((pad, Q_seg.shape[1]), qpad, Q_seg.dtype)]
                )
                if Ql_seg is not None:
                    Ql_seg = jnp.concatenate(
                        [Ql_seg, jnp.zeros((pad, Q_seg.shape[1]), Ql_seg.dtype)]
                    )
                r_seg = jnp.concatenate([r_seg, jnp.full((pad,), -2, jnp.int32)])
                sid = jnp.concatenate([sid, jnp.full((pad,), n, jnp.int32)])
            ds, is_ = _ivf_search(
                Q_seg, r_seg, arrays, k, nprobe, budget, block, chunk, m_eff,
                scan_precision, scan_impl, merge, max_ch, Ql_seg,
                jnp.asarray(a, jnp.int32), scan_fidelity, n_supers,
                False, nominate, rerank=rerank, budget_order=budget_order,
                queries_exact=asym,
            )
            out_d, out_i = _scatter_out_jit(out_d, out_i, sid, ds, is_)
        return out_d[:n], out_i[:n]
    if asym:
        Qs = X_exact[jnp.maximum(out_ids, 0)]
        Qs_lo = None
    d, i = _ivf_search(
        Qs, q_rows, arrays, k, nprobe, budget, block, chunk, m_eff,
        scan_precision, scan_impl, merge, max_ch, Qs_lo, 0, scan_fidelity,
        n_supers, False, nominate, rerank=rerank, budget_order=budget_order,
        queries_exact=asym,
    )
    d = d.reshape(-1, k)
    i = i.reshape(-1, k)
    out_d = jnp.zeros((n + 1, k), d.dtype).at[scatter_ids].set(d[:total])
    out_i = jnp.zeros((n + 1, k), jnp.int32).at[scatter_ids].set(i[:total])
    return out_d[:n], out_i[:n]


@functools.partial(jax.jit, donate_argnums=(0, 1))
def _scatter_out_jit(out_d, out_i, sid, ds, is_):
    k = out_d.shape[1]
    return (
        out_d.at[sid].set(ds.reshape(-1, k)),
        out_i.at[sid].set(is_.reshape(-1, k)),
    )


def ivf_knn_queries(
    Q,
    index: IVFIndex,
    k: int = 15,
    nprobe: int = 12,
    query_ids=None,
    block: int = 256,
    m: int | None = None,
    scan_precision: str = "high",
    budget: int | None = None,
    scan_impl: str = "xla",
    merge: str | None = None,
    seg_rows: int = 1 << 21,
    scan_fidelity: str = "full",
    nprobe_supers: int | None = None,
    nomination: str | None = None,
    sort_queries: bool = True,
    rerank: bool = True,
    budget_order: str = "depth",
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """kNN of arbitrary query rows against a prebuilt IVF index.

    The cross-query path (reference analog: Faiss search with Y ≠ X,
    torchdr/distance/faiss.py:225-310 and the DataLoader per-chunk search
    :741-867). ``query_ids`` optionally carries one database row id per
    query to exclude from its results (self-exclusion when Q ⊂ database).
    Queries are sorted by home cell first (``sort_queries``) so blocks
    stay cluster-coherent — the property the self-query fast path gets
    for free from the index layout.

    Returns ``(dists, indices)`` of shape ``(nq, k)`` in Q's row order;
    ``indices`` are original database row ids.
    """
    n = index.n
    # Block-shared probing assumes cluster-coherent blocks. The self-query
    # path gets that from the sorted layout (a block = 1-2 cells); sorted
    # cross queries are only as coherent as their density allows — a small
    # or spread query set packs many DISTINCT home cells into one block,
    # and nprobe shared probes cannot cover them (measured: 500 queries
    # over 64 cells = ~33 homes/block → 25% recall at nprobe=12, 100% at
    # 64). Boost the block's probe count by the expected home-cell
    # diversity so per-query coverage matches Faiss's per-query nprobe
    # semantics; budget scales with it in _resolve_search_knobs.
    nq_real = int(np.asarray(Q.shape[0]))
    nlist_t = int(index.centroids.shape[0])
    if sort_queries:
        homes_pb = int(
            np.ceil(block * min(nlist_t, max(1, nq_real)) / max(1, nq_real))
        )
        homes_pb = max(1, min(block, homes_pb))
    else:
        # unsorted blocks are incoherent regardless of query density: any
        # block can span up to `block` distinct home cells, so the density
        # estimate (valid only for cell-sorted queries) would under-probe
        homes_pb = min(block, nlist_t)
    nprobe_eff = min(nlist_t, int(nprobe) * homes_pb)
    if homes_pb > 8 and nomination is None:
        # adjacency nomination samples ≤8 home positions per block —
        # blocks more diverse than that would miss homes entirely
        nomination = "flat"
    nprobe, budget, m_eff, merge, max_ch, scan_impl, n_supers, nominate = (
        _resolve_search_knobs(
            index, k, nprobe_eff, m, budget, merge, scan_impl, nprobe_supers,
            nomination, has_q_cells=sort_queries, rerank=rerank,
        )
    )
    # The boost is per-BLOCK shared-probe compensation, so tiny query sets
    # against big indexes inflate budget toward a full-database scan whose
    # (block, budget·chunk) f32 score buffer is multi-GB. Cap the buffer at
    # ~1 GB: coverage per query stays ≥ the full block's worth of shared
    # slots (small nq ⇒ few blocks, each scanning up to the cap).
    budget_cap = max(nprobe, (1 << 30) // (block * index.chunk * 4))
    budget = min(budget, budget_cap)
    arrays = (
        index.centroids, index.X_sorted, index.ids_sorted, index.offsets,
        index.counts, index.X_lo, index.xnorm2, index.cells_sorted,
        index.super_centroids, index.super_members, index.cell_adj,
        index.scales,
    )
    chunk = index.chunk
    Q = jnp.asarray(Q, jnp.float32)
    nq = Q.shape[0]

    q_cells = None
    if sort_queries:
        labels = _assign_blockwise(Q, index.centroids)
        order = jnp.argsort(labels)
        Q = Q[order]
        q_cells = labels[order]
        if query_ids is not None:
            query_ids = jnp.asarray(query_ids, jnp.int32)[order]
    if nominate == "adjacency" and q_cells is None:
        nominate = "flat"

    # exclusion ids: the database id to mask per query (n = match nothing)
    excl = (
        jnp.asarray(query_ids, jnp.int32)
        if query_ids is not None
        else jnp.full((nq,), n, jnp.int32)
    )

    n_pad = -(-nq // block) * block
    if q_cells is None:
        q_cells = jnp.zeros((nq,), jnp.int32)
    if n_pad != nq:
        Q = jnp.concatenate(
            [Q, jnp.full((n_pad - nq, Q.shape[1]), 1e12, Q.dtype)]
        )
        excl = jnp.concatenate([excl, jnp.full((n_pad - nq,), -2, jnp.int32)])
        # pad with the last real home cell so adjacency candidates of the
        # tail block stay in-neighborhood
        q_cells = jnp.concatenate(
            [q_cells, jnp.full((n_pad - nq,), q_cells[-1], jnp.int32)]
        )

    d_parts, i_parts = [], []
    seg = max(block, (seg_rows // block) * block)
    for a in range(0, n_pad, seg):
        b = min(n_pad, a + seg)
        Q_seg, e_seg, c_seg = Q[a:b], excl[a:b], q_cells[a:b]
        if b - a < seg and n_pad > seg:  # pad tail to reuse the compile
            pad = seg - (b - a)
            Q_seg = jnp.concatenate(
                [Q_seg, jnp.full((pad, Q.shape[1]), 1e12, Q.dtype)]
            )
            e_seg = jnp.concatenate([e_seg, jnp.full((pad,), -2, jnp.int32)])
            c_seg = jnp.concatenate(
                [c_seg, jnp.full((pad,), c_seg[-1], jnp.int32)]
            )
        ds, is_ = _ivf_search(
            Q_seg, e_seg, arrays, k, nprobe, budget, block, chunk, m_eff,
            scan_precision, scan_impl, merge, max_ch, None,
            jnp.asarray(0, jnp.int32), scan_fidelity, n_supers, True,
            nominate, c_seg, rerank=rerank, budget_order=budget_order,
        )
        d_parts.append(ds.reshape(-1, k))
        i_parts.append(is_.reshape(-1, k))
    d = jnp.concatenate(d_parts, axis=0)[:nq]
    i = jnp.concatenate(i_parts, axis=0)[:nq]
    if sort_queries:
        inv = jnp.zeros((nq,), jnp.int32).at[order].set(jnp.arange(nq))
        d, i = d[inv], i[inv]
    return d, i


def ivf_build_from_batches(
    batches,
    n_clusters: int | None = None,
    key=None,
    train_size: int = 25_600,
    kmeans_iters: int = 25,
    chunk: int | None = None,
    verbose: bool = False,
    split_bytes: int = 4 << 30,
    n_superlist: int | None = None,
    storage: str = "auto",
) -> IVFIndex:
    """Build an IVF index incrementally from a multi-pass batch feed.

    The streaming analog of the reference's two-pass DataLoader build
    (train quantizer on sampled batches, then assign/add per batch —
    torchdr/distance/faiss.py:594-738). ``batches`` may be anything
    :class:`~torchdr_tpu.ops.loader.BatchSource` accepts: a list of
    numpy/torch arrays, ``(data, target)`` tuples, a one-shot generator
    (buffered), a torch DataLoader, or a zero-arg callable returning a
    fresh iterator. Re-iterable sources are REPLAYED per pass (sampling /
    assignment / write), so for them the unsorted dataset is never held in
    host memory: peak host = the sorted layout buffer + one batch + the
    O(n) assignment labels. DataLoader-like sources are validated against
    shuffling samplers (multi-pass reads need one fixed row order) and
    their counting pass is cached per loader object — the analog of the
    reference's deterministic-sampler check + metadata cache
    (faiss.py:23-110). Device memory holds only the training sample,
    per-batch assignment pushes, and the final pushed planes.
    """
    from .loader import BatchSource

    src = BatchSource(batches)
    n, d = src.shape_hint()
    nlist = n_clusters or auto_nlist(n)
    key = key if key is not None else jax.random.PRNGKey(0)
    if chunk is None:
        mean_cell = max(1, n // max(1, nlist))
        chunk = int(min(512, max(64, -(-int(1.3 * mean_cell) // 64) * 64)))
    chunk = min(chunk, max(64, n))

    # pass 1: training sample — proportional per-batch strided subsample
    train_size = min(n, max(train_size, 64 * nlist))
    rng = np.random.default_rng(int(jax.random.randint(key, (), 0, 1 << 30)))
    parts = []
    for b in src:
        take = max(1, int(round(train_size * b.shape[0] / n)))
        sel = rng.choice(b.shape[0], min(take, b.shape[0]), replace=False)
        parts.append(b[np.sort(sel)])
    train = jnp.asarray(np.concatenate(parts)[:train_size])
    centroids, _, _ = kmeans_fit(
        train, nlist, key, max_iter=kmeans_iters,
        init="random" if nlist >= 2048 else "++",
    )
    centroids.block_until_ready()
    del train, parts

    if n_superlist is None:
        n_superlist = max(32, nlist // 64) if nlist >= 1024 else 0
    if n_superlist and n_superlist < nlist:
        perm_s, supers, members = _build_supers(centroids, int(n_superlist), key)
        centroids = centroids[perm_s]  # relabel: supers = contiguous id ranges
    else:
        supers = members = None
    cell_adj = _build_cell_adjacency(centroids)

    # pass 2: assign each batch (only labels come back to host)
    labels_per_batch = [_assign_host_segmented(b, centroids) for b in src]
    counts_h = np.zeros((nlist,), np.int64)
    for lab in labels_per_batch:
        counts_h += np.bincount(lab, minlength=nlist)
    if int(counts_h.sum()) != n:
        raise ValueError(
            "[TorchDR-TPU] ERROR : batch feed yielded "
            f"{int(counts_h.sum())} rows on the assignment pass but "
            f"{n} rows were expected — the source must produce the same "
            "batches on every pass (shuffle=False, deterministic factory)."
        )

    # aligned layout (same convention as ivf_build align=True)
    padded = (np.ceil(counts_h / chunk).astype(np.int64) * chunk)
    offs_h = np.concatenate([[0], np.cumsum(padded)[:-1]]).astype(np.int64)
    total = int(padded.sum())

    # pass 3: write each batch straight into its sorted destination slots
    Xs_h = np.zeros((total + chunk, d), np.float32)
    ids_h = np.full((total + chunk,), -1, np.int32)
    fill = offs_h.copy()  # next free slot per cell
    row0 = 0
    for b_arr, lab in zip(src, labels_per_batch):
        order = np.argsort(lab, kind="stable")
        lab_s = lab[order]
        # consecutive runs per cell → contiguous destination ranges
        cell_ids, run_starts = np.unique(lab_s, return_index=True)
        run_ends = np.append(run_starts[1:], lab_s.shape[0])
        within = np.arange(lab_s.shape[0]) - run_starts[
            np.searchsorted(cell_ids, lab_s)
        ]
        dest = fill[lab_s] + within
        fill[cell_ids] += run_ends - run_starts
        Xs_h[dest] = b_arr[order]
        ids_h[dest] = row0 + order.astype(np.int32)
        row0 += b_arr.shape[0]
    if row0 != n:
        raise ValueError(
            f"[TorchDR-TPU] ERROR : write pass saw {row0} rows, expected "
            f"{n} — the batch feed must replay identically on every pass."
        )

    counts = jnp.asarray(counts_h.astype(np.int32))
    offsets = jnp.asarray(offs_h, jnp.int32)
    f32_bytes = (total + chunk) * d * 4
    X_lo = xnorm2 = scales = None
    cells_dev = jnp.asarray(_cells_of_layout(padded, chunk, nlist))
    if storage == "int8":
        cells_h = _cells_of_layout(padded, chunk, nlist)
        q8_h, scales_h, xn_h = _int8_quantize_host(
            Xs_h, cells_h, np.asarray(centroids, np.float32), ids_h, offs_h
        )
        X_sorted = _push_segmented(q8_h)
        scales = jnp.asarray(scales_h)
        xnorm2 = jnp.asarray(xn_h)
    elif storage == "split" or (storage == "auto" and f32_bytes > split_bytes):
        import ml_dtypes

        bf16 = ml_dtypes.bfloat16
        cells_h = _cells_of_layout(padded, chunk, nlist)
        cent_h = np.asarray(centroids, np.float32)
        xn_h = np.einsum("ij,ij->i", Xs_h, Xs_h).astype(np.float32)
        Xs_h -= cent_h[cells_h]
        hi_h = Xs_h.astype(bf16)
        lo_h = (Xs_h - hi_h.astype(np.float32)).astype(bf16)
        X_sorted = _push_segmented(hi_h)
        X_lo = _push_segmented(lo_h)
        xnorm2 = jnp.asarray(xn_h)
        cells_dev = jnp.asarray(cells_h)
        X_lo.block_until_ready()
    else:
        X_sorted = _push_segmented(Xs_h)
    ids_sorted = jnp.asarray(ids_h)
    X_sorted.block_until_ready()
    return IVFIndex(
        centroids, X_sorted, ids_sorted, offsets, counts, chunk, n,
        X_lo, xnorm2, cells_dev, supers, members, cell_adj, scales,
    )
