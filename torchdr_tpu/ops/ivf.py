"""IVF-style approximate kNN: coarse quantization + block-sparse probe.

The ANN tier replacing Faiss IVFFlat (reference: torchdr/distance/
faiss.py:323-473; B200 numbers in benchmarks/faiss/BENCHMARK_RESULTS.md).
Designed for the MXU rather than translated from Faiss's per-query list
scanning:

- **Build**: k-means centroids (ops/kmeans.py, on a subsample), assign all
  points by blockwise argmin, sort the database by cluster so each inverted
  list is a contiguous row range.
- **Search**: queries are *sorted by their nearest centroid* so each query
  block probes a shared small set of clusters; each (query-block × cluster)
  pair is then one dense MXU matmul over the cluster's contiguous rows — a
  block-sparse distance computation with a running top-k merge. No
  per-query gather/scan; the probed rows are loaded once per block.

Like Faiss IVF this is approximate (a query whose true neighbors live in
un-probed clusters misses them); unlike Faiss the probe set is chosen per
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
    centroids: jnp.ndarray  # (nlist, d)
    X_sorted: jnp.ndarray   # (n_pad, d) database rows grouped by cluster
    ids_sorted: jnp.ndarray  # (n_pad,) original row ids (-1 padding)
    offsets: jnp.ndarray    # (nlist,) start of each cluster in X_sorted
    counts: jnp.ndarray     # (nlist,) cluster sizes
    cap: int                # max cluster size (static)


def auto_nlist(n: int) -> int:
    """Faiss-style heuristic (reference: faiss.py:335-342)."""
    return int(max(16, min(4 * (n ** 0.5), n / 39, 8192)))


def ivf_build(
    X: jnp.ndarray,
    n_clusters: int | None = None,
    key=None,
    train_size: int = 25_600,
    kmeans_iters: int = 25,
) -> IVFIndex:
    """Build the inverted file index (host-synced shapes; build once)."""
    n, d = X.shape
    nlist = n_clusters or auto_nlist(n)
    key = key if key is not None else jax.random.PRNGKey(0)

    # Faiss guidance: ≥39 training points per centroid; thin samples give
    # bad coarse quantizers and tank recall.
    train_size = min(n, max(train_size, 64 * nlist))
    train = X if n <= train_size else jax.random.choice(key, X, (train_size,), replace=False)
    centroids, _, _ = kmeans_fit(train, nlist, key, max_iter=kmeans_iters)

    labels = _assign_blockwise(X, centroids)
    order = jnp.argsort(labels, stable=True)
    labels_sorted = labels[order]
    counts = jnp.zeros((nlist,), jnp.int32).at[labels].add(1)
    offsets = jnp.concatenate([jnp.zeros((1,), jnp.int32), jnp.cumsum(counts)[:-1]])
    cap = int(jnp.max(counts))

    X_sorted = X[order]
    ids_sorted = order.astype(jnp.int32)
    # pad the tail so dynamic slices of length `cap` never run off the end
    pad = cap
    X_sorted = jnp.concatenate([X_sorted, jnp.zeros((pad, d), X.dtype)], axis=0)
    ids_sorted = jnp.concatenate([ids_sorted, jnp.full((pad,), -1, jnp.int32)])
    del labels_sorted
    return IVFIndex(centroids, X_sorted, ids_sorted, offsets, counts, cap)


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


@functools.partial(jax.jit, static_argnames=("k", "nprobe", "block", "cap"))
def _ivf_search_sorted(Q, q_rows, index_arrays, k, nprobe, block, cap):
    centroids, X_sorted, ids_sorted, offsets, counts = index_arrays
    nq = Q.shape[0]
    n_blocks = nq // block
    c_norm = jnp.sum(centroids * centroids, axis=-1)

    nlist = centroids.shape[0]
    per_query_probes = max(2, nprobe // 2)

    def process(b):
        Qb = lax.dynamic_slice_in_dim(Q, b * block, block, axis=0)
        qn = jnp.sum(Qb * Qb, axis=-1)
        gq = jnp.matmul(Qb, centroids.T, preferred_element_type=jnp.float32)
        Dc = sq_dists_from_gram(qn, c_norm, gq)  # (block, nlist)
        # Shared probe set for the block by per-query voting: each query
        # nominates its own nearest clusters, the block probes the most
        # nominated ones (covers every query's true cells far better than a
        # min-distance score when the block straddles several cells).
        _, nom = lax.top_k(-Dc, per_query_probes)  # (block, p)
        # rank-weighted votes: a query's nearest cells count most, so every
        # query's top cell reliably makes the probe set
        weights = 1.0 / (1.0 + jnp.arange(per_query_probes, dtype=jnp.float32))
        votes = (
            jnp.zeros((nlist,), jnp.float32)
            .at[nom.reshape(-1)]
            .add(jnp.broadcast_to(weights[None, :], nom.shape).reshape(-1))
        )
        # tie-break by distance: closer clusters win among equal votes
        score = votes - jnp.min(Dc, axis=0) / (1e12)
        _, probe = lax.top_k(score, nprobe)

        rows = lax.dynamic_slice_in_dim(q_rows, b * block, block, axis=0)

        def probe_step(j, carry):
            best_d, best_i = carry
            c = probe[j]
            start = offsets[c]
            cnt = counts[c]
            Xc = lax.dynamic_slice_in_dim(X_sorted, start, cap, axis=0)
            idc = lax.dynamic_slice_in_dim(ids_sorted, start, cap, axis=0)
            # fine ranking needs exact f32: bf16 gram error exceeds the
            # neighbor spacing at high-dim scale and scrambles the top-k
            g = jnp.matmul(
                Qb, Xc.T, preferred_element_type=jnp.float32,
                precision=lax.Precision.HIGHEST,
            )
            D = sq_dists_from_gram(qn, jnp.sum(Xc * Xc, -1), g)
            invalid = (jnp.arange(cap)[None, :] >= cnt) | (
                idc[None, :] == rows[:, None]
            )
            D = D + MASK_VALUE * invalid.astype(D.dtype)
            cand_d = jnp.concatenate([best_d, D], axis=1)
            cand_i = jnp.concatenate(
                [best_i, jnp.broadcast_to(idc[None, :], D.shape)], axis=1
            )
            neg, sel = lax.top_k(-cand_d, k)
            return -neg, jnp.take_along_axis(cand_i, sel, axis=1)

        init = (
            jnp.full((block, k), MASK_VALUE, Q.dtype),
            jnp.full((block, k), -1, jnp.int32),
        )
        return lax.fori_loop(0, nprobe, probe_step, init)

    d, i = lax.map(process, jnp.arange(n_blocks))
    return d.reshape(-1, k), i.reshape(-1, k)


@functools.partial(
    jax.jit,
    static_argnames=("k", "nprobe", "block", "cap", "m", "scan_precision", "unroll"),
)
def _ivf_search_rerank(
    Q, q_rows, index_arrays, k, nprobe, block, cap, m, scan_precision, unroll=False
):
    """Two-phase probe: fast low-precision scan, exact f32 re-rank.

    Phase 1 streams each probed cluster's contiguous rows through ONE
    default-precision (bf16 MXU) distance matmul per (query-block ×
    cluster) pair, writing into a (block, nprobe·cap) candidate-distance
    buffer. A single ``approx_min_k`` (the TPU PartialReduce op) pulls the
    top-m candidates per query at near-memory speed. Phase 2 gathers just
    those m rows and re-ranks them with exact f32 distances, recovering
    the ranks that bf16 gram error scrambles (round-1 finding: bf16 exact
    kNN alone drops to 88% recall; with an m≈2k margin + f32 re-rank the
    probed set's recall is fully recovered).

    This replaces the single-phase HIGHEST-precision scan (6-pass bf16
    decomposition on the MXU, ~6× the FLOP cost) that bounded round 1's
    3.79 s search (cf. reference Faiss IVF kernels, which scan in f32 but
    on a B200's far larger L2/SM budget — the TPU-shaped answer is
    precision splitting, not translation).
    """
    centroids, X_sorted, ids_sorted, offsets, counts = index_arrays
    nq = Q.shape[0]
    n_blocks = nq // block
    nlist = centroids.shape[0]
    c_norm = jnp.sum(centroids * centroids, axis=-1)
    per_query_probes = max(2, nprobe // 2)
    prec = {
        "default": lax.Precision.DEFAULT,
        "high": lax.Precision.HIGH,
        "highest": lax.Precision.HIGHEST,
    }[scan_precision]

    def process(b):
        Qb = lax.dynamic_slice_in_dim(Q, b * block, block, axis=0)
        rows = lax.dynamic_slice_in_dim(q_rows, b * block, block, axis=0)
        qn = jnp.sum(Qb * Qb, axis=-1)
        gq = jnp.matmul(Qb, centroids.T, preferred_element_type=jnp.float32)
        Dc = sq_dists_from_gram(qn, c_norm, gq)  # (block, nlist)
        # Shared probe set by rank-weighted per-query voting (see
        # _ivf_search_sorted for rationale).
        _, nom = lax.top_k(-Dc, per_query_probes)
        weights = 1.0 / (1.0 + jnp.arange(per_query_probes, dtype=jnp.float32))
        votes = (
            jnp.zeros((nlist,), jnp.float32)
            .at[nom.reshape(-1)]
            .add(jnp.broadcast_to(weights[None, :], nom.shape).reshape(-1))
        )
        score = votes - jnp.min(Dc, axis=0) / 1e12
        _, probe = lax.top_k(score, nprobe)

        def probe_step(j, buf):
            c = probe[j]
            start = offsets[c]
            cnt = counts[c]
            Xc = lax.dynamic_slice_in_dim(X_sorted, start, cap, axis=0)
            idc = lax.dynamic_slice_in_dim(ids_sorted, start, cap, axis=0)
            g = jnp.matmul(
                Qb, Xc.T, preferred_element_type=jnp.float32, precision=prec
            )
            D = sq_dists_from_gram(qn, jnp.sum(Xc * Xc, -1), g)
            invalid = (jnp.arange(cap)[None, :] >= cnt) | (
                idc[None, :] == rows[:, None]
            )
            D = D + MASK_VALUE * invalid.astype(D.dtype)
            return lax.dynamic_update_slice(buf, D, (0, j * cap))

        buf = jnp.full((block, nprobe * cap), MASK_VALUE, jnp.float32)
        if unroll:
            for j in range(nprobe):
                buf = probe_step(j, buf)
        else:
            buf = lax.fori_loop(0, nprobe, probe_step, buf)
        # one PartialReduce top-m over the whole candidate buffer
        cand_d, cidx = lax.approx_min_k(buf, m, recall_target=0.99)
        p = cidx // cap
        off = cidx % cap
        pos = offsets[probe[p]] + off  # (block, m) positions in X_sorted
        # phase 2: exact f32 re-rank of the m survivors
        Xg = X_sorted[pos]  # (block, m, d) gather — rows share clusters
        g2 = jnp.einsum(
            "bd,bmd->bm",
            Qb,
            Xg,
            precision=lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32,
        )
        D2 = qn[:, None] + jnp.sum(Xg * Xg, -1) - 2.0 * g2
        D2 = jnp.where(cand_d >= MASK_VALUE * 0.5, MASK_VALUE, D2)
        negk, sel = lax.top_k(-D2, k)
        ids = ids_sorted[jnp.take_along_axis(pos, sel, axis=1)]
        return -negk, ids

    d, i = lax.map(process, jnp.arange(n_blocks))
    return d.reshape(-1, k), i.reshape(-1, k)


@functools.partial(jax.jit, static_argnames=("k", "nprobe", "block", "cap", "m"))
def _ivf_search_v2(Qs, q_rows, index_arrays, k, nprobe, block, cap, m):
    """Self-kNN probe: bf16 rank-score scan, exact top-m merge, f32 re-rank.

    Three design decisions, each fixing a measured round-2 bottleneck on the
    1M×128 bench config:

    - the scan ranks candidates by ``‖x_c‖² − 2⟨q, x_c⟩`` (the query norm is
      constant within a row) at DEFAULT matmul precision — one bf16 MXU pass
      instead of the 6-pass HIGHEST decomposition;
    - the merge is an exact running ``top_k`` over (m + cap) per probe —
      ``approx_min_k`` loses ~2-7% recall here because true neighbors are
      *contiguous* in the cluster-sorted buffer and collide in its bins;
    - only the m survivors are re-ranked with exact f32 distances via a
      small gather (large gathers measured at <6 GB/s on this chip — m must
      stay ~2·k).

    Faiss scans lists per query in f32 (reference: torchdr/distance/
    faiss.py:382-401); the TPU-shaped answer is block-shared probes +
    precision splitting.
    """
    centroids, X_sorted, ids_sorted, offsets, counts = index_arrays
    nq = Qs.shape[0]
    n_blocks = nq // block
    nlist = centroids.shape[0]
    c_norm = jnp.sum(centroids * centroids, axis=-1)
    x_norms = jnp.sum(X_sorted * X_sorted, axis=-1)  # (n_pad,)
    per_query_probes = max(2, nprobe // 2)

    def process(b):
        Qb = lax.dynamic_slice_in_dim(Qs, b * block, block, axis=0)
        rows = lax.dynamic_slice_in_dim(q_rows, b * block, block, axis=0)
        qn = jnp.sum(Qb * Qb, axis=-1)
        gq = jnp.matmul(Qb, centroids.T, preferred_element_type=jnp.float32)
        Dc = sq_dists_from_gram(qn, c_norm, gq)
        _, nom = lax.top_k(-Dc, per_query_probes)
        weights = 1.0 / (1.0 + jnp.arange(per_query_probes, dtype=jnp.float32))
        votes = (
            jnp.zeros((nlist,), jnp.float32)
            .at[nom.reshape(-1)]
            .add(jnp.broadcast_to(weights[None, :], nom.shape).reshape(-1))
        )
        score = votes - jnp.min(Dc, axis=0) / 1e12
        _, probe = lax.top_k(score, nprobe)

        def probe_step(j, carry):
            best_s, best_p = carry
            c = probe[j]
            start = offsets[c]
            cnt = counts[c]
            Xc = lax.dynamic_slice_in_dim(X_sorted, start, cap, axis=0)
            idc = lax.dynamic_slice_in_dim(ids_sorted, start, cap, axis=0)
            nc = lax.dynamic_slice_in_dim(x_norms, start, cap, axis=0)
            g = jnp.matmul(Qb, Xc.T, preferred_element_type=jnp.float32)
            s = nc[None, :] - 2.0 * g  # rank-equivalent within each row
            invalid = (jnp.arange(cap)[None, :] >= cnt) | (
                idc[None, :] == rows[:, None]
            )
            s = s + MASK_VALUE * invalid.astype(s.dtype)
            pos = start + jnp.arange(cap, dtype=jnp.int32)
            cand_s = jnp.concatenate([best_s, s], axis=1)
            cand_p = jnp.concatenate(
                [best_p, jnp.broadcast_to(pos[None, :], s.shape)], axis=1
            )
            neg, sel = lax.top_k(-cand_s, m)
            return -neg, jnp.take_along_axis(cand_p, sel, axis=1)

        best_s = jnp.full((block, m), MASK_VALUE, jnp.float32)
        best_p = jnp.zeros((block, m), jnp.int32)
        best_s, best_p = lax.fori_loop(0, nprobe, probe_step, (best_s, best_p))

        # exact f32 re-rank of the m survivors
        Xg = X_sorted[best_p]  # (block, m, d) — small, cluster-local gather
        g2 = jnp.einsum(
            "bd,bmd->bm", Qb, Xg,
            precision=lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32,
        )
        D2 = qn[:, None] + x_norms[best_p] - 2.0 * g2
        D2 = jnp.where(best_s >= MASK_VALUE * 0.5, MASK_VALUE, D2)
        negk, sel = lax.top_k(-D2, k)
        return -negk, ids_sorted[jnp.take_along_axis(best_p, sel, axis=1)]

    d, i = lax.map(process, jnp.arange(n_blocks))
    return d.reshape(-1, k), i.reshape(-1, k)


def ivf_knn(
    X: jnp.ndarray,
    k: int = 15,
    nprobe: int = 16,
    n_clusters: int | None = None,
    index: IVFIndex | None = None,
    key=None,
    block: int = 256,
    exclude_self: bool = True,
    method: str = "v2",
    m: int | None = None,
    scan_precision: str = "default",
    unroll: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Approximate self-kNN of X through an IVF index.

    Returns (dists, indices) of shape (n, k) in original row order.
    Pass a prebuilt ``index`` to amortize the build across calls.

    The default ``method="v2"`` uses the self-query fast path: since the
    index already stores X sorted by cluster, the sorted rows ARE the
    cluster-coherent query order — no query assignment, argsort, or input
    gather is paid (measured ~2.3 s of fixed overhead at 1M×128 in the
    legacy path, which re-sorted the queries from scratch).
    """
    n = X.shape[0]
    if index is None:
        index = ivf_build(X, n_clusters=n_clusters, key=key)
    arrays = (
        index.centroids, index.X_sorted, index.ids_sorted, index.offsets, index.counts,
    )
    m_eff = m if m is not None else max(2 * k, 32)

    if method == "v2":
        n_pad = -(-n // block) * block
        Qs = index.X_sorted[:n]
        sorted_ids = index.ids_sorted[:n]
        q_rows = (
            sorted_ids if exclude_self else jnp.full((n,), -1, jnp.int32)
        )
        if n_pad != n:
            # far-away pad queries so they don't pollute the last block's
            # shared probe votes
            Qs = jnp.concatenate(
                [Qs, jnp.full((n_pad - n, X.shape[1]), 1e12, X.dtype)]
            )
            q_rows = jnp.concatenate([q_rows, jnp.full((n_pad - n,), -2, jnp.int32)])
        d, i = _ivf_search_v2(Qs, q_rows, arrays, k, nprobe, block, index.cap, m_eff)
        # scatter back to original row order (ids_sorted is the permutation)
        out_d = jnp.zeros((n, k), d.dtype).at[sorted_ids].set(d[:n])
        out_i = jnp.zeros((n, k), jnp.int32).at[sorted_ids].set(i[:n])
        return out_d, out_i

    # legacy paths: sort queries by their nearest centroid
    q_labels = _assign_blockwise(X, index.centroids)
    q_order = jnp.argsort(q_labels, stable=True)
    Qs = X[q_order]
    q_rows = (
        q_order.astype(jnp.int32)
        if exclude_self
        else jnp.full((n,), -1, jnp.int32)
    )

    n_pad = -(-n // block) * block
    if n_pad != n:
        Qs = jnp.concatenate([Qs, jnp.full((n_pad - n, X.shape[1]), 1e12, X.dtype)])
        q_rows = jnp.concatenate([q_rows, jnp.full((n_pad - n,), -2, jnp.int32)])

    if method == "rerank":
        d, i = _ivf_search_rerank(
            Qs, q_rows, arrays, k, nprobe, block, index.cap,
            m_eff, scan_precision, unroll,
        )
    else:
        d, i = _ivf_search_sorted(Qs, q_rows, arrays, k, nprobe, block, index.cap)
    d, i = d[:n], i[:n]
    # un-sort back to original order
    inv = jnp.zeros((n,), jnp.int32).at[q_order].set(jnp.arange(n, dtype=jnp.int32))
    return d[inv], i[inv]
