"""Tests for the compute primitives (mirrors reference test_utils.py scope)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.scipy.special import logsumexp

from torchdr_tpu.ops import (
    binary_search,
    false_position,
    knn_graph,
    pairwise_distances,
    pairwise_distances_indexed,
    pairwise_logkernel_logsumexp,
    pairwise_logkernel_rowlse,
    sparse_to_dense,
    symmetrize_sparse,
    svd_flip,
)
from torchdr_tpu.ops.metrics import LIST_METRICS, pairwise_block


@pytest.fixture(scope="module")
def data():
    key = jax.random.PRNGKey(0)
    return jax.random.normal(key, (100, 8))


class TestDistances:
    def test_sqeuclidean_matches_naive(self, data):
        C, _ = pairwise_distances(data, metric="sqeuclidean")
        naive = ((data[:, None, :] - data[None, :, :]) ** 2).sum(-1)
        assert jnp.abs(C - naive).max() < 1e-4

    @pytest.mark.parametrize("metric", ["euclidean", "manhattan", "angular"])
    def test_metrics_shapes(self, data, metric):
        C = pairwise_block(data, data, metric)
        assert C.shape == (100, 100)
        if metric != "angular":
            assert float(C.min()) >= 0

    def test_sqhyperbolic(self):
        key = jax.random.PRNGKey(1)
        X = 0.3 * jax.random.uniform(key, (20, 2))
        C = pairwise_block(X, X, "sqhyperbolic")
        assert bool(jnp.all(jnp.isfinite(C)))
        assert C.shape == (20, 20)

    def test_knn_graph_exact(self, data):
        d, idx = knn_graph(data, k=7, block_size=16)
        naive = ((data[:, None, :] - data[None, :, :]) ** 2).sum(-1)
        naive = naive + 1e12 * jnp.eye(100)
        expected = jnp.sort(naive, axis=1)[:, :7]
        assert jnp.abs(jnp.sort(d, axis=1) - expected).max() < 1e-3
        # recall must be 100% (exact Flat tier)
        nn_sets = np.argsort(np.asarray(naive), axis=1)[:, :7]
        recall = np.mean(
            [len(set(np.asarray(idx[i])) & set(nn_sets[i])) / 7 for i in range(100)]
        )
        assert recall == 1.0

    def test_knn_vs_y(self, data):
        Y = data[:37]
        d, idx = knn_graph(data, Y, k=3, exclude_diag=False, block_size=32)
        assert idx.shape == (100, 3)
        assert int(idx.max()) < 37

    def test_indexed_2d(self, data):
        _, idx = knn_graph(data, k=5)
        D = pairwise_distances_indexed(data, key_indices=idx)
        naive = ((data[:, None, :] - data[None, :, :]) ** 2).sum(-1)
        expected = jnp.take_along_axis(naive, idx, axis=1)
        assert jnp.abs(D - expected).max() < 1e-4

    def test_indexed_1d_queries(self, data):
        q = jnp.arange(10)
        D = pairwise_distances_indexed(data, query_indices=q)
        assert D.shape == (10, 100)


class TestBlockwiseReduce:
    def test_rowlse_matches_dense(self):
        Z = jax.random.normal(jax.random.PRNGKey(2), (37, 2))
        got = pairwise_logkernel_rowlse(Z, "student", True, 8)
        lq = jnp.where(
            jnp.eye(37, dtype=bool), -jnp.inf,
            -jnp.log1p(((Z[:, None] - Z[None]) ** 2).sum(-1)),
        )
        assert jnp.abs(got - logsumexp(lq, axis=1)).max() < 1e-5

    @pytest.mark.parametrize("kernel", ["student", "gaussian"])
    def test_custom_vjp_matches_autodiff(self, kernel):
        Z = jax.random.normal(jax.random.PRNGKey(3), (29, 2))

        def f_blk(Z):
            return pairwise_logkernel_logsumexp(Z, kernel, True, 8)

        def f_dense(Z):
            D = ((Z[:, None] - Z[None]) ** 2).sum(-1)
            lq = -jnp.log1p(D) if kernel == "student" else -D
            lq = jnp.where(jnp.eye(Z.shape[0], dtype=bool), -jnp.inf, lq)
            return logsumexp(lq)

        g1, g2 = jax.grad(f_blk)(Z), jax.grad(f_dense)(Z)
        assert jnp.abs(g1 - g2).max() < 1e-5


class TestRootSearch:
    def test_binary_search(self):
        t = jnp.linspace(1.0, 10.0, 50)
        r = binary_search(lambda x: x**2 - t, 50, max_iter=200)
        assert jnp.abs(r - jnp.sqrt(t)).max() < 1e-4

    def test_false_position(self):
        t = jnp.linspace(1.0, 10.0, 50)
        r = false_position(lambda x: x**2 - t, 50, max_iter=200)
        assert jnp.abs(r - jnp.sqrt(t)).max() < 1e-4

    def test_bracket_expansion(self):
        # root far outside the initial [1, 1] bracket
        t = jnp.asarray([1e4, 1e-4])
        r = binary_search(lambda x: x - t, 2, max_iter=300)
        assert jnp.abs(r - t).max() < 1e-3


class TestSparse:
    @pytest.mark.parametrize("mode", ["sum", "sum_minus_prod"])
    def test_symmetrize_matches_dense(self, mode):
        rng = np.random.default_rng(0)
        n, k = 50, 5
        idx = np.stack([rng.choice(n, size=k, replace=False) for _ in range(n)])
        vals = rng.random((n, k)).astype(np.float32)
        idx[3, 4] = -1
        vals[3, 4] = 0.0
        dense = np.zeros((n, n), np.float32)
        for i in range(n):
            for j in range(k):
                if idx[i, j] >= 0:
                    dense[i, idx[i, j]] += vals[i, j]
        expected = dense + dense.T
        if mode == "sum_minus_prod":
            expected -= dense * dense.T
        vo, io = symmetrize_sparse(jnp.array(vals), jnp.array(idx), mode=mode)
        got = np.asarray(sparse_to_dense(vo, io, n))
        assert np.abs(got - expected).max() < 1e-5

    def test_padding_convention(self):
        vals = jnp.asarray([[0.5], [0.5]])
        idx = jnp.asarray([[1], [0]])
        vo, io = symmetrize_sparse(vals, idx, mode="sum")
        assert bool(((np.asarray(io) == -1) | (np.asarray(vo) != 0)).all())

    def test_auto_width_budget_cap(self, monkeypatch):
        """Auto k_out is memory-capped at large n·degree (the uncapped
        flattened index overflowed int32 at 1.3M — regression): the cap
        drops the WEAKEST hub edges only."""
        import torchdr_tpu.ops.sparse as sp

        rng = np.random.default_rng(1)
        n, k = 64, 8
        # every row points at row 0 → row 0's symmetric degree is n-1+k
        idx = np.stack(
            [np.concatenate([[0], rng.choice(np.arange(1, n), k - 1, False)])
             for _ in range(n)]
        ).astype(np.int32)
        idx[0, 0] = 1
        vals = rng.random((n, k)).astype(np.float32) + 0.1
        monkeypatch.setattr(sp, "_AUTO_KOUT_BUDGET_ENTRIES", n * 16)
        with pytest.warns(UserWarning, match="capping k_out"):
            vo, io = sp.symmetrize_sparse(jnp.array(vals), jnp.array(idx))
        assert vo.shape == (n, 16)
        # row 0 keeps its 16 STRONGEST symmetric edges
        dense = np.asarray(sparse_to_dense(*symmetrize_sparse(
            jnp.array(vals), jnp.array(idx), k_out=n), n))
        top = np.sort(dense[0])[::-1][:16]
        got = np.sort(np.asarray(vo)[0])[::-1]
        np.testing.assert_allclose(got, top, rtol=1e-5)


def test_svd_flip_deterministic():
    X = jax.random.normal(jax.random.PRNGKey(4), (30, 5))
    U, S, V = jnp.linalg.svd(X, full_matrices=False)
    U1, V1 = svd_flip(U, V)
    U2, V2 = svd_flip(-U, -V)
    assert jnp.abs(U1 - U2).max() < 1e-6
    assert jnp.abs(V1 - V2).max() < 1e-6


class TestStreamingKnn:
    def test_matches_in_memory(self):
        from torchdr_tpu.ops.streaming import knn_graph_from_batches

        rng = np.random.default_rng(0)
        X = rng.normal(size=(200, 16)).astype(np.float32)
        batches = [X[i : i + 64] for i in range(0, 200, 64)]
        d0, i0 = knn_graph(jnp.asarray(X), k=7)
        d1, i1 = knn_graph_from_batches(batches, k=7)
        assert jnp.abs(jnp.sort(d1, 1) - jnp.sort(d0, 1)).max() < 1e-4
        # no self-matches survive
        assert not bool((np.asarray(i1) == np.arange(200)[:, None]).any())

    def test_tuple_batches(self):
        from torchdr_tpu.ops.streaming import knn_graph_from_batches

        rng = np.random.default_rng(1)
        X = rng.normal(size=(100, 8)).astype(np.float32)
        y = rng.integers(0, 3, 100)
        batches = [(X[i : i + 50], y[i : i + 50]) for i in range(0, 100, 50)]
        d, i = knn_graph_from_batches(batches, k=5)
        assert i.shape == (100, 5)


class TestApproxKnn:
    def test_recall_above_target(self):
        X = jax.random.normal(jax.random.PRNGKey(0), (2048, 32))
        d0, i0 = knn_graph(X, k=10)
        d1, i1 = knn_graph(X, k=10, mode="approx", recall_target=0.9)
        rec = np.mean(
            [len(set(np.asarray(i1[j])) & set(np.asarray(i0[j]))) / 10 for j in range(2048)]
        )
        assert rec > 0.85


class TestNativeLoader:
    def test_roundtrip_both_backends(self, tmp_path):
        from torchdr_tpu.utils.native_loader import NpyBatchLoader

        rng = np.random.default_rng(0)
        X = rng.normal(size=(1000, 16)).astype(np.float32)
        path = str(tmp_path / "x.npy")
        np.save(path, X)
        for force in [False, True]:
            ld = NpyBatchLoader(path, batch_rows=256, force_numpy=force)
            rec = np.concatenate(list(ld))
            assert np.array_equal(rec, X)
            ld.close()

    def test_random_access(self, tmp_path):
        from torchdr_tpu.utils.native_loader import NpyBatchLoader

        X = np.arange(100 * 4, dtype=np.float32).reshape(100, 4)
        path = str(tmp_path / "y.npy")
        np.save(path, X)
        ld = NpyBatchLoader(path, batch_rows=30)
        assert np.array_equal(ld.get_batch(3), X[90:])
        assert np.array_equal(ld.get_batch(0), X[:30])
        ld.close()


class TestKnnConfig:
    def test_presets(self):
        from torchdr_tpu.ops import EXACT, FAST, KnnConfig

        assert EXACT.mode == "exact"
        assert FAST.mode == "approx"
        assert "mode" in KnnConfig().kwargs()

    def test_invalid_mode_raises(self):
        from torchdr_tpu.ops import KnnConfig

        with pytest.raises(ValueError, match="knn mode"):
            KnnConfig(mode="bogus")


class TestPallasReduceKernel:
    """Interpret-mode coverage of the fused TPU repulsion kernel."""

    @pytest.mark.parametrize("kernel", ["student", "gaussian"])
    def test_fwd_matches_blockwise(self, kernel):
        from torchdr_tpu.ops.pallas.reduce_kernel import rowlse_fwd_pallas

        Z = jax.random.normal(jax.random.PRNGKey(0), (300, 2))
        ref = pairwise_logkernel_rowlse(Z, kernel, True, 64)
        got = rowlse_fwd_pallas(Z, kernel, True, q_tile=64, db_tile=128, interpret=True)
        assert jnp.abs(ref - got).max() < 1e-5

    @pytest.mark.parametrize("kernel", ["student", "gaussian"])
    def test_bwd_matches_autodiff(self, kernel):
        from torchdr_tpu.ops.pallas.reduce_kernel import (
            rowlse_bwd_pallas,
            rowlse_fwd_pallas,
        )

        Z = jax.random.normal(jax.random.PRNGKey(1), (200, 2))

        def f(Z):
            return logsumexp(pairwise_logkernel_rowlse(Z, kernel, True, 64))

        gref = jax.grad(f)(Z)
        lse = rowlse_fwd_pallas(Z, kernel, True, q_tile=64, db_tile=128, interpret=True)
        g_row = jax.nn.softmax(lse)
        got = rowlse_bwd_pallas(
            Z, lse, g_row, kernel, True, q_tile=64, db_tile=128, interpret=True
        )
        assert jnp.abs(gref - got).max() < 1e-4

    def test_non_divisible_shapes(self):
        from torchdr_tpu.ops.pallas.reduce_kernel import rowlse_fwd_pallas

        Z = jax.random.normal(jax.random.PRNGKey(2), (173, 2))
        ref = pairwise_logkernel_rowlse(Z, "student", True, 64)
        got = rowlse_fwd_pallas(Z, "student", True, q_tile=64, db_tile=64, interpret=True)
        assert jnp.abs(ref - got).max() < 1e-5


class TestAutodiffBlockwiseReduce:
    """Blockwise rowlse for metrics beyond the custom-VJP tier (COSNE's
    hyperbolic Cauchy repulsion; reference covers these via KeOps,
    torchdr/distance/keops.py:17-105)."""

    def _dense(self, Z, g):
        from torchdr_tpu.ops.metrics import pairwise_block

        D = pairwise_block(Z, Z, "sqhyperbolic")
        logq = jnp.log(g) - jnp.log(D + g**2)
        n = Z.shape[0]
        return logsumexp(
            jnp.where(jnp.eye(n, dtype=bool), -jnp.inf, logq), axis=1
        )

    @pytest.mark.slow
    def test_matches_dense_fwd_and_grad(self):
        from torchdr_tpu.ops.reduce import pairwise_logkernel_rowlse_autodiff

        g = 2.0
        Z = jax.random.normal(jax.random.PRNGKey(0), (301, 2)) * 0.2
        Z = Z / jnp.maximum(1.0, jnp.linalg.norm(Z, axis=1, keepdims=True) * 1.2)

        def blockw(z):
            return pairwise_logkernel_rowlse_autodiff(
                z, lambda D: jnp.log(g) - jnp.log(D + g**2),
                "sqhyperbolic", True, 64,
            )

        assert jnp.abs(self._dense(Z, g) - blockw(Z)).max() < 1e-5
        g1 = jax.grad(lambda z: logsumexp(self._dense(z, g)))(Z)
        g2 = jax.grad(lambda z: logsumexp(blockw(z)))(Z)
        assert jnp.abs(g1 - g2).max() < 1e-6

    def test_bounded_memory_shape(self):
        """The backward pass must not materialize n×n residuals: jit the
        grad at a size where an n² f32 would be ~0.4 GB and check it runs
        under the block budget (structural remat check)."""
        from torchdr_tpu.ops.reduce import pairwise_logkernel_rowlse_autodiff

        Z = jax.random.normal(jax.random.PRNGKey(1), (10_000, 2)) * 0.1

        def loss(z):
            return logsumexp(
                pairwise_logkernel_rowlse_autodiff(
                    z, lambda D: -jnp.log(D + 4.0), "sqhyperbolic", True, 256
                )
            )

        g = jax.jit(jax.grad(loss))(Z)
        assert bool(jnp.isfinite(g).all())


class TestIVF:
    def test_recall_on_clustered(self):
        from torchdr_tpu.ops.ivf import ivf_knn

        rng = np.random.default_rng(0)
        centers = rng.normal(scale=8.0, size=(20, 16)).astype(np.float32)
        n = 4000
        X = jnp.asarray(
            centers[rng.integers(0, 20, n)] + rng.normal(size=(n, 16)).astype(np.float32)
        )
        d0, i0 = knn_graph(X, k=10)
        d1, i1 = ivf_knn(X, k=10, nprobe=8, n_clusters=32)
        i0n, i1n = np.asarray(i0), np.asarray(i1)
        rec = np.mean([len(set(i0n[j]) & set(i1n[j])) / 10 for j in range(n)])
        assert rec > 0.98
        # no self matches
        assert not (i1n == np.arange(n)[:, None]).any()

    def test_rerank_false_matches_reranked(self):
        """Scan-score output (rerank=False skips the exact survivor
        re-rank) must agree with the re-ranked path on both storage tiers:
        the selection scores are distance-faithful under the default
        full-fidelity/high-precision scans."""
        from torchdr_tpu.ops.ivf import ivf_build, ivf_knn

        rng = np.random.default_rng(7)
        centers = rng.normal(scale=8.0, size=(24, 16)).astype(np.float32)
        X = jnp.asarray(
            np.concatenate([c + rng.normal(size=(400, 16)) for c in centers])
            .astype(np.float32)
        )
        for split_kw in ({}, {"split_bytes": 1}):
            index = ivf_build(X, n_clusters=24, **split_kw)
            d1, i1 = ivf_knn(
                None, k=10, nprobe=8, index=index, merge="tournament"
            )
            d2, i2 = ivf_knn(
                None, k=10, nprobe=8, index=index, merge="tournament",
                rerank=False,
            )
            agree = (np.asarray(i1) == np.asarray(i2)).mean()
            assert agree > 0.995, (split_kw, agree)
            rel = np.abs(np.asarray(d1) - np.asarray(d2)) / (
                np.asarray(d1) + 1e-3
            )
            assert float(rel.max()) < 2e-3, (split_kw, float(rel.max()))

    def test_prebuilt_index_reuse(self):
        from torchdr_tpu.ops.ivf import ivf_build, ivf_knn

        X = jax.random.normal(jax.random.PRNGKey(0), (1000, 8))
        index = ivf_build(X, n_clusters=16)
        d1, i1 = ivf_knn(X, k=5, nprobe=4, index=index)
        d2, i2 = ivf_knn(X, k=5, nprobe=4, index=index)
        assert np.array_equal(np.asarray(i1), np.asarray(i2))

    def test_auto_nlist(self):
        from torchdr_tpu.ops.ivf import auto_nlist

        assert auto_nlist(1_000_000) > 100

    def test_balance_allocate_waterfill(self):
        from torchdr_tpu.ops.ivf import _balance_allocate

        counts = np.array([1000, 100, 100, 1], np.int64)
        e = _balance_allocate(counts, 9)
        assert e.sum() == 9
        # the heavy cell absorbs most extras; post-split max share is
        # minimized: 1000/(e0+1) should be ~ the next-largest share
        assert e[0] >= 7
        assert e[3] == 0  # a 1-row cell can't split
        # never more parts than members
        assert (e + 1 <= np.maximum(counts, 1)).all()

    def test_balance_split_shrinks_max_cell_keeps_recall(self):
        """balance_extra splits oversized cells (seeded from their own
        members + one reassignment pass) without hurting recall, with
        supers relabeling kept consistent."""
        from torchdr_tpu.ops.ivf import ivf_build, ivf_knn

        rng = np.random.default_rng(11)
        centers = rng.normal(scale=8.0, size=(20, 16)).astype(np.float32)
        # skewed cluster masses → a few fat cells under nlist=32
        sizes = (np.array([0.35, 0.2] + [0.45 / 18] * 18) * 6000).astype(int)
        X = jnp.asarray(
            np.concatenate(
                [c + rng.normal(size=(s, 16)) for c, s in zip(centers, sizes)]
            ).astype(np.float32)
        )
        n = int(X.shape[0])
        kw = dict(n_clusters=32, n_superlist=8, kmeans_iters=8)
        idx0 = ivf_build(X, balance_extra=0, **kw)
        idx1 = ivf_build(X, balance_extra=16, **kw)
        c0 = int(np.max(np.asarray(idx0.counts)))
        c1 = int(np.max(np.asarray(idx1.counts)))
        assert idx1.centroids.shape[0] > idx0.centroids.shape[0]
        assert c1 < c0
        # layout invariants hold after the relabel: per-cell ids live in
        # [offsets[c], offsets[c]+counts[c]) and reconstruct the data
        offs = np.asarray(idx1.offsets)
        cnts = np.asarray(idx1.counts)
        ids = np.asarray(idx1.ids_sorted)
        got = np.sort(ids[ids >= 0])
        assert np.array_equal(got, np.arange(n))
        for c in (int(np.argmax(cnts)), 0):
            seg = ids[offs[c]: offs[c] + cnts[c]]
            assert (seg >= 0).all()
        d0, i0 = knn_graph(X, k=10)
        rec = []
        # nprobe scales with the cell count: smaller cells cover less mass
        # per probe — the probe budget buys the same scanned FRACTION
        # (measured here: balanced recall 0.955@10 → 0.9973@14 while the
        # max cell halves; the flagship auto-balance only adds nlist/8)
        for idx, np_ in ((idx0, 10), (idx1, 15)):
            d1, i1 = ivf_knn(None, k=10, nprobe=np_, index=idx)
            i0n, i1n = np.asarray(i0), np.asarray(i1)
            rec.append(
                np.mean([len(set(i0n[j]) & set(i1n[j])) / 10 for j in range(n)])
            )
        assert rec[1] > 0.97
        assert rec[1] >= rec[0] - 0.02

    def test_tight_budget_rank_order_recall(self):
        """Under a budget too small for the probed cells, the rank-major
        expansion (near cells keep full depth, far cells lose theirs)
        must beat the legacy depth-major round-robin, whose cut loses a
        random row fraction of EVERY probed cell (the 10M budget=70
        recall drop, ROUND3_STATUS). With a full budget both orders
        select the same slot set."""
        from torchdr_tpu.ops.ivf import ivf_build, ivf_knn

        rng = np.random.default_rng(3)
        centers = rng.normal(scale=8.0, size=(12, 16)).astype(np.float32)
        n = 6000
        X = jnp.asarray(
            centers[rng.integers(0, 12, n)]
            + rng.normal(size=(n, 16)).astype(np.float32)
        )
        _, i0 = knn_graph(X, k=10)
        index = ivf_build(X, n_clusters=48, kmeans_iters=8, chunk=64)
        i0n = np.asarray(i0)

        def rec(i1):
            i1n = np.asarray(i1)
            return np.mean(
                [len(set(i0n[j]) & set(i1n[j])) / 10 for j in range(n)]
            )

        kw = dict(k=10, nprobe=8, index=index, merge="exact")
        # tight budget: ~2/3 of what nprobe=8 cells need at this geometry
        r_rank = rec(ivf_knn(None, budget=16, budget_order="rank", **kw)[1])
        r_depth = rec(ivf_knn(None, budget=16, budget_order="depth", **kw)[1])
        assert r_rank > r_depth
        assert r_rank > 0.8
        # full budget: identical results regardless of expansion order
        _, if_r = ivf_knn(None, budget_order="rank", **kw)
        _, if_d = ivf_knn(None, budget_order="depth", **kw)
        assert np.array_equal(np.asarray(if_r), np.asarray(if_d))

    def test_host_build_matches_device_build(self):
        """numpy-X builds (zero dataset pulls over the host link) must give
        the same index and search results as device-array builds."""
        from torchdr_tpu.ops.ivf import ivf_build, ivf_knn

        rng = np.random.default_rng(3)
        centers = rng.normal(scale=8.0, size=(20, 12)).astype(np.float32)
        X = centers[rng.integers(0, 20, 3000)] + rng.normal(
            size=(3000, 12)
        ).astype(np.float32)
        ih = ivf_build(X, n_clusters=20, kmeans_iters=8)
        idv = ivf_build(jnp.asarray(X), n_clusters=20, kmeans_iters=8)
        assert np.array_equal(np.asarray(ih.ids_sorted), np.asarray(idv.ids_sorted))
        _, i1 = ivf_knn(None, k=5, index=ih, nprobe=6)
        _, i2 = ivf_knn(None, k=5, index=idv, nprobe=6)
        assert np.array_equal(np.asarray(i1), np.asarray(i2))

    def test_split_precision_storage_recall(self):
        """Split-precision storage (bf16 hi scan plane + bf16 residual,
        auto-built past the 4 GB chunk-take AOT limit) must match the f32
        index's neighbors to within the margin contract — for both host
        (numpy) and device-resident builds."""
        from torchdr_tpu.ops.ivf import ivf_build, ivf_knn

        rng = np.random.default_rng(5)
        centers = rng.normal(scale=8.0, size=(16, 16)).astype(np.float32)
        X = centers[rng.integers(0, 16, 4000)] + rng.normal(
            size=(4000, 16)
        ).astype(np.float32)
        index = ivf_build(X, n_clusters=16, kmeans_iters=8)
        assert index.X_lo is None
        _, i1 = ivf_knn(None, k=8, index=index, nprobe=6, merge="exact")
        for Xin in (X, jnp.asarray(X)):
            split = ivf_build(
                Xin, n_clusters=16, kmeans_iters=8, split_bytes=0
            )
            assert split.X_lo is not None
            assert split.X_sorted.dtype == jnp.bfloat16
            assert split.xnorm2 is not None
            # the lo plane must carry real residual bits: XLA's excess-
            # precision pass elides f32->bf16->f32 convert chains, which
            # silently zeroed lo on TPU before the bit-mask split
            assert float(jnp.max(jnp.abs(split.X_lo.astype(jnp.float32)))) > 0
            # c_cell + r_hi + r_lo reconstructs the f32 rows to ~2⁻¹⁶ rel.
            pos = np.arange(split.X_sorted.shape[0])
            cell = np.searchsorted(np.asarray(split.offsets), pos, "right") - 1
            rec = (
                np.asarray(split.centroids)[cell]
                + np.asarray(split.X_sorted, np.float32)
                + np.asarray(split.X_lo, np.float32)
            )
            ref = np.asarray(index.X_sorted)
            live = np.asarray(split.ids_sorted) >= 0
            assert np.allclose(rec[live], ref[live], rtol=1e-4, atol=3e-3)
            # exact |x|² rides along for the scan scores
            assert np.allclose(
                np.asarray(split.xnorm2)[live],
                np.einsum("ij,ij->i", ref[live], ref[live]),
                rtol=1e-5, atol=1e-4,
            )
            _, i2 = ivf_knn(None, k=8, index=split, nprobe=6, merge="exact", m=64)
            agree = np.mean(
                [
                    len(set(np.asarray(i1)[j]) & set(np.asarray(i2)[j])) / 8
                    for j in range(4000)
                ]
            )
            assert agree > 0.999

    def test_tournament_merge_exact_for_small_k(self):
        """Hierarchical (per-slot top-t, then top-m) selection is provably
        exact for k <= t: it must return the same neighbors as the wide
        exact top_k merge."""
        from torchdr_tpu.ops.ivf import ivf_build, ivf_knn

        rng = np.random.default_rng(7)
        centers = rng.normal(scale=8.0, size=(16, 12)).astype(np.float32)
        X = centers[rng.integers(0, 16, 4000)] + rng.normal(
            size=(4000, 12)
        ).astype(np.float32)
        index = ivf_build(X, n_clusters=16, kmeans_iters=8)
        d1, i1 = ivf_knn(None, k=6, index=index, nprobe=6, merge="exact")
        d2, i2 = ivf_knn(None, k=6, index=index, nprobe=6, merge="tournament")
        assert np.array_equal(np.asarray(i1), np.asarray(i2))
        assert np.allclose(np.asarray(d1), np.asarray(d2), atol=1e-5)

    def test_segmented_search_matches_monolithic(self):
        """Host-level query segmentation (the >30s-dispatch guard at 10M
        scale) must be bit-identical to the single-dispatch path."""
        from torchdr_tpu.ops.ivf import ivf_build, ivf_knn

        rng = np.random.default_rng(4)
        centers = rng.normal(scale=8.0, size=(16, 12)).astype(np.float32)
        X = centers[rng.integers(0, 16, 4000)] + rng.normal(
            size=(4000, 12)
        ).astype(np.float32)
        index = ivf_build(X, n_clusters=16, kmeans_iters=8)
        d1, i1 = ivf_knn(None, k=6, index=index, nprobe=6)
        d2, i2 = ivf_knn(None, k=6, index=index, nprobe=6, seg_rows=1024)
        assert np.array_equal(np.asarray(i1), np.asarray(i2))
        assert np.allclose(np.asarray(d1), np.asarray(d2), atol=1e-5)

    def test_removed_pallas_scan_rejected(self):
        """scan_impl="pallas" was removed round 4 (VPU-bound, demoted in
        every at-scale config — docs/ROUND4_STATUS.md); asking for it must
        fail loudly, not silently fall back."""
        from torchdr_tpu.ops.ivf import ivf_build, ivf_knn

        X = jax.random.normal(jax.random.PRNGKey(0), (1000, 8))
        index = ivf_build(X, n_clusters=16)
        with pytest.raises(ValueError, match="scan_impl"):
            ivf_knn(X, k=5, nprobe=4, index=index, scan_impl="pallas")

    def test_search_without_X(self):
        from torchdr_tpu.ops.ivf import ivf_build, ivf_knn

        X = jax.random.normal(jax.random.PRNGKey(0), (1000, 8))
        index = ivf_build(X, n_clusters=16)
        d1, i1 = ivf_knn(X, k=5, nprobe=4, index=index)
        d2, i2 = ivf_knn(None, k=5, nprobe=4, index=index)
        assert np.array_equal(np.asarray(i1), np.asarray(i2))


class TestExactWideSelect:
    """Exact Flat tier on wide databases: the selection must stay exact
    through the db-chunked running merge and under distance ties (pins the
    geometry where a two-stage tournament select was tried and rejected —
    measured +28% vs plain lax.top_k on v5e)."""

    def test_wide_db_matches_bruteforce(self):
        rng = np.random.default_rng(11)
        X = jnp.asarray(rng.normal(size=(200, 16)).astype(np.float32))
        # w = 2304 > 4*256 and divisible by 256 -> tournament path
        Y = jnp.asarray(rng.normal(size=(2304, 16)).astype(np.float32))
        d, i = knn_graph(X, Y, k=10)
        D = ((np.asarray(X)[:, None] - np.asarray(Y)[None]) ** 2).sum(-1)
        it = np.argsort(D, axis=1)[:, :10]
        assert (np.asarray(i) == it).mean() > 0.999
        np.testing.assert_allclose(
            np.asarray(d), np.sort(D, 1)[:, :10], rtol=1e-4, atol=1e-4
        )

    def test_db_chunked_self_mode(self):
        rng = np.random.default_rng(12)
        X = jnp.asarray(rng.normal(size=(1536, 8)).astype(np.float32))
        # db_block=512: chunked path with 512-wide (tournament-eligible
        # only above 1024) and diag exclusion
        d, i = knn_graph(X, k=5, db_block=512)
        d2, i2 = knn_graph(X, k=5)  # single dispatch
        assert np.array_equal(np.sort(np.asarray(i), 1), np.sort(np.asarray(i2), 1))

    def test_duplicate_distance_ties_keep_count(self):
        # ties across slot boundaries: top-k count must survive the merge
        rng = np.random.default_rng(13)
        base = rng.normal(size=(64, 4)).astype(np.float32)
        Y = jnp.asarray(np.tile(base, (24, 1)))  # 1536 rows, every row x24
        X = jnp.asarray(base[:8])
        d, i = knn_graph(X, Y, k=12, exclude_diag=False)
        assert np.asarray(d).shape == (8, 12)
        # each query's 12 nearest are copies of itself at distance ~0
        assert np.allclose(np.asarray(d), 0.0, atol=1e-5)


class TestHostChunkedExact:
    def test_matches_single_dispatch(self):
        from torchdr_tpu.ops.distance import knn_graph_host_chunked

        X = jax.random.normal(jax.random.PRNGKey(0), (900, 12))
        d1, i1 = knn_graph(X, k=7)
        d2, i2 = knn_graph_host_chunked(X, k=7, query_chunk=256)
        assert np.array_equal(np.sort(i1, 1), np.sort(i2, 1))

    def test_cross_mode(self):
        from torchdr_tpu.ops.distance import knn_graph_host_chunked

        X = jax.random.normal(jax.random.PRNGKey(1), (500, 8))
        Y = jax.random.normal(jax.random.PRNGKey(2), (300, 8))
        d1, i1 = knn_graph(X, Y, k=5, exclude_diag=False)
        d2, i2 = knn_graph_host_chunked(X, Y, k=5, query_chunk=128)
        assert np.array_equal(np.asarray(i1), np.asarray(i2))


class TestPQ:
    """Product-quantization memory tier (reference role: Faiss IVFPQ,
    torchdr/distance/faiss.py:113-221; its measured recall band on
    clustered data is ~20-33%, BENCHMARK_RESULTS.md:11-13,72)."""

    def _data(self, n=6000, d=32):
        rng = np.random.default_rng(0)
        centers = rng.normal(scale=10.0, size=(20, d)).astype(np.float32)
        return jnp.asarray(
            centers[rng.integers(0, 20, n)]
            + rng.normal(size=(n, d)).astype(np.float32)
        )

    def test_roundtrip_shapes_and_compression(self):
        from torchdr_tpu.ops.pq import pq_encode, pq_train

        X = self._data()
        cb = pq_train(X[:2000], M=8)
        codes = pq_encode(X, cb)
        assert codes.shape == (X.shape[0], 8) and codes.dtype == jnp.uint8

    @pytest.mark.slow
    def test_recall_in_reference_band_and_refine_recovers(self):
        from torchdr_tpu.ops.pq import pq_knn

        X = self._data()
        d0, i0 = knn_graph(X, k=10, precision="highest")
        i0 = np.asarray(i0)

        def recall(i):
            ig = np.asarray(i)
            return np.mean(
                [len(set(ig[j]) & set(i0[j])) / 10 for j in range(1000)]
            )

        _, i1 = pq_knn(X, k=10, M=8)
        r_adc = recall(i1)
        assert r_adc > 0.10  # quantized ranks, reference-band floor
        _, i2 = pq_knn(X, k=10, M=8, refine_from=X, refine_factor=8)
        r_ref = recall(i2)
        assert r_ref > r_adc + 0.1  # refinement recovers real recall

    def test_no_self_matches(self):
        from torchdr_tpu.ops.pq import pq_knn

        X = self._data(n=2000)
        _, i = pq_knn(X, k=5, M=8)
        assert not (np.asarray(i) == np.arange(2000)[:, None]).any()

    def test_indivisible_d_raises(self):
        from torchdr_tpu.ops.pq import pq_train

        with pytest.raises(ValueError, match="divisible"):
            pq_train(jnp.zeros((100, 30)), M=8)


class TestPallasUmapRepulsion:
    """Interpret-mode coverage of the fused shared-negative UMAP repulsion
    kernel (ops/pallas/umap_kernel.py) against an f64 direct-difference
    reference of the shared-negatives force (models/neighbor/base.py:196-233)."""

    A, B, EPS = 1.577, 0.8951, 1e-3

    def _reference(self, Z, neg, w):
        Z64 = np.asarray(Z, np.float64)
        Zn = Z64[neg]
        D = ((Z64[:, None, :] - Zn[None, :, :]) ** 2).sum(-1)
        coef = -2.0 * self.B / ((D + self.EPS) * (1.0 + self.A * D**self.B))
        valid = np.asarray(neg)[None, :] != np.arange(Z.shape[0])[:, None]
        coef = np.where(valid, coef, 0.0) * np.asarray(w, np.float64)[:, None]
        return np.clip(coef.sum(1)[:, None] * Z64 - coef @ Zn, -4.0, 4.0)

    @pytest.mark.parametrize("d", [2, 3])
    def test_matches_f64_reference(self, d):
        from torchdr_tpu.ops.pallas.umap_kernel import fused_shared_repulsion

        rng = np.random.default_rng(0)
        n, S = 700, 256
        Z = rng.normal(size=(n, d)).astype(np.float32)
        neg = rng.integers(0, n, S).astype(np.int32)
        w = (rng.integers(0, 40, n) / S).astype(np.float32)
        got = np.asarray(
            fused_shared_repulsion(
                jnp.asarray(Z), jnp.asarray(neg), jnp.asarray(w),
                self.A, self.B, self.EPS, block=128, interpret=True,
            )
        )
        assert np.abs(got - self._reference(Z, neg, w)).max() < 1e-4

    def test_self_collision_masked_and_padding(self):
        from torchdr_tpu.ops.pallas.umap_kernel import fused_shared_repulsion

        rng = np.random.default_rng(1)
        n, S = 150, 128  # n far from the block multiple: padded rows dropped
        Z = rng.normal(size=(n, 2)).astype(np.float32)
        neg = np.arange(S, dtype=np.int32)  # every sample collides with row s
        w = np.ones(n, np.float32)
        got = np.asarray(
            fused_shared_repulsion(
                jnp.asarray(Z), jnp.asarray(neg), jnp.asarray(w),
                self.A, self.B, self.EPS, block=128, interpret=True,
            )
        )
        assert got.shape == (n, 2)
        assert np.abs(got - self._reference(Z, neg, w)).max() < 1e-4
