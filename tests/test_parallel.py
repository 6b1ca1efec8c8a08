"""Multi-device tests on the 8-virtual-CPU mesh (real XLA collectives).

The TPU-world analog of the reference's mocked DistributedContext tests
(reference: torchdr/tests/test_distributed.py) — but the collectives
actually execute.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import torchdr_tpu as tdr
from torchdr_tpu.ops.distance import knn_graph
from torchdr_tpu.parallel.knn import knn_graph_ring, knn_graph_sharded
from torchdr_tpu.parallel.mesh import (
    chunk_bounds,
    make_mesh,
    rank_of_rows,
    shard_rows,
)

needs_8 = pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")


@pytest.fixture(scope="module")
def mesh():
    return make_mesh(8)


class TestChunkMath:
    def test_bounds_cover_everything(self):
        # coverage/no-gap invariant (reference: test_distributed.py:57-204)
        for n in [7, 8, 100, 1037]:
            for world in [1, 3, 8]:
                spans = [chunk_bounds(n, world, r) for r in range(world)]
                assert spans[0][0] == 0
                total = 0
                pos = 0
                for start, size in spans:
                    assert start == pos
                    pos += size
                    total += size
                assert total == n

    def test_rank_inverse(self):
        n, world = 103, 8
        ranks = np.asarray(rank_of_rows(jnp.arange(n), n, world))
        for r in range(world):
            start, size = chunk_bounds(n, world, r)
            assert (ranks[start : start + size] == r).all()


@needs_8
class TestShardedKnn:
    def test_sharded_matches_single(self, mesh):
        X = jax.random.normal(jax.random.PRNGKey(0), (201, 16))
        d0, i0 = knn_graph(X, k=10)
        d1, i1 = knn_graph_sharded(X, 10, mesh)
        assert jnp.abs(jnp.sort(d1, 1) - jnp.sort(d0, 1)).max() < 1e-4

    def test_ring_matches_single(self, mesh):
        X = jax.random.normal(jax.random.PRNGKey(1), (160, 16))
        d0, i0 = knn_graph(X, k=10)
        d2, i2 = knn_graph_ring(X, 10, mesh)
        assert jnp.abs(jnp.sort(d2, 1) - jnp.sort(d0, 1)).max() < 1e-4
        # exact recall
        rec = np.mean(
            [len(set(np.asarray(i2[i])) & set(np.asarray(i0[i]))) / 10 for i in range(160)]
        )
        assert rec == 1.0


@needs_8
class TestDistributedTraining:
    @pytest.mark.slow
    def test_umap_distributed_matches_single(self, mesh):
        from sklearn.datasets import make_moons

        X, y = make_moons(n_samples=96, noise=0.05, random_state=0)
        X = X.astype(np.float32)
        Z1 = tdr.UMAP(n_neighbors=15, max_iter=200, random_state=0).fit_transform(X)
        Z2 = tdr.UMAP(
            n_neighbors=15, max_iter=200, random_state=0, distributed=True, mesh=mesh
        ).fit_transform(X)
        # same seeds + deterministic collectives → near-identical embeddings
        assert np.abs(np.asarray(Z1) - np.asarray(Z2)).max() < 1e-2

    def test_tsne_distributed_quality(self, mesh):
        from sklearn.datasets import make_moons

        X, y = make_moons(n_samples=96, noise=0.05, random_state=0)
        X = X.astype(np.float32)
        Z = tdr.TSNE(
            perplexity=15, max_iter=300, random_state=0, distributed=True, mesh=mesh
        ).fit_transform(X)
        assert tdr.silhouette_score(Z, y) > 0.15


@needs_8
class TestShardedRepulsion:
    """Row-sharded O(n²) repulsion (the analog of the reference's per-rank
    dense-repulsion chunks, torchdr/neighbor_embedding/tsne.py:172-180)."""

    def test_matches_single_device(self, mesh):
        from torchdr_tpu.ops.reduce import (
            pairwise_logkernel_rowlse,
            pairwise_logkernel_rowlse_sharded,
        )

        Z = jax.random.normal(jax.random.PRNGKey(0), (1003, 2))
        for kernel in ("student", "gaussian"):
            ref = pairwise_logkernel_rowlse(Z, kernel, True, 256)
            sh = pairwise_logkernel_rowlse_sharded(Z, mesh, kernel, True, 256)
            assert jnp.abs(ref - sh).max() < 1e-5

            def loss_ref(z):
                return jnp.sum(jnp.sin(pairwise_logkernel_rowlse(z, kernel, True, 256)))

            def loss_sh(z):
                return jnp.sum(
                    jnp.sin(pairwise_logkernel_rowlse_sharded(z, mesh, kernel, True, 256))
                )

            g_ref = jax.grad(loss_ref)(Z)
            g_sh = jax.grad(loss_sh)(Z)
            assert jnp.abs(g_ref - g_sh).max() < 1e-5

    def test_per_device_flops_drop(self, mesh):
        """Each device computes ~1/8 of the O(n²) blocks (VERDICT r1 §4)."""
        from torchdr_tpu.ops.reduce import (
            pairwise_logkernel_rowlse,
            pairwise_logkernel_rowlse_sharded,
        )

        Z = jnp.zeros((2048, 16))
        # block_size = n → the single-device pass is ONE map iteration, so
        # cost_analysis (which counts loop bodies once) reflects total work.
        f1 = jax.jit(
            lambda z: pairwise_logkernel_rowlse(z, "student", True, 2048)
        ).lower(Z).compile()
        f2 = jax.jit(
            lambda z: pairwise_logkernel_rowlse_sharded(z, mesh, "student", True, 2048)
        ).lower(Z).compile()
        single = f1.cost_analysis().get("flops")
        sharded = f2.cost_analysis().get("flops")
        assert sharded < single / 4  # ~1/8 plus psum/mask overhead


@needs_8
class TestDistributedPCA:
    def test_sharded_input_matches_dense(self, mesh):
        rng = np.random.default_rng(0)
        X = rng.normal(size=(256, 12)).astype(np.float32)
        Z1 = np.abs(np.asarray(tdr.PCA(n_components=3).fit_transform(X)))
        Xs = shard_rows(jnp.asarray(X), mesh)
        Z2 = np.abs(np.asarray(tdr.PCA(n_components=3)._fit_transform(Xs)))
        assert np.abs(Z1 - Z2).max() < 1e-2


@needs_8
class TestDistributedEval:
    """Per-chunk kNN metrics over the mesh (reference: torchdr/eval/
    knn_labels.py:54-64, eval/neighborhood_preservation.py:51-62)."""

    def test_knn_label_accuracy_matches(self, mesh, toy_blobs):
        X, y = toy_blobs
        a1 = tdr.knn_label_accuracy(X, y, k=10)
        a2 = tdr.knn_label_accuracy(X, y, k=10, mesh=mesh)
        assert a1 == pytest.approx(a2, abs=1e-6)

    def test_neighborhood_preservation_matches(self, mesh, toy_blobs):
        X, y = toy_blobs
        Z = tdr.PCA(n_components=2).fit_transform(X)
        p1 = tdr.neighborhood_preservation(X, Z, K=10)
        p2 = tdr.neighborhood_preservation(X, Z, K=10, mesh=mesh)
        assert p1 == pytest.approx(p2, abs=1e-6)

    def test_per_sample_shape(self, mesh, toy_blobs):
        X, y = toy_blobs
        per = tdr.knn_label_accuracy(X, y, k=5, mesh=mesh, return_per_sample=True)
        assert per.shape == (X.shape[0],)


@needs_8
class TestDistributedSymmetrize:
    @pytest.mark.parametrize("mode", ["sum", "sum_minus_prod"])
    def test_matches_single_device(self, mesh, mode):
        from torchdr_tpu.ops.sparse import sparse_to_dense, symmetrize_sparse
        from torchdr_tpu.parallel.sparse import distributed_symmetrize_sparse

        rng = np.random.default_rng(0)
        n, k = 100, 7
        idx = np.stack(
            [rng.choice(n, size=k, replace=False) for _ in range(n)]
        ).astype(np.int32)
        vals = rng.random((n, k)).astype(np.float32)
        v1, i1 = symmetrize_sparse(jnp.asarray(vals), jnp.asarray(idx), mode=mode)
        v2, i2 = distributed_symmetrize_sparse(
            jnp.asarray(vals), jnp.asarray(idx), mesh, mode=mode
        )
        d1 = np.asarray(sparse_to_dense(v1, i1, n))
        d2 = np.asarray(sparse_to_dense(v2, i2, n))
        assert np.abs(d1 - d2).max() < 1e-5


@needs_8
class TestDistributedNegativeSampling:
    def test_largevis_distributed_quality(self, mesh):
        from sklearn.datasets import make_moons

        X, y = make_moons(n_samples=96, noise=0.05, random_state=0)
        X = X.astype(np.float32)
        Z = tdr.LargeVis(
            perplexity=15, max_iter=300, random_state=0, distributed=True, mesh=mesh
        ).fit_transform(X)
        assert tdr.silhouette_score(Z, y) > 0.15

    def test_infotsne_distributed_runs(self, mesh):
        from sklearn.datasets import make_moons

        X, y = make_moons(n_samples=96, noise=0.05, random_state=0)
        X = X.astype(np.float32)
        Z = tdr.InfoTSNE(
            perplexity=15, n_negatives=40, max_iter=100, random_state=0,
            distributed=True, mesh=mesh,
        ).fit_transform(X)
        assert np.isfinite(np.asarray(Z)).all()


@needs_8
class TestSingleDeviceMesh:
    def test_mesh_of_one(self):
        from sklearn.datasets import make_moons

        from torchdr_tpu.parallel import make_mesh

        X, y = make_moons(n_samples=64, noise=0.05, random_state=0)
        X = X.astype(np.float32)
        mesh1 = make_mesh(1)
        Z = tdr.UMAP(
            n_neighbors=10, max_iter=50, random_state=0, distributed=True, mesh=mesh1
        ).fit_transform(X)
        assert np.isfinite(np.asarray(Z)).all()


@needs_8
class TestDistributedStreaming:
    """Per-chunk distributed streaming search (reference:
    torchdr/distance/faiss.py:786-867)."""

    def test_streaming_mesh_matches_single(self, mesh):
        from torchdr_tpu.ops.streaming import knn_graph_from_batches

        rng = np.random.default_rng(0)
        X = rng.normal(size=(200, 8)).astype(np.float32)
        batches = [X[:80], X[80:150], X[150:]]
        d1, i1 = knn_graph_from_batches(batches, k=5)
        d2, i2 = knn_graph_from_batches(batches, k=5, mesh=mesh)
        assert np.allclose(np.asarray(d1), np.asarray(d2), atol=1e-4)
        assert np.array_equal(np.asarray(i1), np.asarray(i2))

    def test_cross_knn_sharded_queries(self, mesh):
        from torchdr_tpu.parallel.knn import knn_graph_sharded_queries

        rng = np.random.default_rng(1)
        Q = rng.normal(size=(93, 8)).astype(np.float32)
        DB = rng.normal(size=(170, 8)).astype(np.float32)
        d1, i1 = knn_graph_sharded_queries(
            jnp.asarray(Q), jnp.asarray(DB), 7, mesh
        )
        d2, i2 = knn_graph(jnp.asarray(Q), jnp.asarray(DB), k=7, exclude_diag=False)
        assert np.allclose(np.sort(d1, 1), np.sort(d2, 1), atol=1e-4)
