"""Error-path / input-validation coverage (reference themes:
torchdr/tests/test_validation.py, test_affinity_matcher.py error paths,
test_dataloader.py edge cases)."""

import jax.numpy as jnp
import numpy as np
import pytest

import torchdr_tpu as tdr
from torchdr_tpu.utils import validation as V


@pytest.fixture()
def X():
    rng = np.random.default_rng(0)
    return rng.normal(size=(60, 8)).astype(np.float32)


class TestCheckFamily:
    def test_check_NaNs(self):
        V.check_NaNs(np.ones(3))
        with pytest.raises(ValueError, match="NaN"):
            V.check_NaNs(np.array([1.0, np.nan]))

    def test_check_nonnegativity(self):
        V.check_nonnegativity(np.array([0.0, 1.0]))
        with pytest.raises(ValueError, match="negative"):
            V.check_nonnegativity(np.array([-1.0]))

    def test_check_shape(self):
        V.check_shape(np.zeros((2, 3)), (2, 3))
        with pytest.raises(ValueError, match="shape"):
            V.check_shape(np.zeros((2, 3)), (3, 2))

    def test_check_symmetry(self):
        A = np.array([[1.0, 2.0], [2.0, 1.0]])
        V.check_symmetry(A)
        with pytest.raises(ValueError, match="symmetric"):
            V.check_symmetry(np.array([[1.0, 2.0], [0.0, 1.0]]))

    def test_check_marginal_log_and_linear(self):
        P = np.full((4, 4), 0.25)
        V.check_marginal(P, np.ones(4))
        with pytest.raises(ValueError, match="marginal"):
            V.check_marginal(P, 2 * np.ones(4))
        V.check_marginal(np.log(P), np.zeros(4), log=True)

    def test_check_neighbor_param_clamps_and_raises(self):
        assert V.check_neighbor_param(100, 30) == 29
        assert V.check_neighbor_param(5, 30) == 5
        with pytest.raises(ValueError):
            V.check_neighbor_param(0, 30)

    def test_check_similarity_dense_sparse(self):
        dense = np.arange(12, dtype=np.float32).reshape(3, 4)
        idx = np.array([[0, 1], [2, -1], [3, 0]], np.int32)
        vals = np.array([[0, 1], [6, 0], [11, 8]], np.float32)
        V.check_similarity_dense_sparse(dense, vals, idx)
        with pytest.raises(ValueError, match="mismatch"):
            V.check_similarity_dense_sparse(dense, vals + 1.0, idx)


class TestEstimatorErrorPaths:
    def test_nan_input_raises(self, X):
        Xn = X.copy()
        Xn[3, 2] = np.nan
        with pytest.raises(ValueError):
            tdr.PCA(n_components=2).fit_transform(Xn)

    def test_1d_input_raises(self):
        with pytest.raises(ValueError):
            tdr.PCA(n_components=2).fit_transform(np.ones(16, np.float32))

    def test_bad_init_raises(self, X):
        with pytest.raises(ValueError, match="init"):
            tdr.TSNE(perplexity=5, max_iter=5, init="bogus").fit_transform(X)

    def test_bad_optimizer_raises(self, X):
        with pytest.raises(ValueError):
            tdr.TSNE(perplexity=5, max_iter=5, optimizer="Bogus").fit_transform(X)

    def test_bad_metric_raises(self, X):
        with pytest.raises(ValueError, match="distance"):
            tdr.TSNE(perplexity=5, max_iter=5, metric="cosine-ish").fit_transform(X)

    def test_perplexity_exceeding_n_raises(self, X):
        # reference: NeighborEmbedding raises when n <= perplexity
        with pytest.raises(ValueError, match="perplexity"):
            tdr.TSNE(perplexity=500, max_iter=5, random_state=0).fit_transform(X)

    def test_transform_before_fit_raises(self, X):
        with pytest.raises(ValueError):
            tdr.PCA(n_components=2).transform(X)


class TestStreamingKnnEdgeCases:
    def test_empty_iterable_raises(self):
        from torchdr_tpu.ops.streaming import knn_graph_from_batches

        with pytest.raises(ValueError, match="empty"):
            knn_graph_from_batches(iter([]), k=3)

    def test_batch_size_invariance(self):
        from torchdr_tpu.ops.streaming import knn_graph_from_batches

        rng = np.random.default_rng(0)
        X = rng.normal(size=(200, 8)).astype(np.float32)
        d1, i1 = knn_graph_from_batches([X[:50], X[50:120], X[120:]], k=5)
        d2, i2 = knn_graph_from_batches([X[i : i + 25] for i in range(0, 200, 25)], k=5)
        assert np.allclose(np.asarray(d1), np.asarray(d2), atol=1e-5)
        assert np.array_equal(np.asarray(i1), np.asarray(i2))

    def test_matches_in_memory_all_metrics(self):
        from torchdr_tpu.ops.distance import knn_graph
        from torchdr_tpu.ops.streaming import knn_graph_from_batches

        rng = np.random.default_rng(1)
        X = rng.normal(size=(150, 6)).astype(np.float32)
        for metric in ("sqeuclidean", "euclidean", "manhattan", "angular"):
            d1, i1 = knn_graph_from_batches([X[:70], X[70:]], k=4, metric=metric)
            d2, i2 = knn_graph(X, k=4, metric=metric, exclude_diag=True)
            assert np.allclose(np.sort(d1, 1), np.sort(d2, 1), atol=1e-4), metric

    def test_tuple_and_torch_batches(self):
        import torch

        from torchdr_tpu.ops.streaming import knn_graph_from_batches

        rng = np.random.default_rng(2)
        X = rng.normal(size=(80, 5)).astype(np.float32)
        batches = [
            (torch.from_numpy(X[:40]), torch.zeros(40)),
            (torch.from_numpy(X[40:]), torch.zeros(40)),
        ]
        d, i = knn_graph_from_batches(batches, k=3)
        assert np.asarray(d).shape == (80, 3)
        # no self matches
        assert not (np.asarray(i) == np.arange(80)[:, None]).any()

    def test_no_self_matches_across_batch_boundaries(self):
        from torchdr_tpu.ops.streaming import knn_graph_from_batches

        rng = np.random.default_rng(3)
        X = rng.normal(size=(64, 4)).astype(np.float32)
        _, i = knn_graph_from_batches([X[i : i + 16] for i in range(0, 64, 16)], k=6)
        assert not (np.asarray(i) == np.arange(64)[:, None]).any()


class TestDuplicateHandling:
    def test_duplicates_map_back_identically(self):
        # reference: torchdr/tests/test_estimators.py:31-93
        rng = np.random.default_rng(0)
        X = rng.normal(size=(40, 6)).astype(np.float32)
        Xd = np.concatenate([X, X[:10]], axis=0)
        Z = np.asarray(
            tdr.PCA(n_components=2).fit_transform(Xd)
        )
        assert np.allclose(Z[40:], Z[:10], atol=1e-5)

    def test_umap_duplicate_rows(self):
        rng = np.random.default_rng(1)
        X = rng.normal(size=(50, 5)).astype(np.float32)
        Xd = np.concatenate([X, X[:8]], axis=0)
        Z = np.asarray(
            tdr.UMAP(n_neighbors=8, max_iter=50, random_state=0).fit_transform(Xd)
        )
        assert np.allclose(Z[50:], Z[:8], atol=1e-4)
