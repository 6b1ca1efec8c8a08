"""Streaming (batch-fed) kNN edge-case suite.

Mirrors the reference's DataLoader test coverage (reference:
torchdr/tests/test_dataloader.py, 437 LoC): batch-size invariance,
exclude-self semantics, metric sweep, tuple/torch-loader inputs,
generators, duplicates, and error paths — against the TPU streaming path
(ops/streaming.py) instead of a Faiss index build.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from torchdr_tpu.ops.distance import knn_graph
from torchdr_tpu.ops.streaming import knn_graph_from_batches


@pytest.fixture(scope="module")
def X():
    rng = np.random.default_rng(7)
    centers = rng.normal(scale=5.0, size=(4, 8))
    return np.concatenate(
        [c + rng.normal(size=(50, 8)) for c in centers], axis=0
    ).astype(np.float32)


def _split(X, sizes):
    out, i = [], 0
    for s in sizes:
        out.append(X[i : i + s])
        i += s
    assert i == X.shape[0]
    return out


class TestBatchInvariance:
    @pytest.mark.parametrize(
        "sizes",
        [(200,), (100, 100), (64, 64, 64, 8), (1, 99, 100)],
    )
    def test_same_result_any_batching(self, X, sizes):
        """Splitting the dataset differently must not change the graph
        (reference batch-size invariance, test_dataloader.py)."""
        d, i = knn_graph_from_batches(_split(X, sizes), k=7)
        d_ref, i_ref = knn_graph_from_batches([X], k=7)
        assert np.array_equal(np.asarray(i), np.asarray(i_ref))
        assert np.allclose(np.asarray(d), np.asarray(d_ref), atol=1e-5)

    def test_matches_monolithic_knn_graph(self, X):
        d, i = knn_graph_from_batches(_split(X, (80, 80, 40)), k=5)
        d_ref, i_ref = knn_graph(jnp.asarray(X), k=5, exclude_diag=True)
        assert np.array_equal(np.asarray(i), np.asarray(i_ref))
        assert np.allclose(np.asarray(d), np.asarray(d_ref), atol=1e-5)


class TestExcludeSelf:
    def test_self_absent_when_excluded(self, X):
        _, i = knn_graph_from_batches(_split(X, (100, 100)), k=6)
        rows = np.arange(X.shape[0])[:, None]
        assert not (np.asarray(i) == rows).any()

    def test_self_first_when_included(self, X):
        d, i = knn_graph_from_batches(
            _split(X, (100, 100)), k=6, exclude_self=False
        )
        i, d = np.asarray(i), np.asarray(d)
        assert np.array_equal(i[:, 0], np.arange(X.shape[0]))
        # gram-expansion numerics: self-distance is ~0, not exactly 0
        assert np.allclose(d[:, 0], 0.0, atol=1e-3)

    def test_duplicate_rows_survive_exclusion(self):
        """Only the row's own index is stripped — an exact duplicate at
        another index must remain the nearest neighbor at distance 0
        (reference: torchdr duplicate-handling, test_estimators.py:31-93)."""
        rng = np.random.default_rng(0)
        X = rng.normal(size=(30, 5)).astype(np.float32)
        X[17] = X[3]  # exact duplicate pair
        d, i = knn_graph_from_batches([X[:15], X[15:]], k=3)
        i, d = np.asarray(i), np.asarray(d)
        assert i[3, 0] == 17 and i[17, 0] == 3
        assert d[3, 0] == 0.0 and d[17, 0] == 0.0


class TestMetrics:
    @pytest.mark.parametrize(
        "metric", ["euclidean", "sqeuclidean", "manhattan", "angular"]
    )
    def test_metric_consistency(self, X, metric):
        d, i = knn_graph_from_batches(_split(X, (128, 72)), k=4, metric=metric)
        d_ref, i_ref = knn_graph(
            jnp.asarray(X), k=4, metric=metric, exclude_diag=True
        )
        assert np.array_equal(np.asarray(i), np.asarray(i_ref))
        assert np.allclose(np.asarray(d), np.asarray(d_ref), atol=1e-4)

    def test_unknown_metric_raises(self, X):
        with pytest.raises(ValueError, match="not supported"):
            knn_graph_from_batches([X], k=3, metric="mahalanobis")


class TestInputKinds:
    def test_tuple_batches(self, X):
        """(data, target) tuples — the torch DataLoader convention."""
        y = np.zeros(X.shape[0], np.int32)
        batches = [(X[:100], y[:100]), (X[100:], y[100:])]
        _, i = knn_graph_from_batches(batches, k=5)
        _, i_ref = knn_graph_from_batches([X], k=5)
        assert np.array_equal(np.asarray(i), np.asarray(i_ref))

    def test_torch_dataloader(self, X):
        torch = pytest.importorskip("torch")
        from torch.utils.data import DataLoader, TensorDataset

        ds = TensorDataset(torch.from_numpy(X), torch.zeros(X.shape[0]))
        loader = DataLoader(ds, batch_size=64, shuffle=False)
        _, i = knn_graph_from_batches(loader, k=5)
        _, i_ref = knn_graph_from_batches([X], k=5)
        assert np.array_equal(np.asarray(i), np.asarray(i_ref))

    def test_generator_single_pass(self, X):
        """A generator is consumed exactly once (the device keeps the DB)."""
        calls = []

        def gen():
            for b in _split(X, (64, 64, 72)):
                calls.append(1)
                yield b

        _, i = knn_graph_from_batches(gen(), k=4)
        assert len(calls) == 3
        _, i_ref = knn_graph_from_batches([X], k=4)
        assert np.array_equal(np.asarray(i), np.asarray(i_ref))

    def test_float64_batches_are_cast(self, X):
        d, i = knn_graph_from_batches([X.astype(np.float64)], k=3)
        assert np.asarray(d).dtype == np.float32
        _, i_ref = knn_graph_from_batches([X], k=3)
        assert np.array_equal(np.asarray(i), np.asarray(i_ref))


class TestBoundariesAndErrors:
    def test_empty_iterable_raises(self):
        with pytest.raises(ValueError, match="empty"):
            knn_graph_from_batches([], k=3)

    def test_k_equals_n_minus_one(self):
        rng = np.random.default_rng(1)
        X = rng.normal(size=(12, 4)).astype(np.float32)
        d, i = knn_graph_from_batches([X[:6], X[6:]], k=11)
        i = np.asarray(i)
        # each row sees every other row exactly once
        for r in range(12):
            assert sorted(i[r]) == [j for j in range(12) if j != r]

    def test_single_row_batches(self, X):
        Xs = X[:20]
        _, i = knn_graph_from_batches([Xs[j : j + 1] for j in range(20)], k=3)
        _, i_ref = knn_graph_from_batches([Xs], k=3)
        assert np.array_equal(np.asarray(i), np.asarray(i_ref))

    def test_output_shapes(self, X):
        k = 9
        d, i = knn_graph_from_batches(_split(X, (150, 50)), k=k)
        assert d.shape == (X.shape[0], k) and i.shape == (X.shape[0], k)
        assert np.asarray(i).dtype in (np.int32, np.int64)
        assert (np.asarray(d) >= 0).all()
