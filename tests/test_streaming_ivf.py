"""Streaming IVF: incremental batch build, cross-query search, beyond-HBM
segmented kNN.

Round-3 closure of VERDICT #3/#5: `ivf_build_from_batches` assembles the
sorted layout without ever materializing the unsorted dataset
(reference: torchdr/distance/faiss.py:594-738), `ivf_knn_queries` is the
Faiss Y≠X search analog, and `knn_graph_streaming` splits the database
into per-segment device indexes so datasets larger than device memory
still get a kNN graph.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from torchdr_tpu.ops.distance import knn_graph
from torchdr_tpu.ops.ivf import (
    ivf_build,
    ivf_build_from_batches,
    ivf_knn,
    ivf_knn_queries,
)
from torchdr_tpu.ops.streaming import knn_graph_streaming


@pytest.fixture(scope="module")
def data():
    rng = np.random.default_rng(7)
    centers = rng.normal(scale=8.0, size=(24, 12))
    X = np.concatenate(
        [c + rng.normal(size=(250, 12)) for c in centers]
    ).astype(np.float32)
    rng.shuffle(X)  # batches must not align with clusters
    i0 = np.asarray(knn_graph(jnp.asarray(X), k=10)[1])
    return X, i0


def recall(i_true, i_test, k=10):
    hits = sum(
        len(set(i_true[q]) & set(i_test[q])) for q in range(i_true.shape[0])
    )
    return hits / (i_true.shape[0] * k)


class TestBuildFromBatches:
    @pytest.mark.slow
    def test_matches_monolithic_build(self, data):
        X, i0 = data
        batches = [X[a : a + 1000] for a in range(0, X.shape[0], 1000)]
        idx_b = ivf_build_from_batches(batches, n_clusters=24)
        idx_m = ivf_build(jnp.asarray(X), n_clusters=24)
        assert idx_b.n == idx_m.n
        # same layout convention: ids partition the row space
        ids = np.asarray(idx_b.ids_sorted)
        assert sorted(ids[ids >= 0].tolist()) == list(range(X.shape[0]))
        _, i_b = ivf_knn(None, k=10, nprobe=8, index=idx_b)
        _, i_m = ivf_knn(None, k=10, nprobe=8, index=idx_m)
        r_b, r_m = recall(i0, np.asarray(i_b)), recall(i0, np.asarray(i_m))
        assert r_b > 0.97
        assert abs(r_b - r_m) < 0.02

    def test_tuple_batches_and_torch(self, data):
        X, _ = data
        torch = pytest.importorskip("torch")
        batches = [
            (torch.from_numpy(X[a : a + 1500].copy()), None)
            for a in range(0, X.shape[0], 1500)
        ]
        idx = ivf_build_from_batches(batches, n_clusters=16)
        assert idx.n == X.shape[0]

    def test_residual_split_from_batches(self, data):
        X, i0 = data
        batches = [X[a : a + 1000] for a in range(0, X.shape[0], 1000)]
        idx = ivf_build_from_batches(batches, n_clusters=24, split_bytes=1)
        assert idx.X_lo is not None
        _, i_b = ivf_knn(None, k=10, nprobe=8, index=idx)
        assert recall(i0, np.asarray(i_b)) > 0.97


class TestQueriesSearch:
    @pytest.mark.slow
    def test_self_queries_match_self_path(self, data):
        X, i0 = data
        idx = ivf_build(jnp.asarray(X), n_clusters=24)
        _, i_self = ivf_knn(None, k=10, nprobe=8, index=idx)
        _, i_q = ivf_knn_queries(
            jnp.asarray(X), idx, k=10, nprobe=8,
            query_ids=np.arange(X.shape[0], dtype=np.int32),
        )
        r_s, r_q = recall(i0, np.asarray(i_self)), recall(i0, np.asarray(i_q))
        assert r_q > r_s - 0.02
        # no self-matches leaked
        assert not (np.asarray(i_q) == np.arange(X.shape[0])[:, None]).any()

    def test_disjoint_queries(self, data):
        X, _ = data
        idx = ivf_build(jnp.asarray(X[:5000]), n_clusters=16)
        Q = X[5000:]
        d_q, i_q = ivf_knn_queries(jnp.asarray(Q), idx, k=5, nprobe=10)
        d0, i0 = knn_graph(jnp.asarray(Q), jnp.asarray(X[:5000]), k=5,
                           exclude_diag=False)
        assert recall(np.asarray(i0), np.asarray(i_q), 5) > 0.95

    def test_residual_raw_queries(self, data):
        """Raw (non-index) queries against a residual split index."""
        X, _ = data
        idx = ivf_build(jnp.asarray(X[:5000]), n_clusters=16, split_bytes=1)
        assert idx.X_lo is not None
        Q = X[5000:]
        _, i_q = ivf_knn_queries(jnp.asarray(Q), idx, k=5, nprobe=16)
        _, i0 = knn_graph(jnp.asarray(Q), jnp.asarray(X[:5000]), k=5,
                          exclude_diag=False)
        # all 16 cells probed → the residual-scored raw-query path is exact
        assert recall(np.asarray(i0), np.asarray(i_q), 5) > 0.999


class TestSegmentedStreaming:
    @pytest.mark.slow
    def test_beyond_memory_segments_match_ivf(self, data):
        X, i0 = data
        batches = [X[a : a + 1000] for a in range(0, X.shape[0], 1000)]
        seg_bytes = 2 * 1000 * X.shape[1] * 4 + 1  # force 3 segments
        d_s, i_s = knn_graph_streaming(
            batches, k=10, nprobe=8, n_clusters=8, seg_bytes=seg_bytes,
        )
        r = recall(i0, i_s)
        # reference bar: ≥ the in-memory IVF tier at the same probe depth
        idx_m = ivf_build(jnp.asarray(X), n_clusters=24)
        _, i_m = ivf_knn(None, k=10, nprobe=8, index=idx_m)
        assert r > recall(i0, np.asarray(i_m)) - 0.02
        assert r > 0.95
        # distances sorted ascending, self excluded
        assert (np.diff(d_s, axis=1) >= -1e-6).all()
        assert not (i_s == np.arange(X.shape[0])[:, None]).any()

    @pytest.mark.slow
    def test_single_segment_path(self, data):
        X, i0 = data
        batches = [X[a : a + 2000] for a in range(0, X.shape[0], 2000)]
        d_s, i_s = knn_graph_streaming(batches, k=10, nprobe=10, n_clusters=24)
        assert recall(i0, i_s) > 0.95
