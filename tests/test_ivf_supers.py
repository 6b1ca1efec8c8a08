"""Hierarchical (super-centroid) IVF nomination.

The two-level coarse quantizer replaces the per-block (block, nlist)
nomination matmul with a (block, S) super vote + member-cell scoring —
the round-3 attack on the width-independent per-block cost at 10M
(docs/ROUND3_PLAN.md). These tests pin the correctness contract: recall
with supers must match flat nomination on clustered data.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from torchdr_tpu.ops.distance import knn_graph
from torchdr_tpu.ops.ivf import ivf_build, ivf_knn


@pytest.fixture(scope="module")
def clustered():
    rng = np.random.default_rng(0)
    centers = rng.normal(scale=8.0, size=(32, 16))
    X = np.concatenate(
        [c + rng.normal(size=(250, 16)) for c in centers]
    ).astype(np.float32)  # n=8000
    Xj = jnp.asarray(X)
    d0, i0 = knn_graph(Xj, k=10)
    return Xj, np.asarray(i0)


def recall(i_true, i_test, k=10):
    hits = 0
    for q in range(i_true.shape[0]):
        hits += len(set(i_true[q]) & set(i_test[q]))
    return hits / (i_true.shape[0] * k)


class TestSupers:
    def test_build_carries_supers(self, clustered):
        X, _ = clustered
        idx = ivf_build(X, n_clusters=64, n_superlist=16)
        assert idx.super_centroids.shape == (16, X.shape[1])
        S, W = idx.super_members.shape
        assert S == 16
        mem = np.asarray(idx.super_members)
        valid = mem[mem >= 0]
        # every cell appears exactly once across all member lists
        assert sorted(valid.tolist()) == list(range(64))

    def test_small_nlist_disables_supers_by_default(self, clustered):
        X, _ = clustered
        idx = ivf_build(X, n_clusters=64)
        assert idx.super_centroids is None

    @pytest.mark.slow
    def test_super_nomination_recall_matches_flat(self, clustered):
        X, i0 = clustered
        idx = ivf_build(X, n_clusters=64, n_superlist=16)
        _, i_sup = ivf_knn(None, k=10, nprobe=8, index=idx, nprobe_supers=6)
        _, i_flat = ivf_knn(None, k=10, nprobe=8, index=idx, nprobe_supers=0)
        r_sup, r_flat = recall(i0, np.asarray(i_sup)), recall(i0, np.asarray(i_flat))
        assert r_flat > 0.98
        # supers may only lose the cells whose super misses the block's
        # top-6 — a thin tail on clustered data
        assert r_sup > r_flat - 0.02
        assert r_sup > 0.97

    def test_supers_residual_index(self, clustered):
        """Supers compose with residual split-precision storage."""
        X, i0 = clustered
        idx = ivf_build(X, n_clusters=64, n_superlist=16, split_bytes=1)
        assert idx.X_lo is not None  # forced residual storage
        _, i_sup = ivf_knn(None, k=10, nprobe=8, index=idx, nprobe_supers=6)
        assert recall(i0, np.asarray(i_sup)) > 0.97

    def test_degenerate_union_still_valid(self, clustered):
        """ncells close to the member-union width: output stays valid."""
        X, i0 = clustered
        idx = ivf_build(X, n_clusters=64, n_superlist=16)
        _, i_sup = ivf_knn(None, k=10, nprobe=16, index=idx, nprobe_supers=2)
        i_np = np.asarray(i_sup)
        assert (i_np >= 0).all()
        # no duplicate neighbors within a row
        for q in range(0, 8000, 97):
            assert len(set(i_np[q])) == 10


class TestAdjacencyNomination:
    """Cell-adjacency nomination: candidates = the home cells' precomputed
    nearest-cell lists — geometrically exact, ~P wide (the default large-
    nlist nomination after supers measured a 9% recall loss at 10M)."""

    @pytest.fixture(scope="class")
    def adj_index(self, clustered):
        X, _ = clustered
        return ivf_build(X, n_clusters=320)  # ≥ 256 → adjacency built

    def test_adjacency_table_built(self, adj_index):
        adj = adj_index.cell_adj
        assert adj is not None and adj.shape == (320, 64)
        # self cell first in every row (distance 0)
        assert (np.asarray(adj)[:, 0] == np.arange(320)).all()
        assert adj_index.cells_sorted is not None  # home-cell lookup table

    def test_adjacency_matches_flat_self_queries(self, clustered, adj_index):
        X, i0 = clustered
        _, i_a = ivf_knn(None, k=10, nprobe=8, index=adj_index,
                         nomination="adjacency")
        _, i_f = ivf_knn(None, k=10, nprobe=8, index=adj_index,
                         nomination="flat")
        r_a = recall(i0, np.asarray(i_a))
        r_f = recall(i0, np.asarray(i_f))
        assert abs(r_a - r_f) < 0.005

    def test_adjacency_residual_index(self, clustered):
        X, i0 = clustered
        idx = ivf_build(X, n_clusters=320, split_bytes=1)
        _, i_a = ivf_knn(None, k=10, nprobe=8, index=idx,
                         nomination="adjacency")
        _, i_f = ivf_knn(None, k=10, nprobe=8, index=idx, nomination="flat")
        assert abs(recall(i0, np.asarray(i_a)) - recall(i0, np.asarray(i_f))) < 0.005
