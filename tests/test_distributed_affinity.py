"""Mesh-sharded affinity/kNN BUILD phase inside estimator fits.

Verifies the round-3 wiring: `UMAP(distributed=True)` (and friends) shard
phase A — the kNN graph build + calibration + symmetrization — over the
mesh, not just the training loop. The reference analog is the per-rank
chunked build + all_to_all symmetrization (torchdr/affinity/base.py:
310-391, torchdr/utils/sparse.py:209-343).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from torchdr_tpu.affinity.entropic import EntropicAffinity
from torchdr_tpu.affinity.knn_normalized import UMAPAffinity
from torchdr_tpu.parallel.mesh import make_mesh

needs_8 = pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")


@pytest.fixture(scope="module")
def mesh():
    return make_mesh(8)


@pytest.fixture(scope="module")
def X_clustered():
    rng = np.random.default_rng(3)
    centers = rng.normal(scale=6.0, size=(4, 16))
    return np.concatenate(
        [c + rng.normal(size=(64, 16)) for c in centers], axis=0
    ).astype(np.float32)  # n=256, divisible by 8


def densify(vals, idx):
    n = vals.shape[0]
    out = np.zeros((n, n), np.float32)
    v = np.asarray(vals)
    i = np.asarray(idx)
    rows = np.repeat(np.arange(n), v.shape[1])
    cols = i.reshape(-1)
    mask = cols >= 0
    out[rows[mask], cols[mask]] = v.reshape(-1)[mask]
    return out


@needs_8
class TestShardedAffinityBuild:
    def test_umap_affinity_sharded_matches_single(self, mesh, X_clustered):
        P0, i0 = UMAPAffinity(n_neighbors=12)(X_clustered)
        P1, i1 = UMAPAffinity(n_neighbors=12, mesh=mesh)(X_clustered)
        D0, D1 = densify(P0, i0), densify(P1, i1)
        assert np.abs(D0 - D1).max() < 1e-5
        # fuzzy-union symmetry preserved through the all_to_all exchange
        assert np.abs(D1 - D1.T).max() < 1e-5

    def test_umap_affinity_output_is_sharded(self, mesh, X_clustered):
        P1, i1 = UMAPAffinity(n_neighbors=12, mesh=mesh)(X_clustered)
        # phase-A compute ran across the mesh: outputs live on >1 device
        assert len(P1.sharding.device_set) > 1

    def test_entropic_affinity_sharded_matches_single(self, mesh, X_clustered):
        P0, i0 = EntropicAffinity(perplexity=16)(X_clustered)
        P1, i1 = EntropicAffinity(perplexity=16, mesh=mesh)(X_clustered)
        assert np.abs(densify(P0, i0) - densify(P1, i1)).max() < 1e-5

    def test_estimator_injects_mesh(self, mesh, X_clustered):
        from torchdr_tpu.models.neighbor.umap import UMAP

        model = UMAP(
            n_neighbors=12, max_iter=3, random_state=0, init="normal",
            distributed=True, mesh=mesh,
        )
        emb = model.fit_transform(X_clustered)
        assert np.isfinite(np.asarray(emb)).all()
        # the injected fit mesh reached the affinity object
        assert model.affinity_in._active_mesh() is mesh

    def test_tsne_fit_sharded_build(self, mesh, X_clustered):
        from torchdr_tpu.models.neighbor.tsne import TSNE

        model = TSNE(
            perplexity=16, max_iter=3, random_state=0, init="normal",
            distributed=True, mesh=mesh,
        )
        emb = model.fit_transform(X_clustered)
        assert np.isfinite(np.asarray(emb)).all()


@needs_8
class TestShardedIVF:
    def test_ivf_sharded_matches_single(self, mesh):
        from torchdr_tpu.ops.ivf import ivf_build, ivf_knn
        from torchdr_tpu.parallel.ivf import ivf_knn_sharded

        rng = np.random.default_rng(0)
        centers = rng.normal(scale=8.0, size=(16, 16))
        X = np.concatenate(
            [c + rng.normal(size=(128, 16)) for c in centers], axis=0
        ).astype(np.float32)  # n=2048
        index = ivf_build(jnp.asarray(X), n_clusters=16)
        d0, i0 = ivf_knn(None, k=8, nprobe=4, index=index)
        d1, i1 = ivf_knn_sharded(None, mesh, k=8, nprobe=4, index=index)
        # identical block partitioning → identical probe votes → identical
        # results (ties aside)
        agree = float(np.mean(np.asarray(i0) == np.asarray(i1)))
        assert agree > 0.999
        assert np.abs(np.asarray(d0) - np.asarray(d1)).max() < 1e-4

    @pytest.mark.slow
    def test_ivf_sharded_via_affinity(self, mesh):
        from torchdr_tpu.ops.knn_config import KnnConfig

        rng = np.random.default_rng(1)
        X = rng.normal(size=(512, 8)).astype(np.float32)
        cfg = KnnConfig(mode="ivf", nprobe=4, n_clusters=8)
        P0, i0 = UMAPAffinity(n_neighbors=10, knn_mode=cfg)(X)
        P1, i1 = UMAPAffinity(n_neighbors=10, knn_mode=cfg, mesh=mesh)(X)
        assert (
            np.abs(densify(P0, i0) - densify(P1, i1)).max() < 1e-4
        )


class TestKnnConfigHonored:
    @pytest.mark.slow
    def test_ivf_knobs_reach_dispatch(self, monkeypatch):
        """budget/merge/ivf_block from KnnConfig are passed to ivf_knn."""
        from torchdr_tpu.ops.knn_config import KnnConfig
        import torchdr_tpu.ops.ivf as ivf_mod

        seen = {}
        real = ivf_mod.ivf_knn

        def spy(X, **kw):
            seen.update(kw)
            return real(X, **kw)

        monkeypatch.setattr(ivf_mod, "ivf_knn", spy)
        rng = np.random.default_rng(0)
        X = rng.normal(size=(256, 8)).astype(np.float32)
        cfg = KnnConfig(
            mode="ivf", nprobe=3, n_clusters=4, budget=6, merge="exact",
            ivf_block=128, rerank=False, m=12,
        )
        aff = UMAPAffinity(n_neighbors=8, knn_mode=cfg)
        aff(X)
        assert seen["nprobe"] == 3
        assert seen["budget"] == 6
        assert seen["merge"] == "exact"
        assert seen["block"] == 128
        assert seen["rerank"] is False
        assert seen["m"] == 12

    def test_bad_merge_rejected(self):
        from torchdr_tpu.ops.knn_config import KnnConfig

        with pytest.raises(ValueError):
            KnnConfig(mode="ivf", merge="bogus")
