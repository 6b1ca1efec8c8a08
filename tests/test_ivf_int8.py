"""int8 compressed IVF tier (storage="int8") + cross-query probe coverage.

The TPU-native role of the reference's IVFPQ memory tier
(reference: torchdr/distance/faiss.py:113-221, recall data
benchmarks/faiss/BENCHMARK_RESULTS.md:11-13): per-cell-per-dim affine int8
of the cell residuals at ¼ the resident bytes of f32, scanned as a dense
(dequantized) MXU matmul instead of PQ's gather-bound ADC lookups.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from torchdr_tpu.ops.ivf import (
    IVFIndex,
    ivf_build,
    ivf_build_from_batches,
    ivf_knn,
    ivf_knn_queries,
)


@pytest.fixture(scope="module")
def clustered():
    rng = np.random.default_rng(3)
    centers = rng.normal(scale=6.0, size=(20, 24)).astype(np.float32)
    lab = rng.integers(0, 20, 6000)
    X = (centers[lab] + rng.normal(size=(6000, 24))).astype(np.float32)
    return X


@pytest.fixture(scope="module")
def truth(clustered):
    X = clustered
    D = (
        (X * X).sum(1)[:, None]
        + (X * X).sum(1)[None, :]
        - 2.0 * X @ X.T
    )
    np.fill_diagonal(D, np.inf)
    return np.argsort(D, axis=1)[:, :10]


def _recall(ids, truth_ids, step=7):
    rows = range(0, ids.shape[0], step)
    return float(
        np.mean([len(set(ids[q]) & set(truth_ids[q])) / truth_ids.shape[1]
                 for q in rows])
    )


class TestInt8Tier:
    def test_build_representation(self, clustered):
        idx8 = ivf_build(clustered, n_clusters=32, storage="int8", chunk=128)
        idx32 = ivf_build(clustered, n_clusters=32, storage="f32", chunk=128)
        assert idx8.X_sorted.dtype == jnp.int8
        assert idx8.scales is not None
        assert idx8.scales.shape == (32, clustered.shape[1])
        assert idx8.xnorm2 is not None and idx8.X_lo is None
        # ¼ the resident scan bytes of f32
        assert idx8.X_sorted.nbytes * 3.5 < idx32.X_sorted.nbytes
        # identical layout (same quantizer seed → same cells/permutation)
        np.testing.assert_array_equal(
            np.asarray(idx8.ids_sorted), np.asarray(idx32.ids_sorted)
        )
        # xnorm2 = norms of the RECONSTRUCTED rows (consistent quantized
        # geometry — exact norms against quantized cross terms were a
        # recall bug at 10M density; see _int8_quant_seg_jit)
        q8 = np.asarray(idx8.X_sorted, np.float32)
        cells = np.asarray(idx8.cells_sorted)
        recon = (q8 * np.asarray(idx8.scales)[cells]
                 + np.asarray(idx8.centroids)[cells])
        np.testing.assert_allclose(
            np.asarray(idx8.xnorm2),
            np.einsum("ij,ij->i", recon, recon),
            rtol=1e-4, atol=1e-2,
        )

    def test_reconstruction_error_bounded(self, clustered):
        idx = ivf_build(clustered, n_clusters=32, storage="int8", chunk=128)
        ids = np.asarray(idx.ids_sorted)
        valid = ids >= 0
        q8 = np.asarray(idx.X_sorted, np.float32)[valid]
        cells = np.asarray(idx.cells_sorted)[valid]
        s = np.asarray(idx.scales)
        recon = q8 * s[cells] + np.asarray(idx.centroids)[cells]
        err = np.abs(recon - clustered[ids[valid]])
        # per-dim error ≤ half a quantization step of its cell
        assert np.all(err <= 0.5001 * s[cells] + 1e-6)

    def test_self_knn_recall(self, clustered, truth):
        idx = ivf_build(clustered, n_clusters=32, storage="int8", chunk=128)
        _, ids = ivf_knn(None, k=10, nprobe=8, index=idx)
        assert _recall(np.asarray(ids), truth) > 0.95

    def test_asymmetric_scoring(self, clustered, truth):
        """scoring="asymmetric" scores exact f32 queries against the
        quantized db (the Faiss ADC convention) — never worse than
        symmetric reconstruction, and it must also exercise the segmented
        path (seg_rows < n) since that's the shape 10M takes."""
        idx = ivf_build(clustered, n_clusters=32, storage="int8", chunk=128)
        _, ids_sym = ivf_knn(None, k=10, nprobe=8, index=idx)
        _, ids_asym = ivf_knn(
            clustered, k=10, nprobe=8, index=idx, scoring="asymmetric"
        )
        r_sym = _recall(np.asarray(ids_sym), truth, step=1)
        r_asym = _recall(np.asarray(ids_asym), truth, step=1)
        assert r_asym >= r_sym - 1e-9
        assert r_asym > 0.95
        # segmented query path (multiple _ivf_search dispatches)
        _, ids_seg = ivf_knn(
            clustered, k=10, nprobe=8, index=idx, scoring="asymmetric",
            seg_rows=2048,
        )
        assert np.array_equal(np.asarray(ids_seg), np.asarray(ids_asym))

    def test_asymmetric_requires_x(self, clustered):
        idx = ivf_build(clustered, n_clusters=32, storage="int8", chunk=128)
        with pytest.raises(ValueError, match="asymmetric"):
            ivf_knn(None, k=10, index=idx, scoring="asymmetric")
        with pytest.raises(ValueError, match="scoring"):
            ivf_knn(clustered, k=10, index=idx, scoring="adc")

    def test_cross_query_small_set_coverage(self, clustered, truth):
        """Small/spread query sets pack many home cells per block; the
        auto-boosted probe count must keep per-query coverage (was 25%
        recall at 500 queries / 64 cells before the boost)."""
        for storage in ("f32", "int8"):
            idx = ivf_build(clustered, n_clusters=32, storage=storage,
                            chunk=128)
            _, ids = ivf_knn_queries(
                clustered[:300], idx, k=10, nprobe=6,
                query_ids=np.arange(300),
            )
            assert _recall(np.asarray(ids), truth[:300], step=1) > 0.93, storage

    def test_from_batches_int8(self, clustered, truth):
        batches = [clustered[a:a + 1500] for a in range(0, 6000, 1500)]
        idx = ivf_build_from_batches(batches, n_clusters=32, chunk=128,
                                     storage="int8")
        assert idx.X_sorted.dtype == jnp.int8
        _, ids = ivf_knn(None, k=10, nprobe=8, index=idx)
        assert _recall(np.asarray(ids), truth) > 0.95

    def test_storage_validation(self, clustered):
        with pytest.raises(ValueError, match="storage"):
            ivf_build(clustered, n_clusters=32, storage="pq")
        with pytest.raises(ValueError, match="align"):
            ivf_build(clustered, n_clusters=32, storage="int8", align=False)

    def test_knn_config_storage(self, clustered):
        from torchdr_tpu.ops.knn_config import KnnConfig

        with pytest.raises(ValueError, match="storage"):
            KnnConfig(mode="ivf", storage="pq")
        cfg = KnnConfig(mode="ivf", storage="int8", nprobe=8)
        assert cfg.storage == "int8"

    def test_estimator_int8_graph(self, clustered):
        """UMAP fits end-to-end on an int8-tier graph with sane quality."""
        import torchdr_tpu as tdr

        lab = np.asarray(
            np.argmin(
                ((clustered[:, None, :16] - clustered[None, :20, :16]) ** 2
                 ).sum(-1), axis=1
            )
        )
        m = tdr.UMAP(
            n_neighbors=10, max_iter=60, random_state=0,
            knn_mode=tdr.KnnConfig(mode="ivf", nprobe=8, n_clusters=32,
                                   storage="int8"),
        )
        Z = np.asarray(m.fit_transform(clustered[:2000]))
        assert Z.shape == (2000, 2) and np.all(np.isfinite(Z))

    def test_sharded_int8(self, clustered, truth):
        """scales ride the shard_map boundary (mesh-sharded queries)."""
        from torchdr_tpu.parallel.ivf import ivf_knn_sharded
        from torchdr_tpu.parallel.mesh import make_mesh

        if len(jax.devices()) < 2:
            pytest.skip("needs multi-device mesh")
        mesh = make_mesh()
        idx = ivf_build(clustered, n_clusters=32, storage="int8", chunk=128)
        _, ids = ivf_knn_sharded(None, mesh, k=10, nprobe=8, index=idx)
        assert _recall(np.asarray(ids), truth) > 0.95
