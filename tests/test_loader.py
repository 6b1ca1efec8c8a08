"""BatchSource / loader validation: the multi-pass streaming feed.

Covers the reference's DataLoader guards — deterministic-sampler
validation and per-loader metadata cache (reference:
torchdr/distance/faiss.py:23-110) — plus the replayed (never-buffered)
build modes those guards exist for.
"""

import numpy as np
import pytest

from torchdr_tpu.ops.loader import (
    BatchSource,
    get_loader_metadata,
    validate_deterministic_loader,
)
from torchdr_tpu.ops.ivf import ivf_build, ivf_build_from_batches, ivf_knn
from torchdr_tpu.ops.streaming import knn_graph_streaming


@pytest.fixture(scope="module")
def data():
    rng = np.random.default_rng(3)
    centers = rng.normal(scale=8.0, size=(16, 10))
    X = np.concatenate(
        [c + rng.normal(size=(300, 10)) for c in centers]
    ).astype(np.float32)
    rng.shuffle(X)
    return X


def _batches(X, size=1000):
    return [X[a : a + size] for a in range(0, X.shape[0], size)]


class TestBatchSource:
    def test_list_is_buffered_and_replayable(self, data):
        src = BatchSource(_batches(data))
        assert src.buffered
        a = [b.shape[0] for b in src]
        b = [b.shape[0] for b in src]
        assert a == b

    def test_one_shot_generator_is_buffered(self, data):
        gen = (b for b in _batches(data))
        src = BatchSource(gen)
        assert src.buffered
        # two passes despite the one-shot underlying generator
        assert sum(b.shape[0] for b in src) == data.shape[0]
        assert sum(b.shape[0] for b in src) == data.shape[0]

    def test_factory_is_replayed_not_buffered(self, data):
        calls = []

        def factory():
            calls.append(1)
            return iter(_batches(data))

        src = BatchSource(factory)
        assert not src.buffered
        assert sum(b.shape[0] for b in src) == data.shape[0]
        assert sum(b.shape[0] for b in src) == data.shape[0]
        assert len(calls) == 2  # each pass re-invoked the factory

    def test_single_array_is_one_batch(self, data):
        src = BatchSource(data)
        batches = list(src)
        assert len(batches) == 1 and batches[0].shape == data.shape

    def test_tuple_batches_normalized(self, data):
        src = BatchSource([(b, None) for b in _batches(data)])
        out = np.concatenate(list(src))
        assert out.dtype == np.float32
        np.testing.assert_allclose(out, data)

    def test_metadata_and_cache(self, data):
        passes = []

        def factory():
            passes.append(1)
            return iter(_batches(data, 700))

        src = BatchSource(factory)
        meta = src.metadata()
        assert meta["n_samples"] == data.shape[0]
        assert meta["n_features"] == data.shape[1]
        assert meta["batch_sizes"][0] == 700
        n_after_first = len(passes)
        meta2 = src.metadata()  # served from the per-object cache
        assert meta2 == meta
        assert len(passes) == n_after_first
        assert get_loader_metadata(factory) == meta

    def test_slice_replayed(self, data):
        src = BatchSource(lambda: iter(_batches(data, 500)))
        part = src.slice(2, 4)
        got = np.concatenate(list(part))
        np.testing.assert_allclose(got, data[1000:2000])

    def test_empty_raises(self):
        with pytest.raises(ValueError, match="empty"):
            BatchSource([])
        src = BatchSource(lambda: iter(()))
        with pytest.raises(ValueError, match="empty"):
            list(src)

    def test_bad_ndim_raises(self):
        with pytest.raises(ValueError, match="2-d"):
            BatchSource([np.zeros((4, 3, 2), np.float32)])


class TestLoaderValidation:
    def test_shuffled_dataloader_rejected(self, data):
        torch = pytest.importorskip("torch")
        from torch.utils.data import DataLoader, TensorDataset

        loader = DataLoader(
            TensorDataset(torch.from_numpy(data.copy())),
            batch_size=1000,
            shuffle=True,
        )
        with pytest.raises(ValueError, match="shuffle=False"):
            BatchSource(loader)

    def test_sequential_dataloader_accepted(self, data):
        torch = pytest.importorskip("torch")
        from torch.utils.data import DataLoader, TensorDataset

        loader = DataLoader(
            TensorDataset(torch.from_numpy(data.copy())),
            batch_size=1000,
            shuffle=False,
        )
        validate_deterministic_loader(loader)  # no raise
        src = BatchSource(loader)
        assert not src.buffered  # replayed, never held in memory
        out = np.concatenate(list(src))
        np.testing.assert_allclose(out, data)

    def test_samplerless_source_warns(self):
        class Odd:
            dataset = None

        with pytest.warns(UserWarning, match="deterministically"):
            validate_deterministic_loader(Odd())


class TestReplayedBuilds:
    @pytest.mark.slow
    def test_ivf_build_from_factory_matches_list(self, data):
        idx_f = ivf_build_from_batches(
            lambda: iter(_batches(data)), n_clusters=16
        )
        idx_l = ivf_build_from_batches(_batches(data), n_clusters=16)
        assert idx_f.n == idx_l.n == data.shape[0]
        _, i_f = ivf_knn(None, k=10, nprobe=8, index=idx_f)
        _, i_l = ivf_knn(None, k=10, nprobe=8, index=idx_l)
        agree = (np.asarray(i_f) == np.asarray(i_l)).mean()
        assert agree > 0.99  # same feed, same key → same index

    def test_ivf_build_from_dataloader(self, data):
        torch = pytest.importorskip("torch")
        from torch.utils.data import DataLoader, TensorDataset

        loader = DataLoader(
            TensorDataset(torch.from_numpy(data.copy())),
            batch_size=1200,
            shuffle=False,
        )
        idx = ivf_build_from_batches(loader, n_clusters=16)
        assert idx.n == data.shape[0]
        ids = np.asarray(idx.ids_sorted)
        assert sorted(ids[ids >= 0].tolist()) == list(range(data.shape[0]))

    def test_inconsistent_replay_rejected(self, data):
        state = {"calls": 0}

        def flaky():
            state["calls"] += 1
            # first pass sees everything, later passes lose a batch
            keep = None if state["calls"] == 1 else -1
            return iter(_batches(data)[:keep])

        with pytest.raises(ValueError, match="replay|every pass|expected"):
            ivf_build_from_batches(flaky, n_clusters=16)

    @pytest.mark.slow
    def test_knn_graph_streaming_from_factory(self, data):
        from torchdr_tpu.ops.distance import knn_graph
        import jax.numpy as jnp

        i0 = np.asarray(knn_graph(jnp.asarray(data), k=8)[1])
        seg_bytes = 2 * 1000 * data.shape[1] * 4 + 1  # force several segments
        d_s, i_s = knn_graph_streaming(
            lambda: iter(_batches(data)),
            k=8,
            nprobe=8,
            n_clusters=8,
            seg_bytes=seg_bytes,
        )
        hits = sum(
            len(set(i0[q]) & set(i_s[q])) for q in range(data.shape[0])
        )
        assert hits / i0.size > 0.95
        assert not (i_s == np.arange(data.shape[0])[:, None]).any()
