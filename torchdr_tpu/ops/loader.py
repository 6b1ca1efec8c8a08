"""Batch-feed abstraction for the streaming (beyond-HBM / beyond-RAM) paths.

The reference consumes ``torch.utils.data.DataLoader`` objects directly and
guards the multi-pass index build with a deterministic-sampler check plus a
per-loader metadata cache (reference: torchdr/distance/faiss.py:23-110).
This module is the framework-neutral analog: :class:`BatchSource` gives the
IVF build / segmented search a uniform *multi-pass* view over

- a list/tuple of arrays (already in memory — passes are free),
- a one-shot generator (buffered on the first pass — it cannot be replayed),
- a torch ``DataLoader`` or any other re-iterable (replayed per pass, so the
  dataset is NEVER held in host memory by this library),
- a zero-argument callable returning a fresh iterator per call (the fully
  streaming form for datasets beyond host RAM).

Batches may be numpy/jax arrays or torch tensors, optionally wrapped as
``(data, target)`` tuples; every pass yields C-contiguous float32 numpy
arrays. Multi-pass correctness requires a stable batch order, so
DataLoader-like sources are validated against shuffling samplers
(:func:`validate_deterministic_loader`, the analog of reference
faiss.py:57-110) and metadata passes are cached per loader object
(:func:`get_loader_metadata`, the analog of reference faiss.py:23-54).
"""

from __future__ import annotations

import warnings

import numpy as np

__all__ = [
    "BatchSource",
    "get_loader_metadata",
    "validate_deterministic_loader",
]

# Cache of {id(loader): metadata dict} so repeated builds/searches over the
# same loader object skip the counting pass (reference faiss.py:23-54).
# The keyed object is pinned so a garbage-collected loader's id cannot be
# reused and serve another loader's metadata.
_LOADER_METADATA_CACHE: dict = {}
_LOADER_CACHE_PINS: dict = {}


def get_loader_metadata(loader):
    """Cached metadata for a loader previously seen by :class:`BatchSource`.

    Returns a dict with keys ``n_samples``, ``n_features``, ``batch_sizes``
    or None if the loader has not completed a metadata pass yet.
    """
    return _LOADER_METADATA_CACHE.get(id(loader))


def _is_deterministic_sampler(sampler) -> bool:
    try:
        from torch.utils.data import (
            BatchSampler,
            RandomSampler,
            SequentialSampler,
        )
    except Exception:  # torch absent: nothing to check
        return True
    if isinstance(sampler, RandomSampler):
        return False
    if isinstance(sampler, SequentialSampler):
        return True
    if isinstance(sampler, BatchSampler):
        return _is_deterministic_sampler(sampler.sampler)
    if hasattr(sampler, "shuffle"):
        return not sampler.shuffle
    return True


def validate_deterministic_loader(loader) -> None:
    """Reject loaders whose iteration order changes between passes.

    The streaming build iterates the loader several times (metadata /
    quantizer training / assignment / write) and identifies rows by their
    position in the feed, so a shuffling sampler silently corrupts the kNN
    ids. Analog of the reference's ``_validate_dataloader``
    (torchdr/distance/faiss.py:86-110).
    """
    if not hasattr(loader, "sampler"):
        warnings.warn(
            "[TorchDR-TPU] Could not verify the loader iterates "
            "deterministically. Multi-pass streaming requires a stable "
            "batch order; ensure shuffle=False."
        )
        return
    if not _is_deterministic_sampler(loader.sampler):
        raise ValueError(
            "[TorchDR-TPU] ERROR : DataLoader must have shuffle=False for "
            "deterministic multi-pass iteration. Current sampler: "
            f"{type(loader.sampler).__name__}. kNN indices would be "
            "incorrect with shuffled batches."
        )


def _normalize_batch(batch) -> np.ndarray:
    if isinstance(batch, (list, tuple)):
        batch = batch[0]
    if hasattr(batch, "detach"):  # torch tensor
        batch = batch.detach().cpu().numpy()
    out = np.ascontiguousarray(np.asarray(batch), dtype=np.float32)
    if out.ndim != 2:
        raise ValueError(
            "[TorchDR-TPU] ERROR : batches must be 2-d (rows, features); "
            f"got shape {out.shape}."
        )
    return out


class BatchSource:
    """Uniform multi-pass view over a batch feed (see module docstring).

    Iterating a :class:`BatchSource` always yields C-contiguous float32
    numpy batches in the same order. Whether a pass re-reads the underlying
    source or an in-memory buffer is an internal detail exposed as
    :attr:`buffered` (one-shot generators and array lists are buffered;
    DataLoaders, re-iterables, and factories are replayed, holding at most
    one batch in memory per pass).
    """

    def __init__(self, batches):
        if isinstance(batches, BatchSource):
            self._buffer = batches._buffer
            self._factory = batches._factory
            self._source = batches._source
            return
        self._buffer = None
        self._factory = None
        self._source = None
        if getattr(batches, "ndim", None) == 2:  # a single array: one batch
            self._buffer = [_normalize_batch(batches)]
        elif callable(batches) and not hasattr(batches, "__iter__"):
            self._factory = batches
        elif hasattr(batches, "sampler") or hasattr(batches, "dataset"):
            # torch-DataLoader-like: re-iterable, but only usable multi-pass
            # if the sampler is deterministic.
            validate_deterministic_loader(batches)
            self._source = batches
        elif isinstance(batches, (list, tuple)) or hasattr(
            batches, "__getitem__"
        ):
            self._buffer = [_normalize_batch(b) for b in batches]
        else:
            it = iter(batches)
            if it is batches:  # one-shot generator: the only replay is a copy
                self._buffer = [_normalize_batch(b) for b in it]
            else:
                self._source = batches
        if self._buffer is not None and not self._buffer:
            raise ValueError("[TorchDR-TPU] ERROR : empty batch iterable.")

    @property
    def buffered(self) -> bool:
        return self._buffer is not None

    def __iter__(self):
        if self._buffer is not None:
            yield from self._buffer
            return
        src = self._factory() if self._factory is not None else self._source
        n = 0
        for batch in src:
            yield _normalize_batch(batch)
            n += 1
        if n == 0:
            raise ValueError("[TorchDR-TPU] ERROR : empty batch iterable.")

    def _cache_key(self):
        if self._source is not None:
            return id(self._source)
        if self._factory is not None:
            return id(self._factory)
        return None

    def metadata(self) -> dict:
        """``{n_samples, n_features, batch_sizes}`` for this feed.

        Free for buffered sources. For replayed sources this costs one
        counting pass, cached per loader/factory object; when the source
        exposes ``len(source.dataset)`` (torch DataLoader), ``n_samples``
        is taken from it and only the first batch is read (to learn the
        width) unless per-batch sizes are explicitly requested later.
        """
        if self._buffer is not None:
            sizes = [b.shape[0] for b in self._buffer]
            return {
                "n_samples": int(sum(sizes)),
                "n_features": int(self._buffer[0].shape[1]),
                "batch_sizes": sizes,
            }
        key = self._cache_key()
        cached = _LOADER_METADATA_CACHE.get(key)
        if cached is not None:
            return cached
        sizes: list = []
        d = None
        for b in self:
            sizes.append(b.shape[0])
            d = b.shape[1]
        meta = {
            "n_samples": int(sum(sizes)),
            "n_features": int(d),
            "batch_sizes": sizes,
        }
        if key is not None:
            _LOADER_METADATA_CACHE[key] = meta
            _LOADER_CACHE_PINS[key] = (
                self._source if self._source is not None else self._factory
            )
        return meta

    def shape_hint(self) -> tuple:
        """(n_samples, n_features) as cheaply as possible.

        Uses the buffer, the metadata cache, or ``len(source.dataset)`` +
        one batch; falls back to a full counting pass (which then populates
        the cache).
        """
        if self._buffer is not None:
            return (
                int(sum(b.shape[0] for b in self._buffer)),
                int(self._buffer[0].shape[1]),
            )
        cached = _LOADER_METADATA_CACHE.get(self._cache_key())
        if cached is not None:
            return cached["n_samples"], cached["n_features"]
        ds = getattr(self._source, "dataset", None)
        if ds is not None:
            try:
                n = len(ds)
            except TypeError:
                n = None
            if n is not None:
                for b in self:  # read one batch for the width, then stop
                    return int(n), int(b.shape[1])
        meta = self.metadata()
        return meta["n_samples"], meta["n_features"]

    def slice(self, lo: int, hi: int) -> "BatchSource":
        """View over batches ``lo..hi`` (by batch index) of this feed.

        Buffered sources slice the buffer (no copy); replayed sources get a
        factory that re-iterates the parent and skips other batches.
        """
        if self._buffer is not None:
            out = BatchSource.__new__(BatchSource)
            out._buffer = self._buffer[lo:hi]
            out._factory = None
            out._source = None
            return out
        parent = self

        def _gen():
            for i, b in enumerate(parent):
                if i >= hi:
                    break
                if i >= lo:
                    yield b

        out = BatchSource.__new__(BatchSource)
        out._buffer = None
        out._factory = _gen
        out._source = None
        return out
