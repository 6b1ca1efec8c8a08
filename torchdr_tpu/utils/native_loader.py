"""ctypes bindings for the native (C++) batch loader.

The native library (native/batch_loader.cpp) mmaps a float32 .npy matrix
and serves row batches through a background prefetch thread — the IO
runtime role played by torch's C++ DataLoader in the reference's streaming
paths (reference: torchdr/distance/faiss.py:477-867). Built on demand with
``make -C native`` (g++ only); if the toolchain or library is unavailable
the pure-numpy fallback reader is used transparently.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from pathlib import Path
from typing import Iterator, Optional

import numpy as np

_NATIVE_DIR = Path(__file__).resolve().parents[2] / "native"
_LIB_PATH = _NATIVE_DIR / "libtdr_native.so"
_lib = None


def _load_library() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is not None:
        return _lib
    if not _LIB_PATH.exists():
        try:
            subprocess.run(
                ["make", "-C", str(_NATIVE_DIR), "lib"],
                check=True,
                capture_output=True,
                timeout=120,
            )
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(str(_LIB_PATH))
    except OSError:
        return None
    lib.tdr_loader_open.restype = ctypes.c_void_p
    lib.tdr_loader_open.argtypes = [ctypes.c_char_p, ctypes.c_int64]
    for fn in ("tdr_loader_rows", "tdr_loader_cols", "tdr_loader_n_batches",
               "tdr_loader_batch_rows"):
        getattr(lib, fn).restype = ctypes.c_int64
        getattr(lib, fn).argtypes = [ctypes.c_void_p]
    lib.tdr_loader_get.restype = ctypes.c_int64
    lib.tdr_loader_get.argtypes = [
        ctypes.c_void_p, ctypes.c_int64, ctypes.POINTER(ctypes.c_float),
    ]
    lib.tdr_loader_close.restype = None
    lib.tdr_loader_close.argtypes = [ctypes.c_void_p]
    _lib = lib
    return lib


def native_available() -> bool:
    return _load_library() is not None


class NpyBatchLoader:
    """Iterate float32 row batches from a .npy file.

    Uses the native prefetching loader when available (single-consumer
    sequential access overlaps disk IO with device compute); falls back to
    numpy memory-mapped reads otherwise. Usable anywhere the framework
    accepts a batch iterable (IncrementalPCA, knn_graph_from_batches).
    """

    def __init__(self, path: str, batch_rows: int = 4096, force_numpy: bool = False):
        self.path = str(path)
        self.batch_rows = int(batch_rows)
        self._handle = None
        self._lib = None if force_numpy else _load_library()
        if self._lib is not None:
            self._handle = self._lib.tdr_loader_open(
                self.path.encode(), self.batch_rows
            )
            if not self._handle:
                self._lib = None
        if self._lib is not None:
            self.n_rows = self._lib.tdr_loader_rows(self._handle)
            self.n_cols = self._lib.tdr_loader_cols(self._handle)
            self.n_batches = self._lib.tdr_loader_n_batches(self._handle)
        else:
            self._mmap = np.load(self.path, mmap_mode="r")
            if self._mmap.ndim != 2 or self._mmap.dtype != np.float32:
                raise ValueError(
                    "[TorchDR-TPU] NpyBatchLoader requires a 2D float32 .npy file."
                )
            self.n_rows, self.n_cols = self._mmap.shape
            self.n_batches = -(-self.n_rows // self.batch_rows)

    @property
    def backend(self) -> str:
        return "native" if self._lib is not None else "numpy"

    def __len__(self):
        return self.n_batches

    def get_batch(self, b: int) -> np.ndarray:
        if not 0 <= b < self.n_batches:
            raise IndexError(b)
        rows = min(self.batch_rows, self.n_rows - b * self.batch_rows)
        if self._lib is not None:
            out = np.empty((self.batch_rows, self.n_cols), np.float32)
            got = self._lib.tdr_loader_get(
                self._handle, b, out.ctypes.data_as(ctypes.POINTER(ctypes.c_float))
            )
            if got < 0:
                raise RuntimeError(f"native loader failed on batch {b}")
            return out[:got]
        start = b * self.batch_rows
        return np.asarray(self._mmap[start : start + rows], np.float32)

    def __iter__(self) -> Iterator[np.ndarray]:
        for b in range(self.n_batches):
            yield self.get_batch(b)

    def close(self):
        if self._lib is not None and self._handle:
            self._lib.tdr_loader_close(self._handle)
            self._handle = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
