"""Input/output format handling.

Replaces the reference's torch-centric wrappers
(reference: torchdr/utils/wrappers.py:41-192). Accepts numpy arrays, JAX
arrays, and torch tensors (converted via numpy — torch is an optional
input format only, never a compute path), and restores the caller's format
on output.
"""

from __future__ import annotations

from typing import Any, Tuple

import jax.numpy as jnp
import numpy as np


def to_jax(X: Any, dtype=jnp.float32) -> Tuple[jnp.ndarray, str]:
    """Convert input to a jnp array; returns (array, original_format).

    original_format in {"jax", "numpy", "torch", "other"}.
    """
    if isinstance(X, jnp.ndarray):
        return X.astype(dtype), "jax"
    if isinstance(X, np.ndarray):
        return jnp.asarray(X, dtype=dtype), "numpy"
    mod = type(X).__module__
    if mod.startswith("torch"):
        return jnp.asarray(X.detach().cpu().numpy(), dtype=dtype), "torch"
    if mod.startswith("pandas"):
        return jnp.asarray(np.asarray(X), dtype=dtype), "numpy"
    return jnp.asarray(np.asarray(X), dtype=dtype), "other"


def to_host(X: Any, dtype=np.float32) -> Tuple[np.ndarray, str]:
    """Normalize input to a host numpy array; returns (array, format).

    The host-side twin of :func:`to_jax`, for pre-fit work (validation,
    deduplication) that must NOT round-trip the dataset through the
    device: numpy inputs are zero-copy views, jax inputs cost ONE pull,
    torch tensors one detach. Over a thin host↔device link the old
    push-then-pull pattern cost two full-dataset transfers per fit
    (~15 s at 60k×784 on the axon tunnel).
    """
    if isinstance(X, np.ndarray):
        return np.asarray(X, dtype=dtype), "numpy"
    if isinstance(X, jnp.ndarray):
        return np.asarray(X, dtype=dtype), "jax"
    mod = type(X).__module__
    if mod.startswith("torch"):
        return np.asarray(X.detach().cpu().numpy(), dtype=dtype), "torch"
    if mod.startswith("pandas"):
        return np.asarray(X, dtype=dtype), "numpy"
    return np.asarray(X, dtype=dtype), "other"


def restore_format(Z: jnp.ndarray, fmt: str):
    """Convert output back to the input container type."""
    if fmt == "jax":
        return Z
    if fmt == "torch":
        import torch

        return torch.from_numpy(np.array(Z))  # np.array: writable copy
    return np.asarray(Z)


def validate_2d(X: jnp.ndarray, name: str = "X") -> jnp.ndarray:
    if X.ndim != 2:
        raise ValueError(f"[TorchDR-TPU] ERROR : {name} must be 2D, got shape {X.shape}.")
    if X.shape[0] == 0:
        raise ValueError(f"[TorchDR-TPU] ERROR : {name} is empty.")
    arr = np.asarray(X)
    if not np.all(np.isfinite(arr)):
        raise ValueError(f"[TorchDR-TPU] ERROR : {name} contains NaN or Inf values.")
    return X


def _row_hashes(Xn: np.ndarray) -> np.ndarray:
    """Vectorized FNV-1a-style hash of each row's exact bytes."""
    view = np.ascontiguousarray(Xn).view(np.uint32)
    acc = np.full((Xn.shape[0],), np.uint64(0xCBF29CE484222325))
    prime = np.uint64(1099511628211)
    for j in range(view.shape[1]):
        acc = (acc ^ view[:, j].astype(np.uint64)) * prime
    return acc


def deduplicate(X):
    """Host-side duplicate-row removal (reference: torchdr/base.py:125-151).

    Returns (X_unique, inverse_indices or None) with X_unique in the
    INPUT's container type (numpy stays numpy — callers push to device
    once, afterwards). Runs on host numpy; shape-dynamic operations never
    enter jit. A vectorized row-hash prefilter decides duplicate-freeness
    first (hash equality is necessary for row equality), so the common
    no-duplicates case skips numpy's lexicographic row sort
    (~5 s at 60k×784; the hash pass is ~0.4 s).
    """
    Xn = np.asarray(X)
    if (Xn.dtype.itemsize * Xn.shape[1]) % 4 == 0 and Xn.shape[1] > 0:
        h = _row_hashes(Xn)
        if np.unique(h).shape[0] == Xn.shape[0]:
            return X, None  # all row hashes distinct → no duplicate rows
    X_unique, inverse = np.unique(Xn, axis=0, return_inverse=True)
    if X_unique.shape[0] == Xn.shape[0]:
        return X, None
    if isinstance(X, np.ndarray):
        return X_unique, inverse.reshape(-1)
    return jnp.asarray(X_unique), inverse.reshape(-1)
