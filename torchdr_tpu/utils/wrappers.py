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


def deduplicate(X: jnp.ndarray):
    """Host-side duplicate-row removal (reference: torchdr/base.py:125-151).

    Returns (X_unique, inverse_indices or None). Runs on host numpy before
    any device work; shape-dynamic operations never enter jit.
    """
    Xn = np.asarray(X)
    X_unique, inverse = np.unique(Xn, axis=0, return_inverse=True)
    if X_unique.shape[0] == Xn.shape[0]:
        return X, None
    return jnp.asarray(X_unique), inverse.reshape(-1)
