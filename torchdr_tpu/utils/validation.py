"""Validation helpers and test-support checks.

Counterpart of the reference's ``check_*`` family
(reference: torchdr/utils/validation.py). The torch-vs-keops similarity
check becomes a dense-vs-blockwise/Pallas consistency check.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def check_neighbor_param(param, n: int, logger=None):
    """Clamp a neighbor-count-like parameter to [1, n-1].

    (reference: torchdr/utils/validation.py check_neighbor_param)
    """
    max_allowed = n - 1
    if param > max_allowed:
        if logger is not None:
            logger.warning(
                f"Neighbor parameter {param} exceeds n_samples-1={max_allowed}; clamping."
            )
        return max_allowed
    if param < 1:
        raise ValueError(f"[TorchDR-TPU] ERROR : neighbor parameter must be >= 1, got {param}.")
    return param


def check_NaNs(x, msg: str = "NaNs detected."):
    if bool(jnp.any(jnp.isnan(jnp.asarray(x)))):
        raise ValueError(f"[TorchDR-TPU] {msg}")


def check_nonnegativity(x, tol: float = 1e-8):
    if bool(jnp.min(jnp.asarray(x)) < -tol):
        raise ValueError("[TorchDR-TPU] ERROR : affinity matrix has negative entries.")


def check_shape(x, shape):
    if tuple(np.shape(x)) != tuple(shape):
        raise ValueError(f"[TorchDR-TPU] ERROR : expected shape {shape}, got {np.shape(x)}.")


def check_symmetry(P, tol: float = 1e-5):
    P = np.asarray(P)
    if not np.allclose(P, P.T, atol=tol):
        raise ValueError("[TorchDR-TPU] ERROR : matrix is not symmetric.")


def check_marginal(P, marg, dim: int = 1, tol: float = 1e-5, log: bool = False):
    """Check that the row (or column) marginals equal ``marg``."""
    P = np.asarray(P)
    if log:
        from scipy.special import logsumexp as _lse  # test-only helper

        got = _lse(P, axis=dim)
    else:
        got = P.sum(axis=dim)
    if not np.allclose(got, np.asarray(marg), atol=tol):
        raise ValueError(
            f"[TorchDR-TPU] ERROR : marginal mismatch (max err "
            f"{np.abs(got - np.asarray(marg)).max():.2e})."
        )


def check_entropy(log_P, target_entropy, dim: int = 1, tol: float = 1e-3):
    """Check row entropies h(p) = -sum p (log p - 1) equal the target."""
    log_P = np.asarray(log_P)
    H = -np.sum(np.exp(log_P) * (log_P - 1.0), axis=dim)
    if not np.allclose(H, np.asarray(target_entropy), atol=tol):
        raise ValueError(
            f"[TorchDR-TPU] ERROR : entropy mismatch (max err "
            f"{np.abs(H - np.asarray(target_entropy)).max():.2e})."
        )


def check_type(x, expected_type):
    if not isinstance(x, expected_type):
        raise TypeError(f"[TorchDR-TPU] ERROR : expected {expected_type}, got {type(x)}.")


def check_similarity_dense_sparse(
    dense: jnp.ndarray,
    sparse_values: jnp.ndarray,
    sparse_indices: jnp.ndarray,
    tol: float = 1e-5,
):
    """Compare the top-k entries of a dense affinity against a sparse one.

    Replaces the reference's torch-vs-keops consistency check
    (reference: torchdr/utils/validation.py:31-85) with a dense-vs-sparse
    (blockwise / Pallas) consistency check.
    """
    dense = np.asarray(dense)
    vals = np.asarray(sparse_values)
    idx = np.asarray(sparse_indices)
    rows = np.arange(dense.shape[0])[:, None]
    valid = idx >= 0
    picked = dense[rows, np.maximum(idx, 0)]
    err = np.abs(np.where(valid, picked - vals, 0.0)).max()
    if err > tol:
        raise ValueError(f"[TorchDR-TPU] ERROR : dense/sparse mismatch {err:.2e}.")
