"""Reductions, losses and small linear-algebra helpers.

Replaces the reference's backend-polymorphic reduction layer
(reference: torchdr/utils/utils.py:100-645). There is no LazyTensor
polymorphism to support — everything is a jnp array — so these are thin,
fusible primitives. The memory-efficient O(n²) streaming reductions that
KeOps provided live in ``ops/reduce.py`` instead.
"""

from __future__ import annotations

from typing import Tuple, Union

import jax.numpy as jnp
from jax import lax
from jax.scipy.special import logsumexp as _lse

Dim = Union[int, Tuple[int, ...], None]


# --- losses (reference: torchdr/utils/utils.py:100-144) ---


def cross_entropy_loss(P: jnp.ndarray, Q: jnp.ndarray, log: bool = False) -> jnp.ndarray:
    """H(P, Q) = -sum(P * log Q); with ``log=True`` Q holds log-probabilities."""
    if log:
        return -jnp.sum(P * Q)
    return -jnp.sum(P * jnp.log(Q))


def square_loss(P: jnp.ndarray, Q: jnp.ndarray) -> jnp.ndarray:
    return jnp.sum((P - Q) ** 2)


def entropy(P: jnp.ndarray, log: bool = True, dim: int = 1) -> jnp.ndarray:
    """Row-wise Shannon entropy h(p) = -sum p (log p - 1).

    (reference: torchdr/utils/utils.py:147-170)
    """
    if log:
        return -jnp.sum(jnp.exp(P) * (P - 1.0), axis=dim)
    return -jnp.sum(P * (jnp.log(P) - 1.0), axis=dim)


def logsumexp_red(logP: jnp.ndarray, dim: Dim = 1, keepdims: bool = True) -> jnp.ndarray:
    """logsumexp reduction; keepdims so results broadcast against (n, k) arrays."""
    return _lse(logP, axis=dim, keepdims=keepdims)


def sum_red(P: jnp.ndarray, dim: Dim = 1, keepdims: bool = True) -> jnp.ndarray:
    return jnp.sum(P, axis=dim, keepdims=keepdims)


# --- masked variants for padded (n, k) sparse affinities ---
# Padded entries carry index -1; callers pass ``mask = indices >= 0``.


def masked_logsumexp(logP: jnp.ndarray, mask: jnp.ndarray, dim: Dim = 1, keepdims: bool = True):
    neg_inf = jnp.asarray(-jnp.inf, dtype=logP.dtype)
    return _lse(jnp.where(mask, logP, neg_inf), axis=dim, keepdims=keepdims)


# --- linear algebra helpers ---


def svd_flip(u: jnp.ndarray, v: jnp.ndarray, u_based_decision: bool = True):
    """Deterministic SVD sign convention (reference: torchdr/utils/utils.py:265-300)."""
    if u_based_decision:
        max_abs = jnp.argmax(jnp.abs(u), axis=0)
        signs = jnp.sign(u[max_abs, jnp.arange(u.shape[1])])
    else:
        max_abs = jnp.argmax(jnp.abs(v), axis=1)
        signs = jnp.sign(v[jnp.arange(v.shape[0]), max_abs])
    signs = jnp.where(signs == 0, 1.0, signs)
    return u * signs[None, :], v * signs[:, None]


def center_kernel(K: jnp.ndarray) -> jnp.ndarray:
    """Double-center a kernel matrix (reference: torchdr/utils/utils.py:413-440)."""
    row_mean = jnp.mean(K, axis=1, keepdims=True)
    col_mean = jnp.mean(K, axis=0, keepdims=True)
    grand_mean = jnp.mean(K)
    return K - row_mean - col_mean + grand_mean


def matrix_power(A: jnp.ndarray, p: Union[int, float]) -> jnp.ndarray:
    """A^p; integer powers via repeated squaring, fractional via eigh.

    (reference: torchdr/utils/utils.py:580-645)
    """
    if isinstance(p, int) or (isinstance(p, float) and p.is_integer()):
        return jnp.linalg.matrix_power(A, int(p))
    evals, evecs = jnp.linalg.eigh(A)
    evals = jnp.maximum(evals, 0.0)
    return (evecs * (evals**p)[None, :]) @ evecs.T


def kmin(C: jnp.ndarray, k: int, dim: int = 1):
    """k smallest values (ascending) and their indices along ``dim``.

    (reference: torchdr/utils/utils.py:173-262 — the torch/keops-polymorphic
    version; here a single ``top_k`` on the negated input.)
    """
    if dim != 1:
        C = jnp.swapaxes(C, dim, 1)
    neg_vals, idx = lax.top_k(-C, k)
    vals = -neg_vals
    if dim != 1:
        vals = jnp.swapaxes(vals, dim, 1)
        idx = jnp.swapaxes(idx, dim, 1)
    return vals, idx


def kmax(C: jnp.ndarray, k: int, dim: int = 1):
    if dim != 1:
        C = jnp.swapaxes(C, dim, 1)
    vals, idx = lax.top_k(C, k)
    if dim != 1:
        vals = jnp.swapaxes(vals, dim, 1)
        idx = jnp.swapaxes(idx, dim, 1)
    return vals, idx


def check_nonnegativity_eigenvalues(evals: jnp.ndarray, tol: float = 1e-6) -> jnp.ndarray:
    """Clamp small negative eigenvalues to zero (numerical noise)."""
    return jnp.where(evals < 0, jnp.where(evals > -tol, 0.0, evals), evals)
