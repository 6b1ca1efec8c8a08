"""Doubly stochastic affinity with quadratic (L2) regularization.

TPU-native (reference: torchdr/affinity/quadratic.py:27-220). Dual ascent
with the functional Adam inside one ``lax.while_loop``;
P = [f ⊕ f − C]₊ / ε.
"""

from __future__ import annotations

import functools
import jax
import jax.numpy as jnp
from jax import lax

from ..utils.optim import make_optimizer
from .base import Affinity


def _Pds(C: jnp.ndarray, dual: jnp.ndarray, eps: float) -> jnp.ndarray:
    return jnp.maximum(dual[:, None] + dual[None, :] - C, 0.0) / eps


@functools.partial(jax.jit, static_argnames=("max_iter", "optimizer"))
def _solve_quadratic_ds(C, eps, lr, tol, max_iter, optimizer="Adam"):
    n = C.shape[0]
    opt = make_optimizer(optimizer)
    dual0 = jnp.ones((n,), C.dtype)
    state0 = opt.init(dual0)

    def cond(carry):
        it, dual, state, done = carry
        return jnp.logical_and(it < max_iter, jnp.logical_not(done))

    def body(carry):
        it, dual, state, _ = carry
        P = _Pds(C, dual, eps)
        grad = jnp.sum(P, axis=1) - 1.0
        dual, state = opt.update(grad, state, dual, lr, {})
        done = jnp.linalg.norm(grad) < tol
        return it + 1, dual, state, done

    n_iter, dual, _, _ = lax.while_loop(cond, body, (0, dual0, state0, False))
    return _Pds(C, dual, eps) / n, dual, n_iter


class DoublyStochasticQuadraticAffinity(Affinity):
    r"""L2-regularized symmetric OT affinity (Zhang et al. 2023).

    P = [f ⊕ f − C]₊ / ε with dual ascent on f so rows sum to 1, then
    globally scaled to total mass 1 (reference: torchdr/affinity/
    quadratic.py:146-220).
    """

    def __init__(
        self,
        eps: float = 1.0,
        tol: float = 1e-5,
        max_iter: int = 1000,
        optimizer: str = "Adam",
        lr: float = 1e0,
        base_kernel: str = "gaussian",
        metric: str = "sqeuclidean",
        zero_diag: bool = True,
        device: str = "auto",
        verbose: bool = False,
        **kwargs,
    ):
        super().__init__(
            metric=metric, zero_diag=zero_diag, device=device, verbose=verbose, **kwargs
        )
        self.eps = eps
        self.tol = tol
        self.max_iter = max_iter
        self.optimizer = optimizer
        self.lr = lr
        self.base_kernel = base_kernel

    def _compute_affinity(self, X: jnp.ndarray):
        C = self._distance_matrix(X)
        if self.base_kernel == "student":
            C = jnp.log1p(C)
        P, dual, n_iter = _solve_quadratic_ds(
            C, float(self.eps), float(self.lr), float(self.tol), int(self.max_iter),
            optimizer=self.optimizer,
        )
        self._store("dual_", dual)
        self._store("n_iter_", int(n_iter))
        return P
