"""Affinities with entropic constraints.

TPU-native re-implementations of the reference's entropic affinity family
(reference: torchdr/affinity/entropic.py). All solvers are fully on-device:
the per-row perplexity calibration is a batched bisection inside one
``lax.while_loop`` (vs. the reference's Python loop of masked scatters), the
SEA dual ascent and Sinkhorn fixed point are ``lax.while_loop`` programs.
"""

from __future__ import annotations

import functools
import math
from typing import Optional, Tuple, Union

import jax
import jax.numpy as jnp
from jax import lax
from jax.scipy.special import logsumexp

from ..ops.reductions import entropy as entropy_red
from ..ops.root_search import binary_search
from ..utils.optim import make_optimizer
from ..utils.validation import check_neighbor_param
from .base import LogAffinity, SparseLogAffinity


def _log_Pe(C: jnp.ndarray, eps: jnp.ndarray) -> jnp.ndarray:
    """Unnormalized Gaussian log-kernel with per-row bandwidth."""
    return -C / eps[:, None]


def _log_Pse(C, eps, mu, eps_square: bool):
    """SEA log-kernel (reference: torchdr/affinity/entropic.py:38-42).

    The denominator is clamped away from 0: the dual ascent can drive an
    ε through ~0 mid-trajectory (measured: un-clamped, the solver NaNs
    after ~1000 Adam steps), and ε→0 means a degenerate point whose
    kernel should saturate, not explode.
    """
    _eps = eps**2 if eps_square else eps
    denom = jnp.maximum(_eps[:, None] + _eps[None, :], 1e-6)
    return (mu[:, None] + mu[None, :] - 2.0 * C) / denom


@jax.jit
def _bounds_entropic_affinity(C: jnp.ndarray, perplexity: jnp.ndarray):
    """Analytic bracket bounds from Vladymyrov & Carreira-Perpiñán (2013).

    (reference: torchdr/affinity/entropic.py:51-115)
    """
    n = C.shape[0]
    tN = jnp.asarray(float(n), C.dtype)
    max_val = jnp.minimum(jnp.sqrt(2.0 * tN), perplexity)

    def find_p1(x):
        return jnp.log(max_val) - 2.0 * (1.0 - x) * jnp.log(tN / (2.0 * (1.0 - x)))

    p1 = binary_search(find_p1, 1, begin=jnp.asarray([0.75]), end=jnp.asarray([1 - 1e-6]), max_iter=1000)[0]

    dN = jnp.max(C, axis=1)
    d12 = -lax.top_k(-C, 2)[0]
    d1, d2 = d12[:, 0], d12[:, 1]
    Delta_N = dN - d1
    Delta_2 = d2 - d1

    log_ratio = jnp.log(tN / perplexity)
    beta_L = jnp.maximum(
        (tN * log_ratio) / ((tN - 1.0) * Delta_N),
        jnp.sqrt(log_ratio / (dN**2 - d1**2)),
    )
    beta_U = jnp.log((tN - 1.0) * p1 / (1.0 - p1)) / Delta_2
    return 1.0 / beta_U, 1.0 / beta_L


@functools.partial(jax.jit, static_argnames=("max_iter", "use_bounds"))
def solve_entropic_affinity(
    C: jnp.ndarray, perplexity: float, max_iter: int = 1000, use_bounds: bool = True
):
    """Per-row bisection on eps s.t. row entropy equals log(perplexity) + 1.

    Returns ``(log_P, eps)`` with ``log_P`` row-normalized then shifted by
    ``-log n`` so the total mass is 1 (reference: torchdr/affinity/
    entropic.py:231-312).
    """
    n = C.shape[0]
    perp = jnp.asarray(perplexity, C.dtype)
    target_entropy = jnp.log(perp) + 1.0

    def entropy_gap(eps):
        log_P = _log_Pe(C, eps)
        log_P = log_P - logsumexp(log_P, axis=1, keepdims=True)
        return entropy_red(log_P, log=True) - target_entropy

    if use_bounds:
        begin, end = _bounds_entropic_affinity(C, perp)
        begin = begin + 1e-6
    else:
        begin = end = None

    eps = binary_search(entropy_gap, n, begin=begin, end=end, max_iter=max_iter, dtype=C.dtype)

    log_P = _log_Pe(C, eps)
    log_P = log_P - logsumexp(log_P, axis=1, keepdims=True)
    log_P = log_P - jnp.log(jnp.asarray(float(n), C.dtype))
    return log_P, eps


class EntropicAffinity(SparseLogAffinity):
    r"""Directed entropic affinity (Hinton & Roweis 2002).

    Solves, row-wise by batched bisection on the bandwidth
    :math:`\varepsilon_i`, for row entropy :math:`\log(\xi) + 1` where
    :math:`\xi` is the perplexity. Sparsity keeps the :math:`3\xi` nearest
    neighbors (reference: torchdr/affinity/entropic.py:118-312).
    """

    def __init__(
        self,
        perplexity: float = 30,
        max_iter: int = 1000,
        sparsity: bool = True,
        metric: str = "sqeuclidean",
        zero_diag: bool = True,
        device: str = "auto",
        verbose: bool = False,
        **kwargs,
    ):
        super().__init__(
            metric=metric,
            zero_diag=zero_diag,
            device=device,
            verbose=verbose,
            sparsity=sparsity,
            **kwargs,
        )
        self.perplexity = perplexity
        self.max_iter = max_iter

    def _compute_sparse_log_affinity(self, X, return_indices: bool = True, **kwargs):
        n = X.shape[0]
        perplexity = check_neighbor_param(self.perplexity, n, logger=self.logger)

        if self.sparsity:
            k = check_neighbor_param(int(3 * perplexity), n, logger=self.logger)
            self.logger.info(f"Sparsity mode: computing {k} nearest neighbors.")
            C, indices = self._distance_matrix(X, k=k, return_indices=True)
        else:
            C, indices = self._distance_matrix(X, return_indices=True)

        log_P, eps = solve_entropic_affinity(C, perplexity, max_iter=self.max_iter)
        self.eps_ = eps
        return (log_P, indices) if return_indices else log_P


class SymmetricEntropicAffinity(LogAffinity):
    r"""Symmetric entropic affinity (SEA) of Van Assel et al. 2023.

    Dual ascent on :math:`(\varepsilon, \mu)` for the entropy-constrained
    symmetric OT problem (reference: torchdr/affinity/entropic.py:315-577).
    ``optimizer="Adam"`` (default) runs functional Adam on the first-order
    dual gradients; ``optimizer="LBFGS"`` runs a device-resident L-BFGS
    with strong-Wolfe line search on the explicit dual objective — the
    analog of the reference's ``torch.optim.LBFGS`` branch, but compiled
    as a single XLA program (no host line-search round-trips).
    """

    def __init__(
        self,
        perplexity: float = 30,
        lr: float = 1e-1,
        eps_square: bool = True,
        tol: float = 1e-3,
        max_iter: int = 500,
        optimizer: str = "Adam",
        metric: str = "sqeuclidean",
        zero_diag: bool = True,
        device: str = "auto",
        verbose: bool = False,
        **kwargs,
    ):
        super().__init__(
            metric=metric, zero_diag=zero_diag, device=device, verbose=verbose, **kwargs
        )
        self.perplexity = perplexity
        self.lr = lr
        self.eps_square = bool(eps_square)
        self.tol = tol
        self.max_iter = max_iter
        self.optimizer = optimizer

    def _compute_log_affinity(self, X: jnp.ndarray):
        n = X.shape[0]
        perplexity = check_neighbor_param(self.perplexity, n, logger=self.logger)
        C = self._distance_matrix(X)
        log_P, eps, mu, n_iter = _solve_sea(
            C,
            float(perplexity),
            lr=float(self.lr),
            eps_square=self.eps_square,
            tol=float(self.tol),
            max_iter=int(self.max_iter),
            optimizer=self.optimizer,
        )
        self.eps_ = eps
        self.mu_ = mu
        self.n_iter_ = int(n_iter)
        return log_P - math.log(n)


def sea_dual_value(C, eps, mu, eps_square, target_entropy):
    """Negated SEA dual objective (the scalar LBFGS minimizes).

    Envelope form evaluated at the inner-optimal ``P(eps, mu)``:
    ``D = <P, C> + sum_i eps'_i (target - H_i) + sum_i mu_i (1 - (P 1)_i)``
    with the +1 entropy convention, so ``jax.grad`` of ``-D`` reproduces
    exactly the first-order dual gradients the Adam path uses
    (reference objective: torchdr/affinity/entropic.py:437-577).
    """
    _eps = eps**2 if eps_square else eps
    log_P = _log_Pse(C, eps, mu, eps_square)
    P = jnp.exp(log_P)
    H = entropy_red(log_P, log=True)
    D = (
        jnp.sum(P * C)
        + jnp.dot(_eps, target_entropy - H)
        + jnp.dot(mu, 1.0 - jnp.sum(P, axis=1))
    )
    return -D


@functools.partial(jax.jit, static_argnames=("eps_square", "max_iter"))
def _solve_sea_lbfgs(C, perplexity, eps_square, tol, max_iter):
    """SEA dual solve via full L-BFGS + strong-Wolfe line search.

    Replaces the reference's host-side ``torch.optim.LBFGS`` branch
    (reference: torchdr/affinity/entropic.py:500-530) with the
    device-resident ``lbfgs_minimize`` — the whole solve is one XLA
    program; each line-search trial is one fused dual evaluation.
    """
    from ..utils.optim import lbfgs_minimize

    n = C.shape[0]
    target_entropy = jnp.log(jnp.asarray(perplexity, C.dtype)) + 1.0

    def f(params):
        eps, mu = params
        return sea_dual_value(C, eps, mu, eps_square, target_entropy)

    x0 = (jnp.ones((n,), C.dtype), jnp.ones((n,), C.dtype))
    (eps, mu), _, n_iter = lbfgs_minimize(
        jax.value_and_grad(f), x0, max_iter=max_iter, tol=tol
    )
    if not eps_square:
        eps = jnp.maximum(eps, 0.0)
    log_P = _log_Pse(C, eps, mu, eps_square)
    return log_P, eps, mu, n_iter


@functools.partial(jax.jit, static_argnames=("eps_square", "max_iter", "optimizer"))
def _solve_sea(C, perplexity, lr, eps_square, tol, max_iter, optimizer="Adam"):
    if optimizer == "LBFGS":
        return _solve_sea_lbfgs(C, perplexity, eps_square, tol, max_iter)
    n = C.shape[0]
    target_entropy = jnp.log(jnp.asarray(perplexity, C.dtype)) + 1.0
    opt = make_optimizer(optimizer)

    eps0 = jnp.ones((n,), C.dtype)
    mu0 = jnp.ones((n,), C.dtype)
    params0 = (eps0, mu0)
    state0 = opt.init(params0)

    def dual_grads(eps, mu):
        log_P = _log_Pse(C, eps, mu, eps_square)
        H = entropy_red(log_P, log=True)
        P_sum = jnp.exp(logsumexp(log_P, axis=1))
        grad_eps = H - target_entropy
        if eps_square:
            grad_eps = 2.0 * eps * grad_eps
        grad_mu = P_sum - 1.0
        return grad_eps, grad_mu

    def cond(carry):
        it, params, state, done = carry
        return jnp.logical_and(it < max_iter, jnp.logical_not(done))

    def body(carry):
        it, (eps, mu), state, _ = carry
        g_eps, g_mu = dual_grads(eps, mu)
        (eps, mu), state = opt.update((g_eps, g_mu), state, (eps, mu), lr, {})
        if not eps_square:
            eps = jnp.maximum(eps, 0.0)
        done = jnp.logical_and(
            jnp.linalg.norm(g_eps) < tol, jnp.linalg.norm(g_mu) < tol
        )
        return it + 1, (eps, mu), state, done

    n_iter, (eps, mu), _, _ = lax.while_loop(cond, body, (0, params0, state0, False))
    log_P = _log_Pse(C, eps, mu, eps_square)
    return log_P, eps, mu, n_iter


class SinkhornAffinity(LogAffinity):
    r"""Symmetric doubly-stochastic affinity via log-domain Sinkhorn.

    Well-conditioned symmetric iteration ``f ← (f + T(f)) / 2`` (Feydy et
    al. 2019 eq. 25; reference: torchdr/affinity/entropic.py:580-755).

    With ``with_grad=True`` the fixed iterations are differentiable
    (used by TSNEkhorn's unrolling); otherwise the dual is computed under
    ``stop_gradient`` — the functional analog of ``torch.no_grad()``.
    """

    def __init__(
        self,
        eps: float = 1.0,
        tol: float = 1e-5,
        max_iter: int = 1000,
        base_kernel: str = "gaussian",
        metric: str = "sqeuclidean",
        zero_diag: bool = True,
        device: str = "auto",
        verbose: bool = False,
        with_grad: bool = False,
        **kwargs,
    ):
        super().__init__(
            metric=metric, zero_diag=zero_diag, device=device, verbose=verbose, **kwargs
        )
        self.eps = eps
        self.tol = tol
        self.max_iter = max_iter
        self.base_kernel = base_kernel
        self.with_grad = with_grad

    def _compute_log_affinity(
        self, X: jnp.ndarray, init_dual: Optional[jnp.ndarray] = None
    ):
        C = self._distance_matrix(X)
        return self.from_cost(C, init_dual=init_dual)

    def from_cost(self, C: jnp.ndarray, init_dual: Optional[jnp.ndarray] = None):
        """Run Sinkhorn directly on a cost matrix (used by TSNEkhorn's inner Q)."""
        n = C.shape[0]
        if self.base_kernel == "student":
            C = jnp.log1p(C)
        log_K = -C / self.eps
        dual0 = jnp.zeros((n,), C.dtype) if init_dual is None else init_dual

        log_P, dual = sinkhorn_log(
            log_K,
            dual0,
            tol=float(self.tol),
            max_iter=int(self.max_iter),
            with_grad=self.with_grad,
        )
        self.dual_ = dual
        return log_P - math.log(n)


@functools.partial(jax.jit, static_argnames=("max_iter", "with_grad"))
def sinkhorn_log(log_K, dual0, tol, max_iter, with_grad=False):
    """Symmetric log-domain Sinkhorn; returns (log_P, dual)."""

    def half_step(f, lk):
        return 0.5 * (f + (-logsumexp(lk + f[:, None], axis=0)))

    if with_grad:
        # Fixed-count differentiable unrolling (fori_loop is reverse-mode
        # differentiable with static bounds).
        dual = lax.fori_loop(
            0, max_iter, lambda i, f: half_step(f, log_K), dual0
        )
    else:
        lk = lax.stop_gradient(log_K)

        def cond(carry):
            it, f, delta = carry
            return jnp.logical_and(it < max_iter, delta >= tol)

        def body(carry):
            it, f, _ = carry
            f_new = half_step(f, lk)
            # ||f - T(f)|| as in the reference's convergence check
            delta = jnp.linalg.norm(2.0 * (f_new - f))
            return it + 1, f_new, delta

        _, dual, _ = lax.while_loop(cond, body, (0, dual0, jnp.inf))

    log_P = dual[:, None] + dual[None, :] + log_K
    return log_P, dual


class NormalizedGaussianAffinity(LogAffinity):
    r"""Gaussian affinity exp(-C/σ), optionally normalized along dims.

    (reference: torchdr/affinity/entropic.py:758-851)
    """

    def __init__(
        self,
        sigma: float = 1.0,
        metric: str = "sqeuclidean",
        zero_diag: bool = True,
        device: str = "auto",
        verbose: bool = False,
        normalization_dim: Union[int, Tuple[int, ...], None] = (0, 1),
        **kwargs,
    ):
        super().__init__(
            metric=metric, zero_diag=zero_diag, device=device, verbose=verbose, **kwargs
        )
        self.sigma = sigma
        self.normalization_dim = normalization_dim

    def _compute_log_affinity(self, X: jnp.ndarray):
        C = self._distance_matrix(X)
        log_aff = -C / self.sigma
        return self._normalize(log_aff, X.shape[0])

    def _normalize(self, log_aff, n):
        if self.normalization_dim is not None:
            log_norm = logsumexp(log_aff, axis=self.normalization_dim, keepdims=True)
            log_aff = log_aff - log_norm
        if isinstance(self.normalization_dim, int):
            log_aff = log_aff - math.log(n)
        return log_aff


class NormalizedStudentAffinity(NormalizedGaussianAffinity):
    r"""Student-t affinity (1 + C/ν)^{-(ν+1)/2}, optionally normalized.

    (reference: torchdr/affinity/entropic.py:854-955)
    """

    def __init__(
        self,
        degrees_of_freedom: float = 1.0,
        metric: str = "sqeuclidean",
        zero_diag: bool = True,
        device: str = "auto",
        verbose: bool = False,
        normalization_dim: Union[int, Tuple[int, ...], None] = (0, 1),
        **kwargs,
    ):
        super().__init__(
            sigma=1.0,
            metric=metric,
            zero_diag=zero_diag,
            device=device,
            verbose=verbose,
            normalization_dim=normalization_dim,
            **kwargs,
        )
        self.degrees_of_freedom = degrees_of_freedom

    def _compute_log_affinity(self, X: jnp.ndarray):
        C = self._distance_matrix(X)
        nu = self.degrees_of_freedom
        log_aff = -0.5 * (nu + 1.0) * jnp.log1p(C / nu)
        return self._normalize(log_aff, X.shape[0])
