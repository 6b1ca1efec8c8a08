"""Poincaré ball manifold operations (pure JAX).

TPU-native counterpart of the reference's manifold module
(reference: torchdr/utils/manifold.py:13-385). Functions instead of
classes: every op is a pure jnp function usable inside jit/grad, with the
same numerics (clamped artanh/tanh, min-norm guards, eps-ball projection).
Curvature ``c`` defaults to 1.
"""

from __future__ import annotations

import jax.numpy as jnp

MIN_NORM = 1e-15
BALL_EPS = 4e-3  # float32 projection margin (reference: manifold.py eps dict)


def _artanh(x):
    x = jnp.clip(x, -1 + 1e-7, 1 - 1e-7)
    return 0.5 * (jnp.log1p(x) - jnp.log1p(-x))


def _tanh(x, clamp: float = 15.0):
    return jnp.tanh(jnp.clip(x, -clamp, clamp))


def _norm(x, keepdims=True):
    return jnp.maximum(jnp.linalg.norm(x, axis=-1, keepdims=keepdims), MIN_NORM)


def lambda_x(x, c: float = 1.0):
    """Conformal factor 2 / (1 - c‖x‖²)."""
    sqnorm = jnp.sum(x * x, axis=-1, keepdims=True)
    return 2.0 / jnp.maximum(1.0 - c * sqnorm, MIN_NORM)


def mobius_add(x, y, c: float = 1.0):
    x2 = jnp.sum(x * x, axis=-1, keepdims=True)
    y2 = jnp.sum(y * y, axis=-1, keepdims=True)
    xy = jnp.sum(x * y, axis=-1, keepdims=True)
    num = (1 + 2 * c * xy + c * y2) * x + (1 - c * x2) * y
    denom = 1 + 2 * c * xy + c**2 * x2 * y2
    return num / jnp.maximum(denom, MIN_NORM)


def poincare_project(x, c: float = 1.0):
    """Clamp points into the open ball of radius (1-eps)/√c."""
    norm = _norm(x)
    maxnorm = (1 - BALL_EPS) / (c**0.5)
    return jnp.where(norm > maxnorm, x / norm * maxnorm, x)


def poincare_expmap(u, p, c: float = 1.0):
    sqrt_c = c**0.5
    u_norm = _norm(u)
    second = _tanh(sqrt_c / 2 * lambda_x(p, c) * u_norm) * u / (sqrt_c * u_norm)
    return mobius_add(p, second, c)


def poincare_expmap0(u, c: float = 1.0):
    sqrt_c = c**0.5
    u_norm = _norm(u)
    return _tanh(sqrt_c * u_norm) * u / (sqrt_c * u_norm)


def poincare_logmap(p1, p2, c: float = 1.0):
    sub = mobius_add(-p1, p2, c)
    sub_norm = _norm(sub)
    lam = lambda_x(p1, c)
    sqrt_c = c**0.5
    return 2 / sqrt_c / lam * _artanh(sqrt_c * sub_norm) * sub / sub_norm


def poincare_logmap0(p, c: float = 1.0):
    sqrt_c = c**0.5
    p_norm = _norm(p)
    return (1.0 / sqrt_c) * _artanh(sqrt_c * p_norm) / p_norm * p


def poincare_sqdist(p1, p2, c: float = 1.0):
    """Squared geodesic distance between aligned rows."""
    sqrt_c = c**0.5
    dist_c = _artanh(sqrt_c * _norm(mobius_add(-p1, p2, c), keepdims=False))
    return (dist_c * 2 / sqrt_c) ** 2


def egrad2rgrad(p, dp, c: float = 1.0):
    """Euclidean → Riemannian gradient (scale by 1/λ²)."""
    return dp / lambda_x(p, c) ** 2


def _gyration(u, v, w, c: float = 1.0):
    u2 = jnp.sum(u * u, axis=-1, keepdims=True)
    v2 = jnp.sum(v * v, axis=-1, keepdims=True)
    uv = jnp.sum(u * v, axis=-1, keepdims=True)
    uw = jnp.sum(u * w, axis=-1, keepdims=True)
    vw = jnp.sum(v * w, axis=-1, keepdims=True)
    c2 = c**2
    a = -c2 * uw * v2 + c * vw + 2 * c2 * uv * vw
    b = -c2 * vw * u2 - c * uw
    d = 1 + 2 * c * uv + c2 * u2 * v2
    return w + 2 * (a * u + b * v) / jnp.maximum(d, MIN_NORM)


def poincare_ptransp(x, y, u, c: float = 1.0):
    """Parallel transport of tangent u from x to y (gyration form)."""
    return _gyration(y, -x, u, c) * lambda_x(x, c) / lambda_x(y, c)


def poincare_inner(x, u, v=None, c: float = 1.0, keepdims=True):
    if v is None:
        v = u
    return lambda_x(x, c) ** 2 * jnp.sum(u * v, axis=-1, keepdims=keepdims)
