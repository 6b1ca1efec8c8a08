"""Functional first-order optimizers with runtime hyperparameters.

The reference drives ``torch.optim`` objects and *re-instantiates* them when
the early-exaggeration phase ends (reference: torchdr/neighbor_embedding/
base.py:282-295, affinity_matcher.py:597-657). That pattern is host-side and
stateful; under XLA the whole optimization must be one compiled loop. So
optimizers here are pure ``(init, update)`` pairs whose learning rate and
momentum are *runtime arguments* — phase switches become ``jnp.where`` on
the iteration counter, and "re-instantiating the optimizer" becomes zeroing
the carried moment buffers.

Update semantics match torch.optim (SGD: buf = μ·buf + g, step = -lr·buf;
Adam/AdamW/NAdam with torch default betas) so the reference's tuning
transfers.
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple, Tuple

import jax
import jax.flatten_util  # noqa: F401  (registers jax.flatten_util)
import jax.numpy as jnp
from jax import lax

Params = Any  # pytree


class OptimizerDef(NamedTuple):
    name: str
    init: Any  # params -> state
    update: Any  # (grad, state, params, lr, hyper: dict) -> (new_params, new_state)
    reset: Any  # state -> state with moments zeroed (optimizer "re-instantiation")


def _tree_zeros(params):
    return jax.tree_util.tree_map(jnp.zeros_like, params)


# --- SGD (torch.optim.SGD semantics) ---


def _sgd_init(params):
    return {"buf": _tree_zeros(params), "step": jnp.zeros((), jnp.int32)}


def _sgd_update(grad, state, params, lr, hyper):
    momentum = hyper.get("momentum", 0.0)
    first = state["step"] == 0

    def upd(g, b):
        # torch: buf = g on first step, else mu*buf + g
        b_new = jnp.where(first, g, momentum * b + g)
        return b_new

    buf = jax.tree_util.tree_map(upd, grad, state["buf"])
    new_params = jax.tree_util.tree_map(lambda p, b: p - lr * b, params, buf)
    return new_params, {"buf": buf, "step": state["step"] + 1}


# --- Adam family ---


def _adam_init(params):
    return {
        "m": _tree_zeros(params),
        "v": _tree_zeros(params),
        "step": jnp.zeros((), jnp.int32),
    }


def _adam_update_impl(grad, state, params, lr, hyper, weight_decay=0.0, nesterov=False):
    b1 = hyper.get("beta1", 0.9)
    b2 = hyper.get("beta2", 0.999)
    eps = hyper.get("eps", 1e-8)
    t = state["step"] + 1
    tf = t.astype(jnp.float32)

    def upd(p, g, m, v):
        if weight_decay:
            p = p * (1.0 - lr * weight_decay)  # AdamW decoupled decay
        m_new = b1 * m + (1 - b1) * g
        v_new = b2 * v + (1 - b2) * g * g
        m_hat = m_new / (1 - b1**tf)
        if nesterov:
            m_hat = b1 * m_hat + (1 - b1) * g / (1 - b1**tf)
        v_hat = v_new / (1 - b2**tf)
        return p - lr * m_hat / (jnp.sqrt(v_hat) + eps), m_new, v_new

    flat_p, treedef = jax.tree_util.tree_flatten(params)
    flat_g = treedef.flatten_up_to(grad)
    flat_m = treedef.flatten_up_to(state["m"])
    flat_v = treedef.flatten_up_to(state["v"])
    out = [upd(p, g, m, v) for p, g, m, v in zip(flat_p, flat_g, flat_m, flat_v)]
    new_params = treedef.unflatten([o[0] for o in out])
    new_m = treedef.unflatten([o[1] for o in out])
    new_v = treedef.unflatten([o[2] for o in out])
    return new_params, {"m": new_m, "v": new_v, "step": t}


def _make_adam(weight_decay=0.0, nesterov=False):
    def update(grad, state, params, lr, hyper):
        wd = hyper.get("weight_decay", weight_decay)
        return _adam_update_impl(grad, state, params, lr, hyper, wd, nesterov)

    return update


def _reset(state):
    out = dict(state)
    for key in ("buf", "m", "v"):
        if key in out:
            out[key] = _tree_zeros(out[key])
    out["step"] = jnp.zeros((), jnp.int32)
    return out


# --- Riemannian Adam on the Poincaré ball (reference: torchdr/utils/
# radam.py:87-170, geoopt-style). Operates on a single (n, d) point array. ---


def _radam_init(params):
    return {
        "m": jnp.zeros_like(params),
        "v": jnp.zeros_like(params[..., :1]),
        "step": jnp.zeros((), jnp.int32),
    }


def _radam_update(grad, state, point, lr, hyper):
    from .manifold import (
        egrad2rgrad,
        poincare_expmap,
        poincare_inner,
        poincare_project,
        poincare_ptransp,
    )

    b1 = hyper.get("beta1", 0.9)
    b2 = hyper.get("beta2", 0.999)
    eps = hyper.get("eps", 1e-8)
    wd = hyper.get("weight_decay", 0.0)
    t = state["step"] + 1
    tf = t.astype(jnp.float32)

    g = grad + wd * point
    rgrad = egrad2rgrad(point, g)
    m = b1 * state["m"] + (1 - b1) * rgrad
    v = b2 * state["v"] + (1 - b2) * poincare_inner(point, rgrad)
    denom = jnp.sqrt(v) + eps
    step_size = lr * jnp.sqrt(1 - b2**tf) / (1 - b1**tf)
    direction = m / denom
    new_point = poincare_project(poincare_expmap(-step_size * direction, point))
    m = poincare_ptransp(point, new_point, m)
    return new_point, {"m": m, "v": v, "step": t}


# --- L-BFGS (fixed-step, fixed-memory two-loop recursion) ---
#
# The reference's SEA solver offers torch.optim.LBFGS with strong-Wolfe
# line search (reference: torchdr/affinity/entropic.py:437-577) — a
# host-side, data-dependently-iterating optimizer that can't live inside a
# compiled while_loop. The XLA-native replacement: curvature pairs in a
# fixed-size ring buffer, the classic two-loop recursion with masked
# invalid slots, and a fixed step (lr) instead of a line search.

_LBFGS_MEM = 10


def _lbfgs_init(params):
    flat, _ = jax.flatten_util.ravel_pytree(params)
    d = flat.size
    return {
        "s": jnp.zeros((_LBFGS_MEM, d), flat.dtype),
        "y": jnp.zeros((_LBFGS_MEM, d), flat.dtype),
        "rho": jnp.zeros((_LBFGS_MEM,), flat.dtype),
        "prev_x": flat,
        "prev_g": jnp.zeros_like(flat),
        "step": jnp.zeros((), jnp.int32),
    }


def _lbfgs_update(grad, state, params, lr, hyper):
    flat, unravel = jax.flatten_util.ravel_pytree(params)
    g, _ = jax.flatten_util.ravel_pytree(grad)
    m = _LBFGS_MEM
    step = state["step"]

    s_k = flat - state["prev_x"]
    y_k = g - state["prev_g"]
    sy = jnp.dot(s_k, y_k)
    valid = jnp.logical_and(step > 0, sy > 1e-10)
    slot = jnp.maximum(step - 1, 0) % m
    s_h = jnp.where(valid, state["s"].at[slot].set(s_k), state["s"])
    y_h = jnp.where(valid, state["y"].at[slot].set(y_k), state["y"])
    rho = jnp.where(
        valid, state["rho"].at[slot].set(1.0 / jnp.maximum(sy, 1e-30)), state["rho"]
    )

    # two-loop recursion, most-recent pair first; empty slots masked by rho=0
    def loop1(j, carry):
        q, alphas = carry
        idx = (slot - j) % m
        a = rho[idx] * jnp.dot(s_h[idx], q)
        a = jnp.where(rho[idx] > 0, a, 0.0)
        return q - a * y_h[idx], alphas.at[j].set(a)

    q, alphas = jax.lax.fori_loop(
        0, m, loop1, (g, jnp.zeros((m,), g.dtype))
    )
    yy = jnp.dot(y_h[slot], y_h[slot])
    gamma = jnp.where(rho[slot] > 0, 1.0 / jnp.maximum(rho[slot] * yy, 1e-30), 1.0)
    r = gamma * q

    def loop2(j, r):
        idx = (slot - (m - 1 - j)) % m
        b = rho[idx] * jnp.dot(y_h[idx], r)
        corr = (alphas[m - 1 - j] - b) * s_h[idx]
        return jnp.where(rho[idx] > 0, r + corr, r)

    r = jax.lax.fori_loop(0, m, loop2, r)
    new_flat = flat - lr * r
    new_state = {
        "s": s_h, "y": y_h, "rho": rho,
        "prev_x": flat, "prev_g": g, "step": step + 1,
    }
    return unravel(new_flat), new_state


# --- Full L-BFGS solver with strong-Wolfe line search ---
#
# The reference's SEA solver can run torch.optim.LBFGS with
# ``line_search_fn="strong_wolfe"`` (reference: torchdr/affinity/
# entropic.py:500-530) — a host-side Python line search. Here BOTH the
# two-loop recursion and the Wolfe bracket/zoom loop are bounded
# ``lax.while_loop`` programs, so the entire solve is one XLA
# computation: every trial point costs exactly one fused
# ``value_and_grad`` evaluation on-device, with no host round-trips.


def _wolfe_line_search(vag_d, f0, dphi0, t0, c1, c2, max_ls):
    """Strong-Wolfe step length on phi(t) = f(x + t*d).

    ``vag_d(t) -> (phi, dphi)`` evaluates the objective and the
    directional derivative at step ``t``. Single while_loop state
    machine: phase 0 brackets (doubling), phase 1 zooms (bisection,
    Nocedal & Wright alg. 3.6). Falls back to the best Armijo point
    seen (or the lowest-value trial) when Wolfe isn't met in
    ``max_ls`` evaluations.
    """
    big = jnp.asarray(jnp.inf, f0.dtype)

    def cond(carry):
        it, phase, t, t_prev, f_prev, t_lo, f_lo, t_hi, t_best, f_best, done = carry
        return jnp.logical_and(it < max_ls, jnp.logical_not(done))

    def body(carry):
        it, phase, t, t_prev, f_prev, t_lo, f_lo, t_hi, t_best, f_best, done = carry
        phi, dphi = vag_d(t)

        armijo = phi <= f0 + c1 * t * dphi0
        curv = jnp.abs(dphi) <= -c2 * dphi0
        wolfe = jnp.logical_and(armijo, curv)

        # best-seen fallback: prefer Armijo points, else lowest value
        better = jnp.where(
            jnp.isinf(f_best), phi < f0, jnp.logical_and(armijo, phi < f_best)
        )
        t_best = jnp.where(better, t, t_best)
        f_best = jnp.where(better, phi, f_best)

        # --- phase 0: bracketing ---
        hi_found = jnp.logical_or(
            jnp.logical_not(armijo), jnp.logical_and(it > 0, phi >= f_prev)
        )
        rev_found = dphi >= 0  # slope turned up: bracket is (t, t_prev)
        b_to_zoom = jnp.logical_or(hi_found, rev_found)
        b_t_lo = jnp.where(hi_found, t_prev, t)
        b_f_lo = jnp.where(hi_found, f_prev, phi)
        b_t_hi = jnp.where(hi_found, t, t_prev)

        # --- phase 1: zoom (bisection) ---
        z_shrink_hi = jnp.logical_or(jnp.logical_not(armijo), phi >= f_lo)
        z_flip = dphi * (t_hi - t_lo) >= 0
        z_t_lo = jnp.where(z_shrink_hi, t_lo, t)
        z_f_lo = jnp.where(z_shrink_hi, f_lo, phi)
        z_t_hi = jnp.where(z_shrink_hi, t, jnp.where(z_flip, t_lo, t_hi))

        in_zoom = phase == 1
        n_phase = jnp.where(
            jnp.logical_or(in_zoom, b_to_zoom),
            jnp.ones((), jnp.int32),
            jnp.zeros((), jnp.int32),
        )
        n_t_lo = jnp.where(in_zoom, z_t_lo, jnp.where(b_to_zoom, b_t_lo, t_lo))
        n_f_lo = jnp.where(in_zoom, z_f_lo, jnp.where(b_to_zoom, b_f_lo, f_lo))
        n_t_hi = jnp.where(in_zoom, z_t_hi, jnp.where(b_to_zoom, b_t_hi, t_hi))
        n_t = jnp.where(
            n_phase == 1, 0.5 * (n_t_lo + n_t_hi), 2.0 * t  # bisect | expand
        )

        t_best = jnp.where(wolfe, t, t_best)
        f_best = jnp.where(wolfe, phi, f_best)
        return (
            it + 1, n_phase, n_t, t, phi, n_t_lo, n_f_lo, n_t_hi,
            t_best, f_best, wolfe,
        )

    zero = jnp.zeros((), f0.dtype)
    init = (
        jnp.zeros((), jnp.int32), jnp.zeros((), jnp.int32), t0, zero, f0,
        zero, f0, big, zero, big, jnp.asarray(False),
    )
    out = lax.while_loop(cond, body, init)
    t_best = out[8]
    return jnp.where(t_best > 0, t_best, t0)  # all trials diverged: take t0


def lbfgs_minimize(
    value_and_grad_fn,
    x0,
    max_iter: int = 100,
    memory: int = _LBFGS_MEM,
    tol: float = 1e-6,
    c1: float = 1e-4,
    c2: float = 0.9,
    max_ls: int = 20,
):
    """Minimize ``f`` from ``x0`` (pytree) by L-BFGS with strong Wolfe.

    Returns ``(x, f, n_iter)``. Device-resident counterpart of
    ``torch.optim.LBFGS(line_search_fn="strong_wolfe")`` (reference:
    torchdr/affinity/entropic.py:500-530): curvature pairs in a ring
    buffer, two-loop recursion with masked empty slots, first step
    scaled by 1/||g||_1 as in torch, later steps starting at t=1.
    """
    flat0, unravel = jax.flatten_util.ravel_pytree(x0)
    m = int(memory)

    def vag_flat(xf):
        f, g = value_and_grad_fn(unravel(xf))
        return f, jax.flatten_util.ravel_pytree(g)[0]

    f0, g0 = vag_flat(flat0)

    def two_loop(g, s_h, y_h, rho, slot):
        def loop1(j, carry):
            q, alphas = carry
            idx = (slot - j) % m
            a = rho[idx] * jnp.dot(s_h[idx], q)
            a = jnp.where(rho[idx] > 0, a, 0.0)
            return q - a * y_h[idx], alphas.at[j].set(a)

        q, alphas = lax.fori_loop(0, m, loop1, (g, jnp.zeros((m,), g.dtype)))
        yy = jnp.dot(y_h[slot], y_h[slot])
        gamma = jnp.where(
            rho[slot] > 0, 1.0 / jnp.maximum(rho[slot] * yy, 1e-30), 1.0
        )
        r = gamma * q

        def loop2(j, r):
            idx = (slot - (m - 1 - j)) % m
            b = rho[idx] * jnp.dot(y_h[idx], r)
            corr = (alphas[m - 1 - j] - b) * s_h[idx]
            return jnp.where(rho[idx] > 0, r + corr, r)

        return lax.fori_loop(0, m, loop2, r)

    def cond(carry):
        k, x, f, g, s_h, y_h, rho, done = carry
        return jnp.logical_and(k < max_iter, jnp.logical_not(done))

    def body(carry):
        k, x, f, g, s_h, y_h, rho, done = carry
        slot_last = jnp.maximum(k - 1, 0) % m
        d = -two_loop(g, s_h, y_h, rho, slot_last)
        dg = jnp.dot(d, g)
        descent = dg < 0
        d = jnp.where(descent, d, -g)
        dphi0 = jnp.where(descent, dg, -jnp.dot(g, g))

        t0 = jnp.where(
            k == 0,
            jnp.minimum(1.0, 1.0 / jnp.maximum(jnp.sum(jnp.abs(g)), 1e-30)),
            1.0,
        ).astype(f.dtype)

        def vag_d(t):
            ft, gt = vag_flat(x + t * d)
            return ft, jnp.dot(gt, d)

        t = _wolfe_line_search(vag_d, f, dphi0, t0, c1, c2, max_ls)
        x_new = x + t * d
        f_new, g_new = vag_flat(x_new)

        s_k = x_new - x
        y_k = g_new - g
        sy = jnp.dot(s_k, y_k)
        valid = sy > 1e-10
        slot = k % m
        s_h = jnp.where(valid, s_h.at[slot].set(s_k), s_h)
        y_h = jnp.where(valid, y_h.at[slot].set(y_k), y_h)
        rho = jnp.where(
            valid, rho.at[slot].set(1.0 / jnp.maximum(sy, 1e-30)), rho
        )
        done = jnp.logical_or(
            jnp.max(jnp.abs(g_new)) <= tol,
            jnp.abs(f_new - f) <= 1e-12 * jnp.maximum(1.0, jnp.abs(f)),
        )
        # keep the better iterate if the search failed to descend
        worse = f_new > f
        return (
            k + 1,
            jnp.where(worse, x, x_new),
            jnp.where(worse, f, f_new),
            jnp.where(worse, g, g_new),
            s_h, y_h, rho,
            jnp.logical_or(done, worse),
        )

    d0 = flat0.size
    init = (
        jnp.zeros((), jnp.int32), flat0, f0, g0,
        jnp.zeros((m, d0), flat0.dtype), jnp.zeros((m, d0), flat0.dtype),
        jnp.zeros((m,), flat0.dtype), jnp.max(jnp.abs(g0)) <= tol,
    )
    k, x, f, g, *_ = lax.while_loop(cond, body, init)
    return unravel(x), f, k


def _lbfgs_reset(state):
    out = dict(state)
    out["s"] = jnp.zeros_like(out["s"])
    out["y"] = jnp.zeros_like(out["y"])
    out["rho"] = jnp.zeros_like(out["rho"])
    out["prev_g"] = jnp.zeros_like(out["prev_g"])
    out["step"] = jnp.zeros((), jnp.int32)
    return out


_OPTIMIZERS = {
    "SGD": ( _sgd_init, _sgd_update),
    "Adam": (_adam_init, _make_adam()),
    "AdamW": (_adam_init, _make_adam(weight_decay=1e-2)),
    "NAdam": (_adam_init, _make_adam(nesterov=True)),
    "RiemannianAdam": (_radam_init, _radam_update),
    "LBFGS": (_lbfgs_init, _lbfgs_update),
}


def make_optimizer(name: str) -> OptimizerDef:
    if name not in _OPTIMIZERS:
        raise ValueError(
            f"[TorchDR-TPU] ERROR: Optimizer '{name}' not supported. "
            f"Available: {sorted(_OPTIMIZERS)}."
        )
    init, update = _OPTIMIZERS[name]
    reset = _lbfgs_reset if name == "LBFGS" else _reset
    return OptimizerDef(name, init, update, reset)


def normalize_optimizer_kwargs(kwargs: Dict | None) -> Dict:
    """Map torch-style kwarg names onto the runtime hyper dict."""
    if not kwargs:
        return {}
    out = dict(kwargs)
    if "betas" in out:
        b1, b2 = out.pop("betas")
        out["beta1"], out["beta2"] = b1, b2
    return out
