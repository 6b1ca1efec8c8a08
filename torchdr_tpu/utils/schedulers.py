"""Functional learning-rate schedules.

The reference drives ``torch.optim.lr_scheduler`` objects
(reference: torchdr/affinity_matcher.py:623-657); here a schedule is a pure
function ``factor(t, total) -> multiplier`` evaluated inside the compiled
training loop. Semantics mirror the torch schedulers the reference uses.
"""

from __future__ import annotations

from typing import Callable, Dict, Optional

import jax.numpy as jnp

ScheduleFn = Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray]


def make_scheduler(name: Optional[str], kwargs: Optional[Dict] = None) -> ScheduleFn:
    """Return factor(t_local, total_iters) for the named schedule.

    Supported: None (constant 1), "LinearLR", "ExponentialLR",
    "CosineAnnealingLR", "ConstantLR".
    """
    kwargs = dict(kwargs or {})

    if name is None:
        return lambda t, total: jnp.ones_like(jnp.asarray(t, jnp.float32))

    if name == "LinearLR":
        start = float(kwargs.get("start_factor", 1.0 / 3.0))
        end = float(kwargs.get("end_factor", 1.0))
        total_override = kwargs.get("total_iters", None)

        def linear(t, total):
            tt = jnp.asarray(total_override if total_override is not None else total, jnp.float32)
            frac = jnp.clip(jnp.asarray(t, jnp.float32) / jnp.maximum(tt, 1.0), 0.0, 1.0)
            return start + (end - start) * frac

        return linear

    if name == "ExponentialLR":
        gamma = float(kwargs.get("gamma", 0.99))
        return lambda t, total: gamma ** jnp.asarray(t, jnp.float32)

    if name == "CosineAnnealingLR":
        eta_min_ratio = float(kwargs.get("eta_min_ratio", 0.0))
        t_max_override = kwargs.get("T_max", None)

        def cosine(t, total):
            tt = jnp.asarray(t_max_override if t_max_override is not None else total, jnp.float32)
            frac = jnp.clip(jnp.asarray(t, jnp.float32) / jnp.maximum(tt, 1.0), 0.0, 1.0)
            return eta_min_ratio + (1 - eta_min_ratio) * 0.5 * (1 + jnp.cos(jnp.pi * frac))

        return cosine

    if name == "ConstantLR":
        factor = float(kwargs.get("factor", 1.0 / 3.0))
        total_override = kwargs.get("total_iters", None)

        def const(t, total):
            tt = jnp.asarray(total_override if total_override is not None else total, jnp.float32)
            return jnp.where(jnp.asarray(t, jnp.float32) < tt, factor, 1.0)

        return const

    raise ValueError(f"[TorchDR-TPU] ERROR: Scheduler '{name}' not supported.")
