"""Base estimator for all dimensionality-reduction modules.

TPU-native counterpart of the reference's ``DRModule``
(reference: torchdr/base.py:27-229). Differences by design:

- No ``nn.Module``: fitted state is plain (numpy/jax) arrays on attributes
  with trailing underscores, sklearn style.
- Input handling accepts numpy / JAX / torch arrays and restores the
  caller's container on output.
- Seeding is JAX-functional: ``random_state`` becomes a root
  ``jax.random.PRNGKey`` threaded through the fit instead of global seeds.
- ``device`` is kept for API parity but on TPU the default placement is
  whatever ``jax.devices()[0]`` is; sharded placement is configured via
  :mod:`torchdr_tpu.parallel`.
"""

from __future__ import annotations

import inspect
from abc import ABC, abstractmethod
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .utils.compile_cache import enable_compile_cache
from .utils.logger import get_logger
from .utils.wrappers import (
    deduplicate,
    restore_format,
    to_host,
    to_jax,
    validate_2d,
)


class BaseEstimator:
    """Minimal sklearn-compatible parameter handling (get/set_params, repr)."""

    @classmethod
    def _get_param_names(cls):
        init = cls.__init__
        sig = inspect.signature(init)
        return sorted(
            p.name
            for p in sig.parameters.values()
            if p.name != "self" and p.kind not in (p.VAR_KEYWORD, p.VAR_POSITIONAL)
        )

    def get_params(self, deep: bool = True):
        return {name: getattr(self, name, None) for name in self._get_param_names()}

    def set_params(self, **params):
        valid = set(self._get_param_names())
        for key, value in params.items():
            if key not in valid:
                raise ValueError(
                    f"Invalid parameter {key!r} for estimator {type(self).__name__}."
                )
            setattr(self, key, value)
        return self

    def __repr__(self):
        params = ", ".join(f"{k}={v!r}" for k, v in sorted(self.get_params().items()))
        return f"{type(self).__name__}({params})"


class DRModule(BaseEstimator, ABC):
    """Base class for dimensionality reduction methods.

    Subclasses implement :meth:`_fit_transform`.

    Parameters
    ----------
    n_components : int, default=2
        Embedding dimensionality.
    device : str, default="auto"
        Kept for API parity with the reference; "auto" uses the default JAX
        device. "cpu" forces host placement (useful for tests).
    verbose : bool, default=False
        Verbosity.
    random_state : int, optional
        Seed for the root PRNG key.
    process_duplicates : bool, default=True
        Deduplicate identical rows before fitting and map the embedding back
        (reference: torchdr/base.py:125-151).
    """

    def __init__(
        self,
        n_components: int = 2,
        device: str = "auto",
        verbose: bool = False,
        random_state: Optional[int] = None,
        process_duplicates: bool = True,
        **kwargs,
    ):
        self.n_components = n_components
        self.device = device if device is not None else "auto"
        self.verbose = verbose
        self.random_state = random_state
        self.process_duplicates = process_duplicates
        # cold XLA compiles ARE the first-fit time (283 s vs 82 s warm at
        # the 1.3M flagship) — persist them across processes
        enable_compile_cache()
        self.logger = get_logger(type(self).__name__, verbose)
        self.embedding_ = None
        self.is_fitted_ = False
        for key in kwargs:
            self.logger.warning(f"Ignoring unknown keyword argument {key!r}.")

    # --- PRNG discipline ---

    def _root_key(self) -> jax.Array:
        seed = self.random_state if self.random_state is not None else np.random.randint(0, 2**31 - 1)
        return jax.random.PRNGKey(int(seed))

    # --- Public API ---

    def fit(self, X, y: Optional[Any] = None) -> "DRModule":
        """Fit the model from input data."""
        self.fit_transform(X, y=y)
        return self

    def fit_transform(self, X, y: Optional[Any] = None):
        """Fit the model and return the embedding.

        Duplicate rows are removed before fitting and the embedding is
        mapped back through the inverse index (reference: torchdr/base.py:
        125-151).
        """
        # Validation + dedup run on the HOST array, before the single
        # device push: the old to_jax-then-np.asarray order pulled the full
        # dataset back over the host↔device link twice per fit (~15 s at
        # 60k×784 on the axon tunnel, dwarfing the training loop).
        X_host, fmt = to_host(X)
        validate_2d(X_host)
        self._input_format_ = fmt

        if self.process_duplicates:
            X_unique, inverse = deduplicate(X_host)
            if inverse is not None:
                self.logger.info(
                    f"Detected {X_host.shape[0] - X_unique.shape[0]} duplicate samples, "
                    "performing DR on unique data."
                )
                emb_unique = self._fit_transform(jnp.asarray(X_unique), y=y)
                self.embedding_ = jnp.asarray(emb_unique)[inverse]
            else:
                self.embedding_ = self._fit_transform(jnp.asarray(X_host), y=y)
        else:
            self.embedding_ = self._fit_transform(jnp.asarray(X_host), y=y)

        self.is_fitted_ = True
        return restore_format(self.embedding_, fmt)

    def transform(self, X=None):
        """Return the training embedding, or transform new data if supported."""
        if not self.is_fitted_:
            raise ValueError(
                "This DRModule instance is not fitted yet. "
                "Call 'fit' or 'fit_transform' with some data first."
            )
        if X is not None:
            raise NotImplementedError(
                "Transforming new data is not implemented for this model."
            )
        return restore_format(self.embedding_, getattr(self, "_input_format_", "numpy"))

    @abstractmethod
    def _fit_transform(self, X: jnp.ndarray, y: Optional[Any] = None) -> jnp.ndarray:
        raise NotImplementedError

    # Large intermediates dropped by clear_memory; subclasses extend.
    _memory_attrs = (
        "affinity_in_",
        "NN_indices_",
        "opt_state_",
        "neg_exclusion_",
        "neg_valid_counts_",
        "_final_carry_",
    )

    def clear_memory(self):
        """Drop large fitted intermediates (affinities, optimizer state).

        (reference: torchdr/base.py:221-229 — non-persistent buffer cleanup.)
        """
        for name in self._memory_attrs:
            if hasattr(self, name):
                delattr(self, name)
