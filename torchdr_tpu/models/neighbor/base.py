"""Base classes for neighbor embedding methods.

TPU-native counterpart of the reference's neighbor-embedding mechanics
(reference: torchdr/neighbor_embedding/base.py:20-649). Loss decomposition
(attraction + repulsion), early exaggeration, auto learning rate and the
SGD momentum schedule all live in the compiled loop built by
:class:`~torchdr_tpu.affinity_matcher.AffinityMatcher`.

Negative sampling is functional: instead of registering fresh
``neg_indices_`` buffers each step (reference: torchdr/neighbor_embedding/
base.py:617-649), negatives are drawn *inside* the jitted step from the
threaded PRNG key with the same sorted-exclusion + searchsorted shift
trick — zero host round-trips.
"""

from __future__ import annotations

from typing import Dict, Optional, Union

import jax
import jax.numpy as jnp
import numpy as np

from ...affinity.base import Affinity
from ...affinity_matcher import AffinityMatcher


class NeighborEmbedding(AffinityMatcher):
    r"""Attraction/repulsion neighbor-embedding base.

    loss = ee_coeff(it) · attractive + repulsion_strength · repulsive
    (reference: torchdr/neighbor_embedding/base.py:223-242).
    """

    def __init__(
        self,
        affinity_in: Union[Affinity, str],
        affinity_out: Optional[Affinity] = None,
        kwargs_affinity_out: Optional[Dict] = None,
        n_components: int = 2,
        lr: Union[float, str] = 1e0,
        optimizer: str = "SGD",
        optimizer_kwargs: Union[Dict, str, None] = "auto",
        scheduler: Optional[str] = None,
        scheduler_kwargs: Union[Dict, str, None] = "auto",
        min_grad_norm: float = 1e-7,
        max_iter: int = 2000,
        init: Union[str, np.ndarray] = "pca",
        init_scaling: float = 1e-4,
        device: str = "auto",
        verbose: bool = False,
        random_state: Optional[int] = None,
        early_exaggeration_coeff: Optional[float] = None,
        early_exaggeration_iter: Optional[int] = None,
        repulsion_strength: float = 1.0,
        check_interval: int = 50,
        **kwargs,
    ):
        super().__init__(
            affinity_in=affinity_in,
            affinity_out=affinity_out,
            kwargs_affinity_out=kwargs_affinity_out,
            n_components=n_components,
            optimizer=optimizer,
            optimizer_kwargs=optimizer_kwargs,
            lr=lr,
            scheduler=scheduler,
            scheduler_kwargs=scheduler_kwargs,
            min_grad_norm=min_grad_norm,
            max_iter=max_iter,
            init=init,
            init_scaling=init_scaling,
            device=device,
            verbose=verbose,
            random_state=random_state,
            check_interval=check_interval,
            **kwargs,
        )
        self.early_exaggeration_coeff = early_exaggeration_coeff
        self.early_exaggeration_iter = early_exaggeration_iter
        self.repulsion_strength = repulsion_strength
        self._ee_coeff = float(early_exaggeration_coeff or 1.0)
        self._ee_iter = int(early_exaggeration_iter or 0)

    # --- validation (reference: torchdr/neighbor_embedding/base.py:258-269) ---

    def _check_n_neighbors(self, n: int):
        for param_name in ("perplexity", "n_neighbors"):
            if hasattr(self, param_name):
                value = getattr(self, param_name)
                if value is not None and n <= value:
                    raise ValueError(
                        f"[TorchDR-TPU] ERROR : Number of samples is smaller than "
                        f"{param_name} ({n} <= {value})."
                    )
        return self

    def _fit_transform(self, X: jnp.ndarray, y=None) -> jnp.ndarray:
        self._check_n_neighbors(X.shape[0])
        return super()._fit_transform(X, y)

    # --- loss decomposition ---

    def _loss(self, Z, consts, carry, it, key, ee_coeff):
        attr, carry = self._attractive_loss(Z, consts, carry, it, key)
        rep, carry = self._repulsive_loss(Z, consts, carry, it, key)
        return ee_coeff * attr + self.repulsion_strength * rep, carry

    def _gradients(self, Z, consts, carry, it, key, ee_coeff):
        g_attr, carry = self._attractive_gradients(Z, consts, carry, it, key)
        g_rep, carry = self._repulsive_gradients(Z, consts, carry, it, key)
        return ee_coeff * g_attr + self.repulsion_strength * g_rep, carry

    def _attractive_loss(self, Z, consts, carry, it, key):
        raise NotImplementedError(
            "[TorchDR-TPU] ERROR : _attractive_loss method must be implemented."
        )

    def _repulsive_loss(self, Z, consts, carry, it, key):
        raise NotImplementedError(
            "[TorchDR-TPU] ERROR : _repulsive_loss method must be implemented."
        )

    def _attractive_gradients(self, Z, consts, carry, it, key):
        raise NotImplementedError(
            "[TorchDR-TPU] ERROR : _attractive_gradients must be implemented "
            "when _use_closed_form_gradients is True."
        )

    def _repulsive_gradients(self, Z, consts, carry, it, key):
        raise NotImplementedError(
            "[TorchDR-TPU] ERROR : _repulsive_gradients must be implemented "
            "when _use_closed_form_gradients is True."
        )


class NegativeSamplingNeighborEmbedding(NeighborEmbedding):
    r"""Neighbor embedding with O(n) repulsion via per-step negative sampling.

    ``n_negatives`` uniform draws per row per step, excluding self (and
    optionally the NNs) via the sorted-exclusion + searchsorted shift
    (reference: torchdr/neighbor_embedding/base.py:426-649).
    """

    def __init__(
        self,
        affinity_in: Union[Affinity, str],
        n_negatives: int = 5,
        discard_NNs: bool = False,
        shared_negatives: bool = True,
        n_shared_negatives: int | None = None,
        **kwargs,
    ):
        super().__init__(affinity_in=affinity_in, **kwargs)
        self.n_negatives = n_negatives
        self.discard_NNs = discard_NNs
        self.shared_negatives = shared_negatives
        self.n_shared_negatives = n_shared_negatives

    def on_affinity_computation_end(self):
        super().on_affinity_computation_end()
        n = self.n_samples_in_
        self_idx = jnp.arange(n)[:, None]
        if self.discard_NNs:
            if self.NN_indices_ is None:
                self.logger.warning(
                    "NN_indices_ not found. Cannot discard NNs from negative sampling."
                )
                exclude = self_idx
            else:
                # NN rows may carry -1 padding (post-symmetrization); replace
                # pads with distinct out-of-range sentinels so they sort last
                # and never shift a draw.
                nn = self.NN_indices_
                sentinel = n + jnp.arange(nn.shape[1])[None, :]
                nn = jnp.where(nn >= 0, nn, sentinel)
                exclude = jnp.concatenate([self_idx, nn], axis=1)
        else:
            exclude = self_idx
        self.neg_exclusion_ = jnp.sort(exclude, axis=1)
        self.neg_valid_counts_ = jnp.sum(self.neg_exclusion_ < n, axis=1)

        n_possible = n - int(jnp.max(self.neg_valid_counts_))
        if self.n_negatives > n_possible:
            raise ValueError(
                f"[TorchDR-TPU] ERROR : requested {self.n_negatives} negatives but "
                f"only {n_possible} available."
            )

    def _build_consts(self, X):
        consts = super()._build_consts(X)
        consts["neg_exclusion"] = self.neg_exclusion_
        consts["neg_valid_counts"] = self.neg_valid_counts_
        return consts

    # --- shared negatives: the TPU-shaped repulsion layout ---
    #
    # Per-point negative sets make the hot loop a storm of tiny random
    # gathers (measured: the round-1 UMAP bottleneck). Instead, all points
    # can repel against ONE per-step uniform sample of S ≫ n_negatives
    # points, each contribution weighted by n_negatives/S — the same
    # expected force with lower variance, computed as dense MXU matmuls.

    def _shared_negative_count(self, n: int) -> int:
        if self.n_shared_negatives is not None:
            return int(self.n_shared_negatives)
        # keep the (n, S) distance block within a sane HBM envelope
        return 2048 if n <= 300_000 else (1024 if n <= 1_000_000 else 512)

    def _shared_negative_sqdists(self, Z, consts, key):
        """(D, valid) for one shared uniform negative sample.

        D is the (n, S) squared-euclidean block (exact f32 gram);
        ``valid`` masks self-collisions.
        """
        from jax import lax as _lax

        from ...ops.metrics import sq_dists_from_gram

        n = consts["n"]
        S = self._shared_negative_count(int(n))
        neg = jax.random.randint(key, (S,), 0, n)
        Zneg = Z[neg]
        gram = jnp.matmul(
            Z, Zneg.T,
            preferred_element_type=jnp.float32,
            precision=_lax.Precision.HIGHEST,  # d_out is tiny; exactness free
        )
        D = sq_dists_from_gram(
            jnp.sum(Z * Z, axis=-1), jnp.sum(Zneg * Zneg, axis=-1), gram
        )
        valid = neg[None, :] != jnp.arange(Z.shape[0])[:, None]
        return D, valid, Zneg

    def _sample_negatives(self, key, consts) -> jnp.ndarray:
        """Draw (n, n_negatives) indices uniform over non-excluded columns.

        Inside-jit equivalent of the reference's per-step buffer refresh
        (torchdr/neighbor_embedding/base.py:617-649): draw uniform over the
        per-row count of allowed columns, then shift past the sorted
        exclusions (rows may have different exclusion counts after padded
        symmetrization, hence the per-row range).
        """
        exclusion = consts["neg_exclusion"]
        counts = consts["neg_valid_counts"]
        n = consts["n"]
        u = jax.random.uniform(key, (exclusion.shape[0], self.n_negatives))
        draws = jnp.floor(u * (n - counts)[:, None]).astype(jnp.int32)
        if exclusion.shape[1] == 1:
            return draws + (draws >= exclusion).astype(draws.dtype)
        shifts = jax.vmap(
            lambda ex, d: jnp.searchsorted(ex, d, side="right")
        )(exclusion, draws)
        return draws + shifts.astype(draws.dtype)
