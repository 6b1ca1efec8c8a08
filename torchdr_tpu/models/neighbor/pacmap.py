"""PACMAP: Pairwise Controlled Manifold Approximation.

TPU-native PACMAP (reference: torchdr/neighbor_embedding/pacmap.py:
94-265). Three loss terms (near / mid-near / far) with the 3-phase weight
schedule expressed as functions of the step counter inside the compiled
loop. Mid-near pairs are re-sampled every step from the threaded PRNG (6
candidates, keep the 2nd closest in input space) — vectorized over the
``n_mid_near`` slots instead of the reference's Python loop
(pacmap.py:223-242).
"""

from __future__ import annotations

from typing import Dict, Optional, Union

import jax
import jax.numpy as jnp
from jax import lax

from ...affinity.knn_normalized import PACMAPAffinity
from ...ops.distance import pairwise_distances_indexed
from .base import NegativeSamplingNeighborEmbedding


class PACMAP(NegativeSamplingNeighborEmbedding):
    """PACMAP (Wang et al. 2021)."""

    def __init__(
        self,
        n_neighbors: int = 10,
        n_components: int = 2,
        lr: float = 1e0,
        optimizer: str = "Adam",
        optimizer_kwargs: Union[Dict, str, None] = None,
        scheduler: Optional[str] = None,
        scheduler_kwargs: Optional[Dict] = None,
        init: str = "pca",
        init_scaling: float = 1e-4,
        min_grad_norm: float = 1e-7,
        max_iter: int = 450,
        device: str = "auto",
        verbose: bool = False,
        random_state: Optional[int] = None,
        metric: str = "sqeuclidean",
        MN_ratio: float = 0.5,
        FP_ratio: float = 2.0,
        iter_per_phase: int = 100,
        check_interval: int = 50,
        discard_NNs: bool = False,
        knn_mode="exact",
        mn_resample_every: int = 1,
        **kwargs,
    ):
        self.n_neighbors = n_neighbors
        self.metric = metric
        self.knn_mode = knn_mode
        #: refresh the mid-near pair set every R steps (1 = every step,
        #: the maximum-variance-reduction schedule; the reference samples
        #: ONCE for the whole fit, i.e. R = ∞). The draw is ~26% of the
        #: 100k step, so R=8 recovers most of it at unchanged quality
        #: (docs/ROUND4_STATUS.md).
        self.mn_resample_every = int(mn_resample_every)
        if self.mn_resample_every < 1:
            raise ValueError(
                "[TorchDR-TPU] ERROR : mn_resample_every must be >= 1."
            )
        self.MN_ratio = MN_ratio
        self.FP_ratio = FP_ratio
        self.n_mid_near = max(int(MN_ratio * n_neighbors), 1)
        self.n_further = max(int(FP_ratio * n_neighbors), 1)
        self.iter_per_phase = iter_per_phase

        affinity_in = PACMAPAffinity(
            n_neighbors=n_neighbors,
            metric=metric,
            device=device,
            verbose=verbose,
            knn_mode=knn_mode,
        )
        super().__init__(
            affinity_in=affinity_in,
            n_components=n_components,
            optimizer=optimizer,
            optimizer_kwargs=optimizer_kwargs,
            min_grad_norm=min_grad_norm,
            max_iter=max_iter,
            lr=lr,
            scheduler=scheduler,
            scheduler_kwargs=scheduler_kwargs,
            init=init,
            init_scaling=init_scaling,
            device=device,
            verbose=verbose,
            random_state=random_state,
            check_interval=check_interval,
            n_negatives=self.n_further,
            discard_NNs=discard_NNs,
            **kwargs,
        )

    # --- 3-phase weights (reference: pacmap.py:181-196) ---

    def _weights(self, it):
        T = self.iter_per_phase
        itf = jnp.asarray(it, jnp.float32)
        w_NB = jnp.where(it < T, 2.0, jnp.where(it < 2 * T, 3.0, 1.0))
        w_MN = jnp.where(
            it < T, 1000.0 * (1.0 - itf / T) + 3.0 * itf / T, jnp.where(it < 2 * T, 3.0, 0.0)
        )
        w_FP = 1.0
        return w_NB, w_MN, w_FP

    def _build_consts(self, X):
        consts = super()._build_consts(X)
        consts.pop("P", None)  # PACMAP uses indices only
        consts["X"] = X  # kept for mid-near input-space distances
        return consts

    def _init_carry(self, consts):
        carry = super()._init_carry(consts)
        if self.mn_resample_every > 1:
            # refreshed at it=0 (0 % R == 0) before first use
            carry["mid_near"] = jnp.zeros(
                (consts["n"], self.n_mid_near), jnp.int32
            )
        return carry

    def _draw_mid_near(self, X, n, key):
        """Sample 6 candidates per slot, keep the 2nd closest in input
        space (the reference's mid-near rule, torchdr/neighbor_embedding/
        pacmap.py:223-242 — but drawn in-jit so pairs can refresh during
        the fit instead of being fixed once)."""
        cand = jax.random.randint(key, (self.n_mid_near, n, 6), 0, n - 1)
        self_idx = jnp.arange(n)[None, :, None]
        cand = cand + (cand >= self_idx).astype(cand.dtype)

        def second_closest(c):
            D = pairwise_distances_indexed(X, key_indices=c, metric=self.metric)
            _, idx2 = lax.top_k(-D, 2)
            return jnp.take_along_axis(c, idx2[:, 1:2], axis=1)[:, 0]

        return jax.vmap(second_closest)(cand).T.astype(jnp.int32)  # (n, nmn)

    def _attractive_loss(self, Z, consts, carry, it, key):
        w_NB, w_MN, _ = self._weights(it)
        NN = consts["NN"]
        Q_near = 1.0 + pairwise_distances_indexed(Z, key_indices=NN, metric="sqeuclidean")
        near_loss = w_NB * jnp.sum(Q_near / (10.0 + Q_near))

        # Mid-near pairs. The candidate draw + input-space distance pass is
        # ~26% of the 100k step (benchmarks/_pacmap100k.py ablation), so it
        # runs under lax.cond: only on refresh steps (it % R == 0) and
        # never in phase 3 where w_MN = 0 zeroes the term anyway.
        X = consts["X"]
        n = consts["n"]
        active = w_MN > 0
        R = self.mn_resample_every

        def _mid_term(mid_near):
            Q_mid = 1.0 + pairwise_distances_indexed(
                Z, key_indices=mid_near, metric="sqeuclidean"
            )
            return w_MN * jnp.sum(Q_mid / (1e4 + Q_mid))

        # The (n, n_mid_near) embedding gather ALSO runs under the cond:
        # in phase 3 (w_MN = 0, 250 of 450 steps) neither the draw nor the
        # Q_mid term does any work.
        if R == 1:
            mid_loss = lax.cond(
                active,
                lambda k: _mid_term(self._draw_mid_near(X, n, k)),
                lambda k: jnp.asarray(0.0, Z.dtype),
                key,
            )
        else:
            refresh = active & (jnp.mod(it, R) == 0)
            mid_near = lax.cond(
                refresh,
                lambda k: self._draw_mid_near(X, n, k),
                lambda k: carry["mid_near"],
                key,
            )
            carry = dict(carry, mid_near=mid_near)
            mid_loss = lax.cond(
                active,
                _mid_term,
                lambda mn: jnp.asarray(0.0, Z.dtype),
                mid_near,
            )
        return near_loss + mid_loss, carry

    def _repulsive_loss(self, Z, consts, carry, it, key):
        _, _, w_FP = self._weights(it)
        neg = self._sample_negatives(jax.random.fold_in(key, 1), consts)
        Q_far = 1.0 + pairwise_distances_indexed(Z, key_indices=neg, metric="sqeuclidean")
        return w_FP * jnp.sum(1.0 / (1.0 + Q_far)), carry
