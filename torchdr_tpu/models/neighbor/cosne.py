"""CO-SNE: hyperbolic SNE on the Poincaré ball.

TPU-native COSNE (reference: torchdr/neighbor_embedding/cosne.py:16-193).
Cauchy kernel in hyperbolic space, norm-preservation term, optimized with
the functional RiemannianAdam (expmap retraction + momentum transport)
inside the compiled loop. The O(n²) hyperbolic repulsion streams block-wise
with per-tile rematerialization (ops/reduce.py) — bounded memory at any n.
"""

from __future__ import annotations

from typing import Dict, Optional, Union

import jax.numpy as jnp
from jax.scipy.special import logsumexp

from ...affinity.entropic import EntropicAffinity
from ...ops.distance import pairwise_distances_indexed
from ...ops.reduce import pairwise_logkernel_rowlse_autodiff
from ...ops.reductions import cross_entropy_loss
from .base import NeighborEmbedding


class COSNE(NeighborEmbedding):
    """CO-SNE (Guo et al. 2022).

    Uses an entropic input affinity and the hyperbolic Cauchy output kernel
    Q_ij = γ / (d_H² + γ²), plus a distance-to-origin preservation term
    weighted by ``learning_rate_for_h_loss``.
    """

    def __init__(
        self,
        perplexity: float = 30,
        learning_rate_for_h_loss: float = 1,
        gamma: float = 2,
        n_components: int = 2,
        lr: Union[float, str] = "auto",
        optimizer_kwargs: Union[Dict, str, None] = None,
        scheduler: Optional[str] = None,
        scheduler_kwargs: Optional[Dict] = None,
        # default differs from the reference ("hyperbolic" random,
        # torchdr/neighbor_embedding/cosne.py:118): random init in
        # hyperbolic space separates mass across branches gradient flow
        # cannot merge back — measured silhouette ≈ 0 at 10k-50k vs
        # 0.86-1.00 from the PCA-expmap init at otherwise identical
        # settings (round-3 sweep, benchmarks/_cosne_r3_tune.py)
        init: str = "pca",
        init_scaling: float = 0.5,
        min_grad_norm: float = 1e-7,
        max_iter: int = 2000,
        device: str = "auto",
        verbose: bool = False,
        random_state: Optional[int] = None,
        max_iter_affinity: int = 100,
        metric: str = "sqeuclidean",
        sparsity: bool = True,
        check_interval: int = 50,
        knn_mode: str = "exact",
        knn_precision: str = "highest",
        block_size: int = 1024,
        **kwargs,
    ):
        self.perplexity = perplexity
        self.learning_rate_for_h_loss = learning_rate_for_h_loss
        self.gamma = gamma
        self.block_size = block_size
        self.metric = metric
        self.max_iter_affinity = max_iter_affinity
        self.sparsity = sparsity

        self.knn_mode = knn_mode
        self.knn_precision = knn_precision

        affinity_in = EntropicAffinity(
            perplexity=perplexity,
            metric=metric,
            max_iter=max_iter_affinity,
            device=device,
            verbose=verbose,
            sparsity=sparsity,
            knn_mode=knn_mode,
            knn_precision=knn_precision,
        )
        super().__init__(
            affinity_in=affinity_in,
            affinity_out=None,
            n_components=n_components,
            optimizer="RiemannianAdam",
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
            **kwargs,
        )

    def _lr_plan(self):
        # 'auto' lr for RiemannianAdam: the sklearn SGD rule would explode an
        # Adam-style step; use the reference's warned fallback of 1.0
        # (reference: torchdr/affinity_matcher.py:585-595).
        if self.lr == "auto":
            return 1.0, 1.0
        return float(self.lr), float(self.lr)

    def _init_embedding(self, X):
        # init="pca": project the PCA layout into the Poincaré ball through
        # the origin exponential map (tangent-space coordinates scaled to
        # std init_scaling). A cluster-shaped start matters much more in
        # hyperbolic space than in R²: volume grows exponentially with
        # radius, so a random init separates mass across branches that
        # gradient flow cannot merge back (measured: silhouette ≈ 0 at 50k
        # from random init vs > 0.3 from PCA init, round-3 sweep).
        if isinstance(self.init, str) and self.init == "pca":
            from ...models.spectral.pca import PCA
            from ...utils.manifold import poincare_expmap0

            emb = PCA(n_components=self.n_components)._fit_transform(X)
            std0 = jnp.std(emb[:, 0])
            emb = self.init_scaling * emb / jnp.where(std0 > 0, std0, 1.0)
            return poincare_expmap0(emb)
        return super()._init_embedding(X)

    def _build_consts(self, X):
        consts = super()._build_consts(X)
        # input-norm preservation targets (reference: cosne.py:163-165)
        consts["X_norm"] = jnp.sum(X * X, axis=-1)
        return consts

    def _attractive_loss(self, Z, consts, carry, it, key):
        D = pairwise_distances_indexed(Z, key_indices=consts["NN"], metric="sqhyperbolic")
        log_Q = jnp.log(self.gamma / (D + self.gamma**2))
        return cross_entropy_loss(consts["P"], log_Q, log=True), carry

    def _repulsive_loss(self, Z, consts, carry, it, key):
        # blockwise hyperbolic Cauchy repulsion: O(block·n) memory in both
        # passes via per-tile rematerialization (reference streams this
        # through KeOps, torchdr/distance/keops.py:17-105)
        gamma = float(self.gamma)
        row_lse = pairwise_logkernel_rowlse_autodiff(
            Z,
            lambda D: jnp.log(gamma) - jnp.log(D + gamma**2),
            metric="sqhyperbolic",
            exclude_diag=True,
            block_size=self.block_size,
        )
        rep = logsumexp(row_lse)
        # hyperbolic distance-to-origin should match the input sq-norm
        Y_norm = jnp.sum(Z * Z, axis=-1)
        # same f32 arccosh-at-1 clamp as ops/metrics.py
        Y_norm = jnp.arccosh(jnp.maximum(1 + 2 * (Y_norm / (1 - Y_norm)), 1 + 1e-7)) ** 2
        distance_term = jnp.mean((consts["X_norm"] - Y_norm) ** 2)
        return rep + self.learning_rate_for_h_loss * distance_term, carry
