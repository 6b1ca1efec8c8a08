"""LargeVis and InfoTSNE — negative-sampling estimators.

(reference: torchdr/neighbor_embedding/largevis.py:16-201,
torchdr/neighbor_embedding/infotsne.py:16-197)
"""

from __future__ import annotations

from typing import Dict, Optional, Union

import jax.numpy as jnp
from jax.scipy.special import logsumexp

from ...affinity.entropic import EntropicAffinity
from ...ops.distance import pairwise_distances_indexed
from ...ops.reductions import cross_entropy_loss
from .base import NegativeSamplingNeighborEmbedding


class _EntropicNegativeSampling(NegativeSamplingNeighborEmbedding):
    """Shared EntropicAffinity + negative-sampling scaffold."""

    def __init__(
        self,
        perplexity: float = 30,
        n_components: int = 2,
        lr: Union[float, str] = "auto",
        optimizer: str = "SGD",
        optimizer_kwargs: Union[Dict, str, None] = "auto",
        scheduler: Optional[str] = None,
        scheduler_kwargs: Union[Dict, str, None] = "auto",
        init: str = "pca",
        init_scaling: float = 1e-4,
        min_grad_norm: float = 1e-7,
        max_iter: int = 1000,
        device: str = "auto",
        verbose: bool = False,
        random_state: Optional[int] = None,
        max_iter_affinity: int = 100,
        metric: str = "sqeuclidean",
        n_negatives: int = 5,
        sparsity: bool = True,
        early_exaggeration_coeff: Optional[float] = None,
        early_exaggeration_iter: Optional[int] = None,
        check_interval: int = 50,
        knn_mode: str = "exact",
        knn_precision: str = "highest",
        discard_NNs: bool = False,
        **kwargs,
    ):
        self.perplexity = perplexity
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
            early_exaggeration_coeff=early_exaggeration_coeff,
            early_exaggeration_iter=early_exaggeration_iter,
            n_negatives=n_negatives,
            check_interval=check_interval,
            discard_NNs=discard_NNs,
            **kwargs,
        )


class LargeVis(_EntropicNegativeSampling):
    """LargeVis (Tang et al. 2016).

    Student attraction + Bernoulli repulsion -Σ log(1-Q) on negatives
    (reference: torchdr/neighbor_embedding/largevis.py:181-201). Default
    scheduler LinearLR as in the reference.
    """

    def __init__(self, *args, scheduler: Optional[str] = "LinearLR", **kwargs):
        super().__init__(*args, scheduler=scheduler, **kwargs)

    def _attractive_loss(self, Z, consts, carry, it, key):
        D = pairwise_distances_indexed(Z, key_indices=consts["NN"], metric="sqeuclidean")
        Q = 1.0 / (1.0 + D)
        Q = Q / (Q + 1.0)
        return cross_entropy_loss(consts["P"], Q), carry

    def _repulsive_loss(self, Z, consts, carry, it, key):
        if self.shared_negatives:
            # shared uniform sample, rescaled to n_negatives per point —
            # same expected loss, MXU matmuls instead of per-point gathers
            D, valid, _ = self._shared_negative_sqdists(Z, consts, key)
            Q = 1.0 / (1.0 + D)
            Q = Q / (Q + 1.0)
            terms = jnp.where(valid, jnp.log(1.0 - Q), 0.0)
            scale = self.n_negatives / D.shape[1]
            return -scale * jnp.sum(terms) / consts["n"], carry
        neg = self._sample_negatives(key, consts)
        D = pairwise_distances_indexed(Z, key_indices=neg, metric="sqeuclidean")
        Q = 1.0 / (1.0 + D)
        Q = Q / (Q + 1.0)
        return -jnp.sum(jnp.log(1.0 - Q)) / consts["n"], carry


class InfoTSNE(_EntropicNegativeSampling):
    """InfoTSNE (Damrich et al. 2023): InfoNCE repulsion over negatives only.

    (reference: torchdr/neighbor_embedding/infotsne.py:179-197; defaults
    n_negatives=300, early exaggeration 12/250.)
    """

    def __init__(
        self,
        perplexity: float = 30,
        n_negatives: int = 300,
        early_exaggeration_coeff: Optional[float] = 12,
        early_exaggeration_iter: Optional[int] = 250,
        **kwargs,
    ):
        super().__init__(
            perplexity=perplexity,
            n_negatives=n_negatives,
            early_exaggeration_coeff=early_exaggeration_coeff,
            early_exaggeration_iter=early_exaggeration_iter,
            **kwargs,
        )

    def _attractive_loss(self, Z, consts, carry, it, key):
        D = pairwise_distances_indexed(Z, key_indices=consts["NN"], metric="sqeuclidean")
        log_Q = -jnp.log1p(D)
        return cross_entropy_loss(consts["P"], log_Q, log=True), carry

    def _repulsive_loss(self, Z, consts, carry, it, key):
        if self.shared_negatives:
            # InfoNCE over a shared negative set; the log(n_negatives/S)
            # shift keeps the loss on the reference's scale and leaves the
            # gradient (a softmax over negatives) unchanged
            D, valid, _ = self._shared_negative_sqdists(Z, consts, key)
            log_Q = jnp.where(valid, -jnp.log1p(D), -jnp.inf)
            shift = jnp.log(self.n_negatives / D.shape[1])
            return jnp.sum(logsumexp(log_Q, axis=1) + shift) / consts["n"], carry
        neg = self._sample_negatives(key, consts)
        D = pairwise_distances_indexed(Z, key_indices=neg, metric="sqeuclidean")
        log_Q = -jnp.log1p(D)
        return jnp.sum(logsumexp(log_Q, axis=1)) / consts["n"], carry
