"""t-distributed Stochastic Neighbor Embedding.

TPU-native TSNE (reference: torchdr/neighbor_embedding/tsne.py:16-180).
Input affinity: entropic (perplexity-calibrated, sparse kNN). Output kernel:
Student-t. Attraction is a cross-entropy over the kNN edges (gathered
indexed distances); the exact O(n²) repulsion ``log Σ_ij (1+d²)⁻¹`` runs
through the blockwise streaming logsumexp with custom VJP
(ops/reduce.py) — the KeOps-replacement path — so no n×n matrix is ever
materialized, in either the forward or backward pass.
"""

from __future__ import annotations

from typing import Dict, Optional, Union

import jax.numpy as jnp
from jax.scipy.special import logsumexp

from ...affinity.entropic import EntropicAffinity
from ...ops.distance import pairwise_distances_indexed
from ...ops.reduce import (
    pairwise_logkernel_rowlse,
    pairwise_logkernel_rowlse_sharded,
)
from ...ops.reductions import cross_entropy_loss
from .base import NeighborEmbedding


def _rowlse_maybe_sharded(model, Z, kernel):
    """Row-lse of the output kernel; row-sharded over the fit mesh when one
    is active (the analog of the reference's per-rank row chunks + loss /
    world_size, torchdr/neighbor_embedding/tsne.py:172-180)."""
    mesh = getattr(model, "_fit_mesh_", None)
    if mesh is not None:
        return pairwise_logkernel_rowlse_sharded(
            Z, mesh, kernel, True, model.block_size
        )
    return pairwise_logkernel_rowlse(Z, kernel, True, model.block_size)


class TSNE(NeighborEmbedding):
    """t-SNE (van der Maaten & Hinton 2008).

    Parameters follow the reference defaults (torchdr/neighbor_embedding/
    tsne.py:94-160): lr='auto', SGD with auto momentum, early exaggeration
    12.0 for 250 iterations.
    """

    def __init__(
        self,
        perplexity: float = 30,
        n_components: int = 2,
        lr: Union[float, str] = "auto",
        optimizer: str = "SGD",
        optimizer_kwargs: Union[Dict, str, None] = "auto",
        scheduler: Optional[str] = None,
        scheduler_kwargs: Union[Dict, str, None] = None,
        init: str = "pca",
        init_scaling: float = 1e-4,
        min_grad_norm: float = 1e-7,
        max_iter: int = 2000,
        device: str = "auto",
        verbose: bool = False,
        random_state: Optional[int] = None,
        early_exaggeration_coeff: float = 12.0,
        early_exaggeration_iter: int = 250,
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
        self.metric = metric
        self.max_iter_affinity = max_iter_affinity
        self.sparsity = sparsity
        self.block_size = block_size

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
            early_exaggeration_coeff=early_exaggeration_coeff,
            early_exaggeration_iter=early_exaggeration_iter,
            check_interval=check_interval,
            **kwargs,
        )

    def _attractive_loss(self, Z, consts, carry, it, key):
        """CE on the kNN student log-kernel (reference: tsne.py:162-170)."""
        D = pairwise_distances_indexed(Z, key_indices=consts["NN"], metric="sqeuclidean")
        log_Q = -jnp.log1p(D)
        return cross_entropy_loss(consts["P"], log_Q, log=True), carry

    def _repulsive_loss(self, Z, consts, carry, it, key):
        """Global logsumexp over the full pairwise student kernel
        (reference: tsne.py:172-180) — blockwise, O(block·n) memory,
        row-sharded over the mesh when fitting distributed."""
        row_lse = _rowlse_maybe_sharded(self, Z, "student")
        return logsumexp(row_lse), carry


class SNE(NeighborEmbedding):
    """Stochastic Neighbor Embedding (Hinton & Roweis 2002).

    Gaussian output kernel with row-wise logsumexp repulsion
    (reference: torchdr/neighbor_embedding/sne.py:16-179).
    """

    def __init__(
        self,
        perplexity: float = 30,
        n_components: int = 2,
        lr: Union[float, str] = "auto",
        optimizer: str = "SGD",
        optimizer_kwargs: Union[Dict, str, None] = "auto",
        scheduler: Optional[str] = None,
        scheduler_kwargs: Union[Dict, str, None] = None,
        init: str = "pca",
        init_scaling: float = 1e-4,
        min_grad_norm: float = 1e-7,
        max_iter: int = 2000,
        device: str = "auto",
        verbose: bool = False,
        random_state: Optional[int] = None,
        early_exaggeration_coeff: Optional[float] = None,
        early_exaggeration_iter: Optional[int] = None,
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
        self.metric = metric
        self.max_iter_affinity = max_iter_affinity
        self.sparsity = sparsity
        self.block_size = block_size

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
            early_exaggeration_coeff=early_exaggeration_coeff,
            early_exaggeration_iter=early_exaggeration_iter,
            check_interval=check_interval,
            **kwargs,
        )

    def _attractive_loss(self, Z, consts, carry, it, key):
        D = pairwise_distances_indexed(Z, key_indices=consts["NN"], metric="sqeuclidean")
        return cross_entropy_loss(consts["P"], -D, log=True), carry

    def _repulsive_loss(self, Z, consts, carry, it, key):
        row_lse = _rowlse_maybe_sharded(self, Z, "gaussian")
        return jnp.sum(row_lse) / consts["n"], carry
