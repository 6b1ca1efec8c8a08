"""Affinities normalized by nearest-neighbor distances.

TPU-native re-implementations of the reference's kNN-normalized affinities
(reference: torchdr/affinity/knn_normalized.py): SelfTuning, MAGIC, PHATE,
UMAP (fuzzy simplicial set), PACMAP. Root searches run as batched
``lax.while_loop`` bisection; the UMAP fuzzy-union symmetrization uses the
static-shape sort/merge pass in ops/sparse.py.
"""

from __future__ import annotations

import functools
from typing import Tuple, Union

import jax
import jax.numpy as jnp
from jax import lax
from jax.scipy.special import logsumexp

from ..ops.distance import pairwise_distances
from ..ops.reductions import matrix_power
from ..ops.root_search import binary_search
from ..ops.sparse import symmetrize_sparse
from ..utils.validation import check_neighbor_param
from .base import Affinity, LogAffinity, SparseAffinity


class SelfTuningAffinity(LogAffinity):
    r"""Self-tuning affinity (Zelnik-Manor & Perona 2004).

    exp(-C_ij / (σ_i σ_j)) with σ_i the K-th NN distance
    (reference: torchdr/affinity/knn_normalized.py:50-146).
    """

    def __init__(
        self,
        K: int = 7,
        normalization_dim: Union[int, Tuple[int, ...], None] = (0, 1),
        metric: str = "sqeuclidean",
        zero_diag: bool = True,
        device: str = "auto",
        verbose: bool = False,
        **kwargs,
    ):
        super().__init__(
            metric=metric, zero_diag=zero_diag, device=device, verbose=verbose, **kwargs
        )
        self.K = K
        self.normalization_dim = normalization_dim

    def _compute_log_affinity(self, X: jnp.ndarray):
        C = self._distance_matrix(X)
        kth = -lax.top_k(-C, self.K)[0][:, -1]
        self._store("sigma_", kth)
        log_aff = -C / (kth[:, None] * kth[None, :])
        if self.normalization_dim is not None:
            log_aff = log_aff - logsumexp(
                log_aff, axis=self.normalization_dim, keepdims=True
            )
        return log_aff


class MAGICAffinity(Affinity):
    r"""MAGIC affinity (van Dijk et al. 2018).

    exp(-C/σ_i), symmetrized by the mean, then row-normalized
    (reference: torchdr/affinity/knn_normalized.py:148-244).
    """

    def __init__(
        self,
        K: int = 7,
        metric: str = "sqeuclidean",
        zero_diag: bool = True,
        device: str = "auto",
        verbose: bool = False,
        **kwargs,
    ):
        super().__init__(
            metric=metric, zero_diag=zero_diag, device=device, verbose=verbose, **kwargs
        )
        self.K = K

    def _compute_affinity(self, X: jnp.ndarray):
        C = self._distance_matrix(X)
        kth = -lax.top_k(-C, self.K)[0][:, -1]
        self._store("sigma_", kth)
        P = jnp.exp(-C / kth[:, None])
        P = 0.5 * (P + P.T)
        return P / jnp.sum(P, axis=1, keepdims=True)


class PHATEAffinity(Affinity):
    r"""PHATE potential affinity (Moon et al. 2019).

    α-decay kernel → symmetrize → row-normalize → diffuse t steps →
    negative potential distance (reference: torchdr/affinity/
    knn_normalized.py:247-332). The reference upcasts to float64 for the
    potential distance; TPU f64 is emulated and slow, so we compute the
    potential log in f32 and form distances via the max-normalized form to
    avoid catastrophic cancellation.
    """

    def __init__(
        self,
        metric: str = "euclidean",
        device: str = "auto",
        verbose: bool = False,
        k: int = 5,
        alpha: float = 10.0,
        t: int = 5,
        **kwargs,
    ):
        super().__init__(
            metric=metric, zero_diag=False, device=device, verbose=verbose, **kwargs
        )
        self.k = k
        self.alpha = alpha
        self.t = t

    def _compute_affinity(self, X: jnp.ndarray):
        C = self._distance_matrix(X)
        kth = -lax.top_k(-C, self.k)[0][:, -1]
        self._store("sigma_", kth)
        P = jnp.exp(-((C / kth[:, None]) ** self.alpha))
        P = 0.5 * (P + P.T)
        P = P / jnp.sum(P, axis=1, keepdims=True)
        P = matrix_power(P, self.t)
        # potential distances on -log P; f64 in the reference, compensated
        # f32 here (centering each column before the norm-expansion matmul
        # removes the large common mode that causes cancellation).
        logP = -jnp.log(jnp.clip(P, 1e-12, None))
        logP = logP - jnp.mean(logP, axis=0, keepdims=True)
        D, _ = pairwise_distances(logP, metric="euclidean")
        return -D


class UMAPAffinity(SparseAffinity):
    r"""UMAP fuzzy simplicial set affinity (McInnes et al. 2018).

    Bisection on σ_i s.t. Σ_j exp(-(C_ij - ρ_i)/σ_i) = log2(n_neighbors)
    with ρ_i the min distance, then fuzzy union P + Pᵀ - P∘Pᵀ
    (reference: torchdr/affinity/knn_normalized.py:335-497).
    """

    def __init__(
        self,
        n_neighbors: float = 30,
        max_iter: int = 1000,
        sparsity: bool = True,
        metric: str = "sqeuclidean",
        zero_diag: bool = True,
        device: str = "auto",
        verbose: bool = False,
        symmetrize: bool = True,
        max_degree: int | None = None,
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
        self.n_neighbors = n_neighbors
        self.max_iter = max_iter
        self.symmetrize = symmetrize
        # Hub points in high-d kNN graphs can have in-degree in the
        # thousands; an uncapped fuzzy-union width is O(n·max_in_degree)
        # memory (overflows/OOMs at 1M+). The cap keeps the STRONGEST
        # edges per row (value-priority packing in symmetrize_sparse).
        self.max_degree = max_degree

    def _compute_sparse_affinity(self, X, return_indices: bool = True, **kwargs):
        n = X.shape[0]
        n_neighbors = check_neighbor_param(int(self.n_neighbors), n, logger=self.logger)

        if self.sparsity:
            self.logger.info(f"Sparsity mode: computing {n_neighbors} nearest neighbors.")
            C, indices = self._distance_matrix(X, k=n_neighbors, return_indices=True)
        else:
            C, indices = self._distance_matrix(X, return_indices=True)

        P, rho, eps = _umap_calibrate(C, float(n_neighbors), int(self.max_iter))
        self._store("rho_", rho)
        self._store("eps_", eps)

        if self.symmetrize:
            if self.sparsity:
                k_out = None
                if self.max_degree is not None:
                    k_out = max(8, -(-int(self.max_degree) // 8) * 8)
                mesh = self._active_mesh()
                if mesh is not None:
                    # explicit all_to_all edge exchange: each chip merges the
                    # transposed edges for the rows it owns (the analog of
                    # the reference's distributed_symmetrize_sparse,
                    # torchdr/utils/sparse.py:209-343)
                    from ..parallel.sparse import distributed_symmetrize_sparse

                    P, indices = distributed_symmetrize_sparse(
                        P, indices, mesh, mode="sum_minus_prod", k_out=k_out
                    )
                else:
                    P, indices = symmetrize_sparse(
                        P, indices, mode="sum_minus_prod", k_out=k_out
                    )
            else:
                P = P + P.T - P * P.T

        return (P, indices) if return_indices else P


@functools.partial(jax.jit, static_argnames=("max_iter",))
def _umap_calibrate(C: jnp.ndarray, n_neighbors: float, max_iter: int):
    """Row-wise bisection for the UMAP bandwidth; returns (P, rho, eps)."""
    n = C.shape[0]
    rho = jnp.min(C, axis=1)
    target = jnp.log2(jnp.asarray(n_neighbors, C.dtype))

    def marginal_gap(eps):
        log_marg = logsumexp(-(C - rho[:, None]) / eps[:, None], axis=1)
        return jnp.exp(log_marg) - target

    eps = binary_search(marginal_gap, n, max_iter=max_iter, dtype=C.dtype)
    P = jnp.exp(-(C - rho[:, None]) / eps[:, None])
    return P, rho, eps


class PACMAPAffinity(SparseAffinity):
    r"""PACMAP neighbor selection (Wang et al. 2021).

    kNN with k = n_neighbors + 50, distances scaled by ρ_i ρ_j (mean of the
    4th-6th NN distances), re-select the top n_neighbors. Returns indices
    only (reference: torchdr/affinity/knn_normalized.py:499-611).
    """

    def __init__(
        self,
        n_neighbors: int = 10,
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
            sparsity=True,
            **kwargs,
        )
        self.n_neighbors = n_neighbors

    def _compute_sparse_affinity(self, X, return_indices: bool = True, **kwargs):
        n = X.shape[0]
        k = check_neighbor_param(min(self.n_neighbors + 50, n - 1), n, logger=self.logger)
        C, temp_indices = self._distance_matrix(X, k=k, return_indices=True)

        sq_nn = -lax.top_k(-C, min(6, k))[0]
        rho = jnp.mean(jnp.sqrt(sq_nn)[:, 3:6], axis=1)
        self._store("rho_", rho)

        scaled = C / (rho[:, None] * rho[temp_indices])
        _, local = lax.top_k(-scaled, self.n_neighbors)
        final_indices = jnp.take_along_axis(temp_indices, local, axis=1)

        if return_indices:
            return None, final_indices
        return scaled
