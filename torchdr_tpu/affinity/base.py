"""Affinity base hierarchy.

TPU-native re-design of the reference hierarchy
(reference: torchdr/affinity/base.py:30-570):

- :class:`Affinity` — dense ``(n, n)`` affinity in probability domain.
- :class:`LogAffinity` — dense, computed in log domain.
- :class:`SparseAffinity` — rectangular padded ``(n, k)`` values + indices.
- :class:`SparseLogAffinity` — sparse, computed in log domain.

There is no backend parameter: the distance layer is a single XLA/Pallas
implementation (ops/distance.py). ``zero_diag`` excludes the self-distance
by masking it to ``MASK_VALUE`` (reference adds 1e12 on the diagonal,
torchdr/distance/torch.py:110-116).
"""

from __future__ import annotations

from abc import ABC
from typing import Optional, Tuple, Union

import jax.numpy as jnp

from ..base import BaseEstimator
from ..ops.distance import knn_graph, pairwise_distances
from ..utils.logger import get_logger
from ..utils.wrappers import to_jax


class Affinity(BaseEstimator, ABC):
    """Base class for dense affinity matrices."""

    def __init__(
        self,
        metric: str = "sqeuclidean",
        zero_diag: bool = True,
        device: str = "auto",
        verbose: bool = False,
        random_state: Optional[int] = None,
        knn_mode: str = "exact",
        knn_precision: str = "highest",
        mesh=None,
        **kwargs,
    ):
        self.metric = metric
        self.zero_diag = bool(zero_diag)
        self.device = device if device is not None else "auto"
        self.verbose = bool(verbose)
        self.random_state = random_state
        # Device mesh for the build phase: when set (directly or injected by
        # the estimator via _set_fit_mesh), the kNN graph is computed with
        # row-sharded queries over the mesh — the analog of the reference's
        # per-rank chunked build (torchdr/affinity/base.py:310-391).
        self.mesh = mesh
        # kNN tier (ops/distance.knn_graph): mode 'exact'|'approx',
        # precision 'highest'|'high'|'default' — the performance levers of
        # the graph-construction phase. A KnnConfig bundles them (and the
        # IVF-tier knobs: nprobe, n_clusters, budget, merge, ivf_block).
        from ..ops.knn_config import KnnConfig

        if isinstance(knn_mode, KnnConfig):
            cfg = knn_mode
        else:
            cfg = KnnConfig(mode=knn_mode, precision=knn_precision)
        self._knn_cfg = cfg
        self.knn_mode = cfg.mode
        self.knn_precision = cfg.precision
        self.knn_recall_target = cfg.recall_target
        self.knn_block_size = cfg.block_size
        self.knn_nprobe = cfg.nprobe
        self.knn_n_clusters = cfg.n_clusters
        self.logger = get_logger(type(self).__name__, self.verbose)

    # --- mesh plumbing (estimators inject their fit mesh here) ---

    def _set_fit_mesh(self, mesh) -> None:
        """Called by estimators so the build phase shards over their mesh."""
        self._fit_mesh = mesh

    def _active_mesh(self):
        m = getattr(self, "_fit_mesh", None)
        return m if m is not None else self.mesh

    def __call__(self, X, **kwargs):
        X, _ = to_jax(X)
        return self._compute_affinity(X, **kwargs)

    def _store(self, name: str, value) -> None:
        """Store a fitted attribute unless tracing (inside jit)."""
        import jax

        if not isinstance(value, jax.core.Tracer):
            setattr(self, name, value)

    def _compute_affinity(self, X: jnp.ndarray, **kwargs):
        raise NotImplementedError(
            "[TorchDR-TPU] ERROR : `_compute_affinity` method is not implemented."
        )

    def _distance_matrix(
        self, X: jnp.ndarray, k: Optional[int] = None, return_indices: bool = False
    ):
        """Pairwise distances; ``(n, k)`` kNN form when ``k`` is given."""
        if self.metric in ("sqeuclidean", "euclidean"):
            # Distances are translation invariant, but the norms+gram form
            # ‖x‖²+‖y‖²−2⟨x,y⟩ cancels catastrophically in f32 when the data
            # sits far from the origin (measured: a +100 shift perturbs SEA
            # affinities by ~90% relative). Centering restores conditioning
            # exactly; the reference inherits the flaw (torch cdist-form).
            X = X - jnp.mean(X, axis=0, keepdims=True)
        mesh = self._active_mesh()
        if k is not None:
            if self.knn_mode == "ivf":
                if self.metric not in ("sqeuclidean", "euclidean"):
                    raise ValueError(
                        "[TorchDR-TPU] ERROR : IVF tier supports "
                        "(sq)euclidean only."
                    )
                cfg = self._knn_cfg
                ivf_kwargs = dict(
                    k=k, nprobe=cfg.nprobe, n_clusters=cfg.n_clusters,
                    exclude_self=self.zero_diag, budget=cfg.budget,
                    merge=cfg.merge, nomination=cfg.nomination,
                    rerank=cfg.rerank, m=cfg.m, storage=cfg.storage,
                )
                if cfg.ivf_block is not None:
                    ivf_kwargs["block"] = int(cfg.ivf_block)
                if mesh is not None:
                    from ..parallel.ivf import ivf_knn_sharded

                    C, indices = ivf_knn_sharded(X, mesh=mesh, **ivf_kwargs)
                else:
                    from ..ops.ivf import ivf_knn

                    C, indices = ivf_knn(X, **ivf_kwargs)
                if self.metric == "euclidean":
                    C = jnp.sqrt(jnp.maximum(C, 0.0))
                return (C, indices) if return_indices else C
            if mesh is not None:
                from ..parallel.knn import knn_graph_sharded

                C, indices = knn_graph_sharded(
                    X,
                    k=k,
                    mesh=mesh,
                    metric=self.metric,
                    exclude_diag=self.zero_diag,
                    block_size=self.knn_block_size,
                    mode=self.knn_mode,
                    precision=self.knn_precision,
                    recall_target=self.knn_recall_target,
                )
                return (C, indices) if return_indices else C
            C, indices = knn_graph(
                X,
                k=k,
                metric=self.metric,
                exclude_diag=self.zero_diag,
                mode=self.knn_mode,
                precision=self.knn_precision,
                recall_target=self.knn_recall_target,
                block_size=self.knn_block_size,
            )
            return (C, indices) if return_indices else C
        C, _ = pairwise_distances(X, metric=self.metric, exclude_diag=self.zero_diag)
        return (C, None) if return_indices else C

    def clear_memory(self):
        for name in list(vars(self)):
            if name.endswith("_") and not name.startswith("_"):
                delattr(self, name)


class LogAffinity(Affinity, ABC):
    """Affinity computed in log domain; ``__call__(X, log=True)`` returns logs.

    (reference: torchdr/affinity/base.py:197-283)
    """

    def __call__(self, X, log: bool = False, **kwargs):
        X, _ = to_jax(X)
        log_aff = self._compute_log_affinity(X, **kwargs)
        return log_aff if log else jnp.exp(log_aff)

    def _compute_log_affinity(self, X: jnp.ndarray, **kwargs):
        raise NotImplementedError(
            "[TorchDR-TPU] ERROR : `_compute_log_affinity` method is not implemented."
        )


class SparseAffinity(Affinity, ABC):
    """Affinity with a rectangular padded ``(n, k)`` representation.

    When ``sparsity=False`` behaves densely. The sparse representation is a
    (values, indices) pair; padding slots hold value 0 / index -1
    (reference: torchdr/affinity/base.py:286-431).
    """

    def __init__(
        self,
        metric: str = "sqeuclidean",
        zero_diag: bool = True,
        device: str = "auto",
        verbose: bool = False,
        random_state: Optional[int] = None,
        sparsity: bool = True,
        **kwargs,
    ):
        super().__init__(
            metric=metric,
            zero_diag=zero_diag,
            device=device,
            verbose=verbose,
            random_state=random_state,
            **kwargs,
        )
        self.sparsity = bool(sparsity)

    def __call__(self, X, return_indices: bool = True, **kwargs):
        X, _ = to_jax(X)
        result = self._compute_sparse_affinity(X, return_indices=return_indices, **kwargs)
        return result

    def _compute_sparse_affinity(
        self, X: jnp.ndarray, return_indices: bool = True, **kwargs
    ):
        raise NotImplementedError(
            "[TorchDR-TPU] ERROR : `_compute_sparse_affinity` is not implemented."
        )


class SparseLogAffinity(SparseAffinity, ABC):
    """Sparse affinity computed in log domain.

    ``__call__`` returns probabilities by default; ``log=True`` returns the
    log values (reference: torchdr/affinity/base.py:434-570).
    """

    def __call__(self, X, return_indices: bool = True, log: bool = False, **kwargs):
        X, _ = to_jax(X)
        result = self._compute_sparse_log_affinity(
            X, return_indices=return_indices, **kwargs
        )
        if return_indices:
            log_aff, indices = result
            aff = log_aff if log else self._masked_exp(log_aff, indices)
            return aff, indices
        log_aff = result
        return log_aff if log else jnp.exp(log_aff)

    @staticmethod
    def _masked_exp(log_aff: jnp.ndarray, indices: Optional[jnp.ndarray]):
        aff = jnp.exp(log_aff)
        if indices is not None:
            aff = jnp.where(indices >= 0, aff, 0.0)
        return aff

    def _compute_sparse_log_affinity(
        self, X: jnp.ndarray, return_indices: bool = True, **kwargs
    ):
        raise NotImplementedError(
            "[TorchDR-TPU] ERROR : `_compute_sparse_log_affinity` is not implemented."
        )
