"""Kernel PCA.

TPU-native KernelPCA (reference: torchdr/spectral_embedding/kernel_pca.py:
23-120). Dense path: centered kernel + ``eigh``. Large-n path: LOBPCG
(jax.experimental.sparse.linalg) over an implicitly centered kernel
operator — the XLA-native replacement for the cuSOLVER full
eigendecomposition at scale (SURVEY.md §2.2 north-star).
"""

from __future__ import annotations

from typing import Any, Optional

import jax.numpy as jnp

from ...affinity.base import Affinity
from ...affinity.entropic import NormalizedGaussianAffinity
from ...base import DRModule
from ...ops.reductions import center_kernel, check_nonnegativity_eigenvalues, svd_flip


class KernelPCA(DRModule):
    """Kernel Principal Component Analysis.

    Parameters
    ----------
    affinity : Affinity, default NormalizedGaussianAffinity(normalization_dim=None)
        Affinity producing the kernel matrix.
    n_components : int, default=2
    nodiag : bool, default=False
        Drop zero-eigenvalue components.
    solver : {"eigh", "lobpcg"}, default="eigh"
        "lobpcg" avoids the full O(n³) eigendecomposition for large n.
    """

    def __init__(
        self,
        affinity: Optional[Affinity] = None,
        n_components: int = 2,
        device: str = "auto",
        verbose: bool = False,
        random_state: Optional[int] = None,
        nodiag: bool = False,
        solver: str = "eigh",
        **kwargs,
    ):
        super().__init__(
            n_components=n_components,
            device=device,
            verbose=verbose,
            random_state=random_state,
            process_duplicates=False,
            **kwargs,
        )
        self.affinity = affinity if affinity is not None else NormalizedGaussianAffinity(
            normalization_dim=None
        )
        self.nodiag = nodiag
        self.solver = solver

    def _fit_transform(self, X: jnp.ndarray, y: Optional[Any] = None) -> jnp.ndarray:
        K = self.affinity(X)
        K = center_kernel(K)

        if self.solver == "lobpcg":
            eigvals, eigvecs = self._lobpcg_top(K)
        else:
            eigvals, eigvecs = jnp.linalg.eigh(K)
            eigvals = jnp.flip(eigvals, axis=0)
            eigvecs = jnp.flip(eigvecs, axis=1)

        eigvals = check_nonnegativity_eigenvalues(eigvals)
        eigvecs, _ = svd_flip(eigvecs, jnp.zeros_like(eigvecs).T)

        if self.nodiag or self.n_components is None:
            # keep only strictly positive eigen-directions; static-shape
            # safe because we sort descending and slice.
            keep = int(jnp.sum(eigvals > 0))
            eigvecs = eigvecs[:, :keep]
            eigvals = eigvals[:keep]

        eigvecs = eigvecs[:, : self.n_components]
        self.eigenvectors_ = eigvecs
        self.eigenvalues_ = eigvals
        self.embedding_ = eigvecs * jnp.sqrt(
            jnp.maximum(eigvals[: self.n_components], 0.0)
        )
        return self.embedding_

    def _lobpcg_top(self, K: jnp.ndarray):
        """Top-k eigenpairs by LOBPCG; K must be PSD-ish (centered kernel)."""
        import jax
        from jax.experimental.sparse.linalg import lobpcg_standard

        n = K.shape[0]
        k = min(self.n_components + (0 if not self.nodiag else 2), n // 2 or 1)
        X0 = jax.random.normal(self._root_key(), (n, k), K.dtype)
        # Shift to ensure positive-definiteness for LOBPCG on the centered
        # kernel (eigenvalues >= 0 up to round-off).
        shift = 1e-6 * jnp.trace(K) / n
        theta, U, _ = lobpcg_standard(K + shift * jnp.eye(n, dtype=K.dtype), X0, m=200)
        order = jnp.argsort(-theta)
        return theta[order] - shift, U[:, order]
