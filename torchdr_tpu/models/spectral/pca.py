"""Principal Component Analysis.

TPU-native PCA (reference: torchdr/spectral_embedding/pca.py:19-321).
Single-device path is one jitted SVD with deterministic sign fixing; the
multi-device path uses the covariance method with ``psum``-style global
reductions expressed through GSPMD (see torchdr_tpu/parallel) — local
XᵀX contributions are summed by XLA collectives when the input is
row-sharded across the mesh, mirroring the reference's all-reduce design
(reference: torchdr/spectral_embedding/pca.py:186-298) without any
process-group bootstrap.
"""

from __future__ import annotations

import functools
from typing import Any, Optional

import jax
import jax.numpy as jnp

from ...base import DRModule
from ...ops.reductions import svd_flip
from ...utils.wrappers import restore_format, to_jax


@functools.partial(jax.jit, static_argnames=("n_components",))
def _pca_svd(X: jnp.ndarray, n_components: int):
    mean = jnp.mean(X, axis=0, keepdims=True)
    U, S, V = jnp.linalg.svd(X - mean, full_matrices=False)
    U, V = svd_flip(U, V)
    components = V[:n_components]
    embedding = U[:, :n_components] * S[:n_components]
    return embedding, components, mean


@functools.partial(jax.jit, static_argnames=("n_components",))
def _pca_cov(X: jnp.ndarray, n_components: int):
    """Covariance-method PCA: O(d²) memory, mesh-friendly.

    When ``X`` is row-sharded over a mesh, ``mean`` and ``XᵀX`` become
    XLA ``all-reduce``s automatically — the GSPMD analog of the reference's
    explicit NCCL all_reduce pipeline (torchdr/spectral_embedding/pca.py:
    232-283).
    """
    mean = jnp.mean(X, axis=0, keepdims=True)
    Xc = X - mean
    cov = jnp.matmul(Xc.T, Xc, preferred_element_type=jnp.float32) / X.shape[0]
    evals, evecs = jnp.linalg.eigh(cov)
    order = jnp.argsort(-evals)
    evecs = evecs[:, order]
    # deterministic sign: largest-|.| entry of each eigenvector positive
    max_abs = jnp.argmax(jnp.abs(evecs), axis=0)
    signs = jnp.sign(evecs[max_abs, jnp.arange(evecs.shape[1])])
    evecs = evecs * jnp.where(signs == 0, 1.0, signs)[None, :]
    components = evecs[:, :n_components].T
    embedding = Xc @ components.T
    return embedding, components, mean


class PCA(DRModule):
    """Principal Component Analysis.

    Parameters
    ----------
    n_components : int, default=2
    device : str, default="auto"
    verbose : bool, default=False
    random_state : int, optional
    method : {"auto", "svd", "covariance"}, default="auto"
        "svd" matches sklearn/the reference's single-GPU path; "covariance"
        is the distributed-friendly O(d²) path. "auto" picks covariance when
        the input is sharded across >1 devices.
    """

    def __init__(
        self,
        n_components: int = 2,
        device: str = "auto",
        verbose: bool = False,
        random_state: Optional[int] = None,
        method: str = "auto",
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
        self.method = method
        self.mean_ = None
        self.components_ = None

    def _resolve_method(self, X: jnp.ndarray) -> str:
        if self.method != "auto":
            return self.method
        try:
            is_sharded = len(X.sharding.device_set) > 1  # type: ignore[attr-defined]
        except AttributeError:
            is_sharded = False
        # Tall matrices: the d×d eigh is far cheaper than an n×d SVD on TPU
        # (same components up to sign; O(nd²) → O(nd·min(n,d) + d³)).
        tall = X.shape[0] > 8 * X.shape[1] and X.shape[0] > 4096
        return "covariance" if (is_sharded or tall) else "svd"

    def _fit_transform(self, X: jnp.ndarray, y: Optional[Any] = None) -> jnp.ndarray:
        method = self._resolve_method(X)
        if method == "svd":
            embedding, self.components_, self.mean_ = _pca_svd(X, self.n_components)
        elif method == "covariance":
            embedding, self.components_, self.mean_ = _pca_cov(X, self.n_components)
        else:
            raise ValueError(f"[TorchDR-TPU] ERROR : unknown PCA method {method!r}.")
        return embedding

    def transform(self, X=None):
        if X is None:
            return super().transform(None)
        if self.mean_ is None:
            raise ValueError("PCA is not fitted yet.")
        X_jax, fmt = to_jax(X)
        return restore_format((X_jax - self.mean_) @ self.components_.T, fmt)
