"""Kernel PCA.

TPU-native KernelPCA (reference: torchdr/spectral_embedding/kernel_pca.py:
23-120). Dense path: centered kernel + ``eigh``. Large-n path: LOBPCG
(jax.experimental.sparse.linalg) over a **matrix-free** implicitly
centered kernel operator — kernel row blocks are regenerated from X
inside every matvec (flash-style streaming, O(block·n) live memory, no
(n, n) buffer, no ``jnp.eye``), which is what lets KernelPCA run at n
where the dense kernel cannot exist. This is the XLA-native replacement
for the cuSOLVER full eigendecomposition at scale (SURVEY.md §2.2
north-star); the reference's own LOBPCG-free path stays dense
(reference: torchdr/spectral_embedding/kernel_pca.py:80-120).
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
from jax import lax

from ...affinity.base import Affinity
from ...affinity.entropic import (
    NormalizedGaussianAffinity,
    NormalizedStudentAffinity,
)
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
    mesh : jax.sharding.Mesh, optional
        When set (lobpcg matrix-free path only), the streamed matvec runs
        as a ``shard_map`` body: each device owns a row chunk of the
        kernel operator, computes its (chunk, n) block locally, and the
        result rows are reassembled over the mesh — O(n/p · n) kernel
        work per chip.
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
        mesh=None,
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
        self.mesh = mesh

    def _fit_transform(self, X: jnp.ndarray, y: Optional[Any] = None) -> jnp.ndarray:
        if self.solver == "lobpcg":
            kern_fn = self._kernel_block_fn(X)
            if kern_fn is not None:
                # matrix-free: never materialize K (large-n path)
                eigvals, eigvecs = self._lobpcg_matfree(X, kern_fn)
            else:
                # unsupported affinity: dense K, but still centered
                # implicitly inside the matvec (no jnp.eye, no second
                # centered copy)
                K = self.affinity(X)
                eigvals, eigvecs = self._lobpcg_dense(K)
        else:
            K = self.affinity(X)
            K = center_kernel(K)
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

    # --- LOBPCG tier ---

    def _lobpcg_k(self, n: int) -> int:
        return min(self.n_components + (0 if not self.nodiag else 2), n // 2 or 1)

    def _kernel_block_fn(self, X) -> Optional[Callable]:
        """Elementwise kernel-from-distances function for the streamed
        operator, or None when the affinity has no matrix-free form.

        Supported: NormalizedGaussianAffinity / NormalizedStudentAffinity
        with ``normalization_dim`` None or (0, 1) — global normalization is
        a scalar factor (one extra streaming pass), so eigenvectors are
        unchanged and eigenvalues scale by 1/Z. Row/col normalization
        breaks symmetry and stays on the dense path.
        """
        aff = self.affinity
        if type(aff) is NormalizedStudentAffinity:
            nu = float(aff.degrees_of_freedom)

            def kern(C):
                return jnp.exp(-0.5 * (nu + 1.0) * jnp.log1p(C / nu))

        elif type(aff) is NormalizedGaussianAffinity:
            sigma = float(aff.sigma)

            def kern(C):
                return jnp.exp(-C / sigma)

        else:
            return None
        if aff.normalization_dim not in (None, (0, 1)):
            return None
        if aff.metric not in ("sqeuclidean", "euclidean"):
            return None
        return kern

    def _lobpcg_matfree(self, X: jnp.ndarray, kern_fn, block: int = 512):
        """Top-k eigenpairs of the centered kernel without forming it.

        The operator V ↦ H K H V streams kernel row blocks recomputed from
        X (pairwise distances → elementwise kernel → one MXU matmul per
        block); centering H = I − 11ᵀ/n is applied implicitly by mean
        subtraction on both sides. Live memory is O(block · n).
        """
        from jax.experimental.sparse.linalg import lobpcg_standard

        from ...ops.metrics import pairwise_block

        aff = self.affinity
        n = X.shape[0]
        X = jnp.asarray(X, jnp.float32)
        if aff.metric in ("sqeuclidean", "euclidean"):
            # same conditioning trick as Affinity._distance_matrix
            X = X - jnp.mean(X, axis=0, keepdims=True)
        n_pad = -(-n // block) * block
        Xp = jnp.zeros((n_pad, X.shape[1]), X.dtype).at[:n].set(X)
        zero_diag = bool(aff.zero_diag)
        metric = "sqeuclidean" if aff.metric == "euclidean" else aff.metric
        sqrt_metric = aff.metric == "euclidean"
        cols = jnp.arange(n)
        _SHIFT = 1e-3  # PD shift: centered PSD kernel has eigvals ≥ 0

        def _kernel_block(Xb, row0, Xcols):
            """Kernel rows [row0, row0+block) against all n columns
            (``Xcols``, passed explicitly so the mesh path ships X once as
            a replicated operand rather than again as a jit constant)."""
            C = pairwise_block(Xb, Xcols, metric)
            if sqrt_metric:
                C = jnp.sqrt(jnp.maximum(C, 0.0))
            Kb = kern_fn(C)
            if zero_diag:
                rows = row0 + jnp.arange(Xb.shape[0])
                Kb = jnp.where(rows[:, None] == cols[None, :], 0.0, Kb)
            return Kb

        if self.mesh is not None:
            # shard_map tier: each device owns a row chunk of the operator
            # and streams its own (block, n) kernel sub-blocks — O(n/p · n)
            # kernel work per chip, result rows reassembled over the mesh.
            from jax import shard_map
            from jax.sharding import PartitionSpec as P

            from ...parallel.mesh import pad_to_multiple, shard_rows

            mesh = self.mesh
            axis = mesh.axis_names[0]
            world = int(mesh.devices.size)
            block = min(block, -(-n // world))
            n_pad = pad_to_multiple(n, world * block)
            Xp = jnp.zeros((n_pad, X.shape[1]), X.dtype).at[:n].set(X)
            chunk = n_pad // world

            def local_kw(Xl, Xg, Wc):
                r0 = lax.axis_index(axis) * chunk

                def body(b):
                    Xb = lax.dynamic_slice_in_dim(Xl, b * block, block, axis=0)
                    return jnp.matmul(
                        _kernel_block(Xb, r0 + b * block, Xg),
                        Wc,
                        preferred_element_type=jnp.float32,
                    )

                return lax.map(body, jnp.arange(chunk // block)).reshape(chunk, -1)

            smap = shard_map(
                local_kw,
                mesh=mesh,
                in_specs=(P(axis, None), P(), P()),
                out_specs=P(axis, None),
            )
            Xp_sh = shard_rows(Xp, mesh)

            @jax.jit
            def matvec(W):  # (n, k) → H K H W  (+ diagonal shift)
                Wc = W - jnp.mean(W, axis=0, keepdims=True)
                U = smap(Xp_sh, X, Wc)[:n]
                U = U - jnp.mean(U, axis=0, keepdims=True)
                return U + _SHIFT * W

            @jax.jit
            def row_sums():  # K @ 1 over the mesh
                return smap(Xp_sh, X, jnp.ones((n, 1), jnp.float32))[:n, 0]

        else:

            @jax.jit
            def matvec(W):  # (n, k) → H K H W  (+ diagonal shift)
                Wc = W - jnp.mean(W, axis=0, keepdims=True)

                def body(b):
                    Xb = lax.dynamic_slice_in_dim(Xp, b * block, block, axis=0)
                    return jnp.matmul(
                        _kernel_block(Xb, b * block, X),
                        Wc,
                        preferred_element_type=jnp.float32,
                    )

                U = lax.map(body, jnp.arange(n_pad // block)).reshape(-1, W.shape[1])[:n]
                U = U - jnp.mean(U, axis=0, keepdims=True)
                return U + _SHIFT * W

            @jax.jit
            def row_sums():
                def body(b):
                    Xb = lax.dynamic_slice_in_dim(Xp, b * block, block, axis=0)
                    return jnp.sum(_kernel_block(Xb, b * block, X), axis=1)

                return lax.map(body, jnp.arange(n_pad // block)).reshape(-1)[:n]

        # scalar normalization factor (global (0,1) logsumexp of log K):
        # a uniform 1/Z on the kernel ⇒ eigvecs unchanged, eigvals / Z
        Z = 1.0
        if aff.normalization_dim == (0, 1):
            Z = float(jnp.sum(row_sums()))

        k = self._lobpcg_k(n)
        X0 = jax.random.normal(self._root_key(), (n, k), jnp.float32)
        theta, U, _ = lobpcg_standard(matvec, X0, m=200)
        order = jnp.argsort(-theta)
        return (theta[order] - _SHIFT) / Z, U[:, order]

    def _lobpcg_dense(self, K: jnp.ndarray):
        """LOBPCG over a dense (already materialized) kernel; centering and
        the PD shift are applied inside the matvec — no K-sized copies."""
        from jax.experimental.sparse.linalg import lobpcg_standard

        n = K.shape[0]
        shift = 1e-6 * jnp.trace(K) / n

        def matvec(W):
            Wc = W - jnp.mean(W, axis=0, keepdims=True)
            U = K @ Wc
            return U - jnp.mean(U, axis=0, keepdims=True) + shift * W

        k = self._lobpcg_k(n)
        X0 = jax.random.normal(self._root_key(), (n, k), K.dtype)
        theta, U, _ = lobpcg_standard(jax.jit(matvec), X0, m=200)
        order = jnp.argsort(-theta)
        return theta[order] - shift, U[:, order]
