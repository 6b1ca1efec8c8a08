"""Incremental PCA (Ross et al. 2008) and exact two-pass incremental PCA.

TPU-native counterparts of the reference
(reference: torchdr/spectral_embedding/incremental_pca.py:31-1172).

Precision design: the reference runs Welford statistics in float64 on GPU.
TPU float64 is emulated and slow, so the O(batch·d) running statistics are
accumulated host-side in numpy float64 (they are trivially cheap), while
the per-batch heavy ops — the augmented-matrix SVD and the XᵀX Gram — run
on device in f32 with HIGHEST-precision matmuls. This keeps the numerics
of the reference without enabling global x64.

Streaming input: anything iterable of row-batches (list of arrays, a
generator, a torch DataLoader). Arrays are processed in ``batch_size``
slices — the DataLoader analog of reference incremental_pca.py:484-559.
"""

from __future__ import annotations

import functools
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ...base import DRModule
from ...ops.reductions import svd_flip
from ...utils.wrappers import restore_format, to_jax


def _iter_batches(X, batch_size: Optional[int]):
    """Yield numpy row-batches from an array or an iterable of batches."""
    if hasattr(X, "__array__") or isinstance(X, (np.ndarray, jnp.ndarray)):
        Xn = np.asarray(X)
        bs = batch_size or max(5 * Xn.shape[1], 100)
        for i in range(0, Xn.shape[0], bs):
            yield Xn[i : i + bs]
        return
    for batch in X:  # torch DataLoader yields tensors / (tensor, target)
        if isinstance(batch, (list, tuple)):
            batch = batch[0]
        if hasattr(batch, "detach"):
            batch = batch.detach().cpu().numpy()
        yield np.asarray(batch)


@functools.partial(jax.jit, static_argnames=("n_components",))
def _augmented_svd(stacked: jnp.ndarray, n_components: int):
    U, S, Vt = jnp.linalg.svd(stacked, full_matrices=False)
    U, Vt = svd_flip(U, Vt, u_based_decision=False)
    return S, Vt


class IncrementalPCA(DRModule):
    """Incremental PCA via augmented-matrix SVD updates.

    Parameters
    ----------
    n_components : int, default=2
    batch_size : int, optional
        Rows per update; default 5 * n_features.
    lowrank : bool, default=False
        Kept for API parity; XLA's SVD on the small augmented matrix is
        already O((k+b)·d²)-cheap, so no separate randomized path is needed.
    """

    def __init__(
        self,
        n_components: int = 2,
        batch_size: Optional[int] = None,
        device: str = "auto",
        verbose: bool = False,
        random_state: Optional[int] = None,
        lowrank: bool = False,
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
        self.batch_size = batch_size
        self.lowrank = lowrank
        self._reset()

    def _reset(self):
        self.mean_ = None
        self.var_ = None
        self.n_samples_seen_ = 0
        self.components_ = None
        self.singular_values_ = None
        self.noise_variance_ = None

    # --- Welford statistics, host-side float64 (see module docstring) ---

    @staticmethod
    def _incremental_mean_and_var(Xb, last_mean, last_var, last_count):
        n_new = Xb.shape[0]
        new_count = last_count + n_new
        new_sum = Xb.sum(axis=0, dtype=np.float64)
        last_sum = (
            np.zeros(Xb.shape[1], np.float64) if last_mean is None else last_mean * last_count
        )
        updated_mean = (last_sum + new_sum) / new_count

        T = new_sum / n_new
        temp = Xb.astype(np.float64) - T
        correction = temp.sum(axis=0) ** 2
        new_unnorm_var = (temp**2).sum(axis=0) - correction / n_new
        if last_var is None:
            updated_var = new_unnorm_var / new_count
        else:
            last_unnorm_var = last_var * last_count
            ratio = last_count / n_new
            updated_var = (
                last_unnorm_var
                + new_unnorm_var
                + ratio / new_count * (last_sum / ratio - new_sum) ** 2
            ) / new_count
        return updated_mean, updated_var, new_count

    def partial_fit(self, X) -> "IncrementalPCA":
        """Update the model with one batch (reference: incremental_pca.py:380-430)."""
        Xb = np.asarray(X, np.float32)
        if Xb.ndim != 2:
            raise ValueError("[TorchDR-TPU] ERROR : batch must be 2D.")
        n_samples, n_features = Xb.shape
        first_pass = self.components_ is None
        if self.n_components > n_features:
            raise ValueError(
                f"[TorchDR-TPU] ERROR : n_components={self.n_components} exceeds "
                f"n_features={n_features}."
            )
        if first_pass and n_samples < self.n_components:
            raise ValueError(
                f"[TorchDR-TPU] ERROR : first batch has {n_samples} rows, fewer "
                f"than n_components={self.n_components}."
            )
        if not first_pass and n_features != self.mean_.shape[0]:
            raise ValueError(
                f"n_features={self.mean_.shape[0]} while input has {n_features} features"
            )

        col_mean, col_var, n_total = self._incremental_mean_and_var(
            Xb, self.mean_, self.var_, self.n_samples_seen_
        )

        if first_pass:
            stacked = jnp.asarray(Xb - col_mean, jnp.float32)
        else:
            batch_mean = Xb.mean(axis=0)
            X_centered = Xb - batch_mean
            corr_factor = np.sqrt((self.n_samples_seen_ / n_total) * n_samples)
            mean_correction = corr_factor * (self.mean_ - batch_mean)
            stacked = jnp.concatenate(
                [
                    jnp.asarray(
                        self.singular_values_[:, None] * self.components_, jnp.float32
                    ),
                    jnp.asarray(X_centered, jnp.float32),
                    jnp.asarray(mean_correction[None, :], jnp.float32),
                ],
                axis=0,
            )

        S, Vt = _augmented_svd(stacked, self.n_components)
        k = self.n_components
        explained_variance = np.asarray(S) ** 2 / max(n_total - 1, 1)

        self.n_samples_seen_ = int(n_total)
        self.components_ = np.asarray(Vt[:k])
        self.singular_values_ = np.asarray(S[:k])
        self.mean_ = col_mean
        self.var_ = col_var
        self.explained_variance_ = explained_variance[:k]
        total_var = float((col_var * n_total).sum())
        self.explained_variance_ratio_ = (
            np.asarray(S[:k]) ** 2 / total_var if total_var > 0 else np.zeros(k)
        )
        self.noise_variance_ = (
            float(explained_variance[k:].mean()) if explained_variance.shape[0] > k else 0.0
        )
        self.is_fitted_ = True
        return self

    def _fit_transform(self, X: jnp.ndarray, y: Optional[Any] = None) -> jnp.ndarray:
        return self._fit_transform_any(X)

    def fit_transform(self, X, y=None):
        # Accept arrays AND batch iterables (DataLoader analog).
        if hasattr(X, "__array__") or isinstance(X, (np.ndarray, jnp.ndarray)):
            X_jax, fmt = to_jax(X)
            self._input_format_ = fmt
            out = self._fit_transform_any(X_jax)
            self.embedding_ = out
            self.is_fitted_ = True
            return restore_format(out, fmt)
        self._input_format_ = "numpy"
        out = self._fit_transform_any(X)
        self.embedding_ = out
        self.is_fitted_ = True
        return np.asarray(out)

    def _fit_transform_any(self, X):
        self._reset()
        batches = list(_iter_batches(X, self.batch_size))
        # sklearn-compat: a final thin batch (< n_components rows) cannot be
        # SVD-updated; merge it into the previous batch.
        if len(batches) > 1 and batches[-1].shape[0] < self.n_components:
            batches[-2] = np.concatenate([batches[-2], batches[-1]], axis=0)
            batches.pop()
        for batch in batches:
            self.partial_fit(batch)
        outs = [np.asarray(self._transform_np(b)) for b in batches]
        return jnp.asarray(np.concatenate(outs, axis=0))

    def _transform_np(self, Xb):
        return (np.asarray(Xb) - self.mean_) @ self.components_.T

    def transform(self, X=None):
        if X is None:
            return super().transform(None)
        if self.components_ is None:
            raise ValueError("IncrementalPCA is not fitted yet.")
        X_jax, fmt = to_jax(X)
        return restore_format(jnp.asarray(self._transform_np(np.asarray(X_jax))), fmt)


class ExactIncrementalPCA(DRModule):
    """Exact two-pass PCA accumulating XᵀX batch-wise.

    Pass 1 accumulates Σx and ΣXᵀX (device f32 Gram per batch, host f64
    accumulation of the reduced d/d² values); eigendecomposition of the
    d×d covariance gives exact components; pass 2 transforms batches.

    Mesh execution (``mesh=`` or ``_set_fit_mesh``): each batch is
    row-sharded over the mesh and the per-batch Σx / XᵀX run as a
    ``shard_map`` body — local partial sums followed by a ``psum`` over
    the data axis — so the O(batch·d²) Gram work is split across chips
    while the replicated (d,)/(d,d) results are still accumulated exactly
    in host f64. Components come from one host eigh and are replicated
    (the TPU analog of the reference's all-reduce + broadcast pipeline,
    reference: torchdr/spectral_embedding/incremental_pca.py:845-1090).
    """

    def __init__(
        self,
        n_components: int = 2,
        batch_size: Optional[int] = None,
        device: str = "auto",
        verbose: bool = False,
        random_state: Optional[int] = None,
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
        self.batch_size = batch_size
        self.mesh = mesh
        self._fit_mesh_ = mesh
        self.mean_ = None
        self.components_ = None

    def _set_fit_mesh(self, mesh) -> None:
        """Same mesh-injection protocol as the affinity classes."""
        self._fit_mesh_ = mesh

    @staticmethod
    @jax.jit
    def _batch_stats(Xb: jnp.ndarray):
        s = jnp.sum(Xb, axis=0)
        g = jnp.matmul(
            Xb.T, Xb, preferred_element_type=jnp.float32,
            precision=lax.Precision.HIGHEST,
        )
        return s, g

    @staticmethod
    @functools.lru_cache(maxsize=8)
    def _sharded_stats_fn(mesh):
        """shard_map'd Σx / XᵀX with an explicit psum over the data axis."""
        from jax import shard_map
        from jax.sharding import PartitionSpec as P

        axis = mesh.axis_names[0]

        def local(xl):
            s = jnp.sum(xl, axis=0)
            g = jnp.matmul(
                xl.T, xl, preferred_element_type=jnp.float32,
                precision=lax.Precision.HIGHEST,
            )
            return lax.psum(s, axis), lax.psum(g, axis)

        return jax.jit(
            shard_map(
                local, mesh=mesh, in_specs=P(axis, None), out_specs=(P(), P())
            )
        )

    def _mesh_batch_stats(self, Xb: np.ndarray, mesh):
        """Row-shard one batch over the mesh and reduce with psum.

        Zero-padding rows to a multiple of the world size is exact for both
        Σx and XᵀX (zero rows contribute nothing).
        """
        from ...parallel.mesh import pad_to_multiple, shard_rows

        world = mesh.devices.size
        n = Xb.shape[0]
        n_pad = pad_to_multiple(max(n, world), world)
        Xp = np.zeros((n_pad, Xb.shape[1]), np.float32)
        Xp[:n] = Xb
        Xp = shard_rows(jnp.asarray(Xp), mesh)
        return self._sharded_stats_fn(mesh)(Xp)

    def fit(self, X, y=None):
        self.fit_transform(X, y)
        return self

    def _fit_stats(self, X):
        batches = list(_iter_batches(X, self.batch_size))
        d = batches[0].shape[1]
        total = 0
        sum_x = np.zeros(d, np.float64)
        gram = np.zeros((d, d), np.float64)
        mesh = getattr(self, "_fit_mesh_", None)
        for b in batches:
            if mesh is not None:
                s, g = self._mesh_batch_stats(np.asarray(b, np.float32), mesh)
            else:
                s, g = self._batch_stats(jnp.asarray(b, jnp.float32))
            sum_x += np.asarray(s, np.float64)
            gram += np.asarray(g, np.float64)
            total += b.shape[0]
        mean = sum_x / total
        cov = gram / total - np.outer(mean, mean)
        evals, evecs = np.linalg.eigh(cov)
        order = np.argsort(evals)[::-1]
        evecs = evecs[:, order]
        max_abs = np.argmax(np.abs(evecs), axis=0)
        signs = np.sign(evecs[max_abs, np.arange(evecs.shape[1])])
        evecs = evecs * np.where(signs == 0, 1.0, signs)[None, :]
        self.mean_ = mean.astype(np.float32)
        self.components_ = evecs[:, : self.n_components].T.astype(np.float32)
        self.explained_variance_ = evals[order][: self.n_components].astype(np.float32)
        self.n_samples_seen_ = total
        self.is_fitted_ = True
        return self

    def fit_transform(self, X, y=None):
        # materialize once: X may be a one-shot batch iterator, and the
        # two-pass algorithm (stats, then projection) must see every batch
        # twice (reference re-iterates its DataLoader, incremental_pca.py:
        # 484-559; a generator can't be re-iterated)
        batches = list(_iter_batches(X, self.batch_size))
        self._fit_stats(batches)
        outs = [(b - self.mean_) @ self.components_.T for b in batches]
        self.embedding_ = jnp.asarray(np.concatenate(outs, axis=0).astype(np.float32))
        return np.asarray(self.embedding_)

    def _fit_transform(self, X, y=None):
        return jnp.asarray(self.fit_transform(X, y))

    def transform(self, X=None):
        if X is None:
            return super().transform(None)
        if self.components_ is None:
            raise ValueError("ExactIncrementalPCA is not fitted yet.")
        X_jax, fmt = to_jax(X)
        return restore_format(
            jnp.asarray((np.asarray(X_jax) - self.mean_) @ self.components_.T), fmt
        )
