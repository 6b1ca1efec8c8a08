"""Affinity matching engine — the generic "match P to Q" optimizer.

TPU-native re-design of the reference's ``AffinityMatcher``
(reference: torchdr/affinity_matcher.py:41-677) and the neighbor-embedding
training mechanics (reference: torchdr/neighbor_embedding/base.py:20-423).

Architecture difference (deliberate, SURVEY.md §7): the reference runs a
host-side Python loop that dispatches one optimizer step per iteration and
*re-instantiates* the optimizer/scheduler when early exaggeration ends. Here
the **entire optimization is a single jitted ``lax.while_loop``**:

- the early-exaggeration coefficient, SGD momentum switch (0.5 → 0.8) and
  the auto learning rate (sklearn t-SNE rule, max(n/ee/4, 50)) are pure
  functions of the iteration counter;
- "re-instantiating the optimizer" is a masked zeroing of the moment
  buffers at the phase boundary;
- negative sampling / schedule state lives in a *carry* pytree threaded
  through the loop;
- convergence (grad-norm < min_grad_norm, checked every ``check_interval``)
  is part of the while condition.

One compiled program per fit → no per-step host dispatch, everything fuses.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Union

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from .affinity.base import Affinity, LogAffinity, SparseAffinity
from .base import DRModule
from .ops.reductions import cross_entropy_loss, square_loss
from .utils.optim import make_optimizer, normalize_optimizer_kwargs
from .utils.schedulers import make_scheduler
from .utils.logger import log_phase

LOSS_DICT = {"square_loss": square_loss, "cross_entropy_loss": cross_entropy_loss}


def _is_tracer(x) -> bool:
    return isinstance(x, jax.core.Tracer)


class AffinityMatcher(DRModule):
    r"""Minimize a loss between input affinity P and embedding affinity Q.

    Parameters mirror the reference (torchdr/affinity_matcher.py:116-197);
    torch-specific ones (``backend``, ``compile``) are dropped — the engine
    is always compiled. ``encoder`` accepts a flax ``linen.Module`` for
    parametric (out-of-sample) embeddings; its weights are optimized instead
    of a free embedding matrix.
    """

    # Subclasses with analytic gradients set this (reference:
    # torchdr/affinity_matcher.py:380-416).
    _use_closed_form_gradients = False

    def __init__(
        self,
        affinity_in: Union[Affinity, str],
        affinity_out: Optional[Affinity] = None,
        kwargs_affinity_out: Optional[Dict] = None,
        n_components: int = 2,
        loss_fn: str = "square_loss",
        kwargs_loss: Optional[Dict] = None,
        optimizer: str = "Adam",
        optimizer_kwargs: Union[Dict, str, None] = None,
        lr: Union[float, str] = 1e0,
        scheduler: Optional[str] = None,
        scheduler_kwargs: Union[Dict, str, None] = None,
        min_grad_norm: float = 1e-7,
        max_iter: int = 1000,
        init: Union[str, np.ndarray, jnp.ndarray] = "pca",
        init_scaling: float = 1e-4,
        device: str = "auto",
        verbose: bool = False,
        random_state: Optional[int] = None,
        check_interval: int = 50,
        distributed: Union[bool, str] = False,
        mesh=None,
        encoder=None,
        max_iters_per_dispatch: Optional[int] = None,
        **kwargs,
    ):
        super().__init__(
            n_components=n_components,
            device=device,
            verbose=verbose,
            random_state=random_state,
            **kwargs,
        )
        if loss_fn not in LOSS_DICT:
            raise ValueError(f"[TorchDR-TPU] ERROR : Loss function {loss_fn} not supported.")
        if not isinstance(affinity_in, Affinity) and affinity_in != "precomputed":
            raise ValueError(
                '[TorchDR-TPU] affinity_in must be an Affinity instance or "precomputed".'
            )
        if affinity_out is not None and not isinstance(affinity_out, Affinity):
            raise ValueError(
                "[TorchDR-TPU] ERROR : affinity_out must be an Affinity instance when not None."
            )

        self.affinity_in = affinity_in
        self.affinity_out = affinity_out
        self.kwargs_affinity_out = kwargs_affinity_out
        self.loss_fn = loss_fn
        self.kwargs_loss = kwargs_loss
        self.optimizer = optimizer
        self.optimizer_kwargs = optimizer_kwargs
        self.lr = lr
        self.scheduler = scheduler
        self.scheduler_kwargs = scheduler_kwargs
        self.min_grad_norm = min_grad_norm
        self.max_iter = max_iter
        self.init = init
        self.init_scaling = init_scaling
        self.check_interval = check_interval
        self.distributed = distributed
        self.mesh = mesh
        self.encoder = encoder
        # Split the compiled loop into bounded-duration dispatches (same
        # compiled program, a host sync per segment). The axon TPU worker
        # dies under single dispatches that saturate the chip for minutes;
        # set this for very long fits on large n.
        self.max_iters_per_dispatch = max_iters_per_dispatch

        # Early-exaggeration plan; overridden by NeighborEmbedding.
        self._ee_coeff = 1.0
        self._ee_iter = 0
        self.n_iter_ = -1

    # --- tracer-safe attribute store ---

    def _store(self, name: str, value) -> None:
        """Store a fitted attribute unless it is a tracer (inside jit)."""
        if not _is_tracer(value):
            setattr(self, name, value)

    # --- distributed placement (SPMD over a data mesh) ---

    def _resolve_mesh(self):
        """Build the mesh for SPMD training, or None for single-device.

        Replaces the reference's torchrun/NCCL bootstrap (torchdr/
        neighbor_embedding/base.py:354-383): here "distributed" is only a
        placement decision — the same compiled loop runs row-sharded with
        XLA-inserted collectives.
        """
        if self.mesh is not None:
            return self.mesh
        enabled = (
            len(jax.devices()) > 1 if self.distributed == "auto" else bool(self.distributed)
        )
        if not enabled:
            return None
        from .parallel.mesh import make_mesh

        return make_mesh()

    def _mesh_constraints(self, mesh):
        """(constrain_rows, constrain_replicated) in-jit sharding helpers.

        Row-shard every n-leading array, replicate the embedding — mechanism
        3 of the reference's parallelism (replicated embedding + summed
        gradients, SURVEY.md §2.3) expressed as GSPMD constraints instead of
        explicit NCCL calls. ``with_sharding_constraint`` tolerates n not
        divisible by the mesh (GSPMD falls back to the largest divisor
        sharding); for full utilization make n a multiple of the mesh size.
        """
        from jax.sharding import NamedSharding, PartitionSpec

        from .parallel.mesh import replicated, row_sharding

        n = self.n_samples_in_
        rep = replicated(mesh)
        axis = mesh.axis_names[0]

        def constrain_rows(tree):
            def f(x):
                if not hasattr(x, "ndim"):
                    return x
                if x.ndim >= 1 and x.shape[0] == n:
                    return lax.with_sharding_constraint(x, row_sharding(mesh, x.ndim))
                if x.ndim >= 2 and x.shape[1] == n:
                    # group-stacked state (G, n, W): rows live on axis 1
                    spec = PartitionSpec(None, axis, *([None] * (x.ndim - 2)))
                    return lax.with_sharding_constraint(
                        x, NamedSharding(mesh, spec)
                    )
                return x

            return jax.tree_util.tree_map(f, tree)

        def constrain_rep(x):
            return lax.with_sharding_constraint(x, rep)

        return constrain_rows, constrain_rep

    # --- fit ---

    def fit_transform(self, X, y=None):
        # Row dedup does not apply to a precomputed affinity matrix.
        if isinstance(self.affinity_in, str):
            self.process_duplicates = False
        return super().fit_transform(X, y)

    def _fit_transform(self, X: jnp.ndarray, y: Optional[Any] = None) -> jnp.ndarray:
        self.n_samples_in_, self.n_features_in_ = X.shape

        # Resolve the mesh BEFORE the affinity phase and inject it into the
        # input affinity: the kNN build + symmetrization (phase A — the
        # memory-dominant phase at large n) then run row-sharded over the
        # mesh, like the reference's per-rank chunked build (torchdr/
        # affinity/base.py:310-391), not just the training loop.
        mesh = self._resolve_mesh()
        self._fit_mesh_ = mesh
        if isinstance(self.affinity_in, Affinity):
            self.affinity_in._set_fit_mesh(mesh)

        self.on_affinity_computation_start()
        with log_phase(self.logger, "input affinity"):
            self._compute_input_affinity(X)
        self.on_affinity_computation_end()

        with log_phase(self.logger, "embedding optimization"):
            Z0 = self._init_embedding(X)
            consts = self._build_consts(X)
            carry0 = self._init_carry(consts)
            Z, n_iter, grad_norm = self._optimize(Z0, consts, carry0)

        self.n_iter_ = int(n_iter)
        self._last_grad_norm_ = float(grad_norm)
        if bool(jnp.any(jnp.isnan(Z))):
            raise ValueError(
                "[TorchDR-TPU] ERROR AffinityMatcher : NaNs in the embeddings."
            )
        embedding = Z
        self.embedding_ = embedding
        self.clear_memory()
        return embedding

    def transform(self, X=None):
        """Training embedding, or encoder(X) for new data in parametric mode."""
        if X is not None and self.encoder is not None:
            if not hasattr(self, "encoder_variables_"):
                raise ValueError("Estimator is not fitted yet.")
            from .utils.wrappers import restore_format, to_jax

            X_jax, fmt = to_jax(X)
            return restore_format(
                self.encoder.apply(self.encoder_variables_, X_jax), fmt
            )
        return super().transform(X)

    def _compute_input_affinity(self, X: jnp.ndarray) -> None:
        if isinstance(self.affinity_in, str):  # "precomputed"
            if X.shape[0] != X.shape[1]:
                raise ValueError(
                    '[TorchDR-TPU] ERROR : affinity_in="precomputed" requires X of '
                    "shape (n_samples, n_samples)."
                )
            if bool(jnp.min(X) < 0):
                raise ValueError("[TorchDR-TPU] ERROR : precomputed affinity has negative entries.")
            self.affinity_in_ = X
            self.NN_indices_ = None
            return
        self.logger.info(
            f"Computing input affinity with {type(self.affinity_in).__name__}."
        )
        if isinstance(self.affinity_in, SparseAffinity):
            affinity, indices = self.affinity_in(X, return_indices=True)
            self.affinity_in_ = affinity
            self.NN_indices_ = indices
        else:
            self.affinity_in_ = self.affinity_in(X)
            self.NN_indices_ = None

    # --- lifecycle hooks (reference: torchdr/affinity_matcher.py:475-489) ---

    def on_affinity_computation_start(self):
        pass

    def on_affinity_computation_end(self):
        pass

    # --- consts / carry for the compiled loop ---

    def _build_consts(self, X: jnp.ndarray) -> Dict:
        """Device constants threaded through the jitted loop."""
        consts = {"P": self.affinity_in_, "n": self.n_samples_in_}
        if self.NN_indices_ is not None:
            consts["NN"] = self.NN_indices_
        if self.encoder is not None:
            consts["X_encoder"] = X
        return consts

    def _init_carry(self, consts: Dict) -> Dict:
        return {}

    # --- embedding init (reference: torchdr/affinity_matcher.py:493-573) ---

    def _init_embedding(self, X: jnp.ndarray) -> jnp.ndarray:
        n = X.shape[0]
        key = self._root_key()

        if self.encoder is not None:
            # Parametric mode: the optimized parameters are the encoder's
            # weights; the embedding is its output (reference: torchdr/
            # affinity_matcher.py:507-513).
            variables = self.encoder.init(key, X[:1])
            Z0 = self.encoder.apply(variables, X[:1])
            if Z0.shape[-1] != self.n_components:
                raise ValueError(
                    f"[TorchDR-TPU] encoder output dim ({Z0.shape[-1]}) != "
                    f"n_components ({self.n_components})."
                )
            self._encoder_variables0_ = variables
            return self.encoder.apply(variables, X)

        if isinstance(self.init, (np.ndarray, jnp.ndarray)) and not isinstance(self.init, str):
            emb = jnp.asarray(self.init, dtype=X.dtype)
        elif self.init in ("normal", "random"):
            emb = jax.random.normal(key, (n, self.n_components), dtype=X.dtype)
        elif self.init == "pca":
            from .models.spectral.pca import PCA

            emb = PCA(n_components=self.n_components)._fit_transform(X)
        elif self.init == "hyperbolic":
            from .utils.manifold import poincare_expmap0

            emb = jax.random.normal(key, (n, self.n_components), dtype=X.dtype)
            return poincare_expmap0(self.init_scaling * emb)
        else:
            raise ValueError(
                f"[TorchDR-TPU] ERROR : init {self.init} not supported in "
                f"{type(self).__name__}."
            )
        std0 = jnp.std(emb[:, 0])
        return self.init_scaling * emb / jnp.where(std0 > 0, std0, 1.0)

    # --- schedules ---

    def _lr_plan(self):
        """(lr_during_ee, lr_after_ee) resolving lr='auto'.

        Auto rule (sklearn t-SNE, reference: torchdr/neighbor_embedding/
        base.py:299-310): max(n / ee_coeff / 4, 50) during exaggeration and
        max(n / 4, 50) after.
        """
        if self.lr == "auto":
            lr_ee = max(self.n_samples_in_ / max(self._ee_coeff, 1.0) / 4.0, 50.0)
            lr_post = max(self.n_samples_in_ / 4.0, 50.0)
            return float(lr_ee), float(lr_post)
        return float(self.lr), float(self.lr)

    def _momentum_plan(self):
        """(momentum_during_ee, momentum_after_ee) for 'auto' SGD kwargs.

        (reference: torchdr/neighbor_embedding/base.py:330-343)
        """
        if self.optimizer_kwargs == "auto":
            if self.optimizer == "SGD":
                return 0.5, 0.8
            return None, None
        kwargs = self.optimizer_kwargs or {}
        m = kwargs.get("momentum", 0.0)
        return m, m

    def _resolved_optimizer_kwargs(self):
        if self.optimizer_kwargs == "auto" or self.optimizer_kwargs is None:
            return {}
        return normalize_optimizer_kwargs(dict(self.optimizer_kwargs))

    def _scheduler_fn(self):
        skw = self.scheduler_kwargs
        if skw == "auto":
            if self.scheduler == "LinearLR":
                skw = {"start_factor": 1.0, "end_factor": 0.0}
            else:
                skw = None
        return make_scheduler(self.scheduler, skw)

    # --- losses / gradients (overridden by subclasses) ---

    def _loss(self, Z, consts, carry, it, key, ee_coeff):
        """Scalar loss; default matches P against affinity_out(Z).

        (reference: torchdr/affinity_matcher.py:434-459)
        """
        if self.affinity_out is None:
            raise ValueError(
                "[TorchDR-TPU] ERROR : affinity_out is not set. "
                "Set it or implement the _loss method."
            )
        kwargs_out = dict(self.kwargs_affinity_out or {})
        kwargs_loss = dict(self.kwargs_loss or {})
        if self.loss_fn == "cross_entropy_loss" and isinstance(self.affinity_out, LogAffinity):
            kwargs_out.setdefault("log", True)
            kwargs_loss.setdefault("log", True)
        Q = self.affinity_out(Z, **kwargs_out)
        loss = LOSS_DICT[self.loss_fn](consts["P"], Q, **kwargs_loss)
        return loss, carry

    def _gradients(self, Z, consts, carry, it, key, ee_coeff):
        raise NotImplementedError(
            "[TorchDR-TPU] ERROR : _gradients must be implemented when "
            "_use_closed_form_gradients is True."
        )

    # --- the compiled optimization loop ---

    def _optimize(self, Z0: jnp.ndarray, consts: Dict, carry0: Dict):
        opt = make_optimizer(self.optimizer)
        base_kwargs = self._resolved_optimizer_kwargs()
        lr_ee, lr_post = self._lr_plan()
        mom_ee, mom_post = self._momentum_plan()
        sched = self._scheduler_fn()

        has_ee = self._ee_coeff > 1.0 and self._ee_iter > 0
        ee_iter = int(self._ee_iter) if has_ee else -1
        ee_coeff = float(self._ee_coeff)
        max_iter = int(self.max_iter)
        check_interval = int(self.check_interval)
        min_grad_norm = float(self.min_grad_norm)
        # scheduler horizon per phase (reference: torchdr/neighbor_embedding/
        # base.py:345-350)
        ee_total = float(min(ee_iter, max_iter)) if has_ee else 1.0
        post_total = float(max_iter - max(ee_iter, 0)) if has_ee else float(max_iter)

        use_closed_form = self._use_closed_form_gradients

        def schedule(it):
            in_ee = jnp.asarray(it <= ee_iter) if has_ee else jnp.asarray(False)
            coeff = jnp.where(in_ee, ee_coeff, 1.0)
            base_lr = jnp.where(in_ee, lr_ee, lr_post)
            t_local = jnp.where(in_ee, it, it - (ee_iter + 1))
            total = jnp.where(in_ee, ee_total, post_total)
            lr_t = base_lr * sched(t_local.astype(jnp.float32), total)
            hyper = dict(base_kwargs)
            if mom_ee is not None:
                hyper["momentum"] = jnp.where(in_ee, mom_ee, mom_post)
            return coeff, lr_t, hyper, in_ee

        # The fit mesh was resolved before the affinity phase; fall back to
        # resolving here when _optimize is driven standalone.
        mesh = (
            self._fit_mesh_ if hasattr(self, "_fit_mesh_") else self._resolve_mesh()
        )
        # Expose the active mesh to loss/gradient hooks so mesh-aware ops
        # (e.g. the row-sharded O(n²) repulsion) can shard their work.
        self._fit_mesh_ = mesh
        if mesh is not None:
            self.logger.info(
                f"SPMD training over {mesh.devices.size} devices "
                f"(axis '{mesh.axis_names[0]}')."
            )
            constrain_rows, constrain_rep = self._mesh_constraints(mesh)
        else:
            constrain_rows = constrain_rep = lambda x: x

        # Static (non-array) const leaves — e.g. n, used in shapes — stay
        # Python values via closure; arrays travel as jit arguments so their
        # shardings propagate.
        static_consts = {
            k: v for k, v in consts.items() if not hasattr(v, "ndim")
        }
        array_consts = {k: v for k, v in consts.items() if hasattr(v, "ndim")}

        # Parametric mode: the optimized pytree is the encoder's weights;
        # the embedding is recomputed from them each step (reference:
        # torchdr/affinity_matcher.py:374-394).
        encoder = self.encoder

        def run(state0, consts_arrays, it_end):
            consts = {**constrain_rows(consts_arrays), **static_consts}

            def to_Z(theta):
                if encoder is None:
                    return theta
                return encoder.apply(theta, consts["X_encoder"])

            def compute_grad(theta, carry, it, key, coeff):
                if use_closed_form:
                    if encoder is None:
                        return self._gradients(theta, consts, carry, it, key, coeff)
                    # analytic dL/dZ, then chain rule through the encoder
                    Z, vjp_fn = jax.vjp(to_Z, theta)
                    dZ, new_carry = self._gradients(Z, consts, carry, it, key, coeff)
                    return vjp_fn(dZ)[0], new_carry

                def loss_fn(theta_v):
                    Z = to_Z(theta_v)
                    loss, new_carry = self._loss(Z, consts, carry, it, key, coeff)
                    return loss, new_carry

                (_, new_carry), grad = jax.value_and_grad(loss_fn, has_aux=True)(theta)
                return grad, new_carry

            def cond(state):
                it, theta, opt_state, key, carry, gn, done = state
                return jnp.logical_and(it < it_end, jnp.logical_not(done))

            def body(state):
                it, theta, opt_state, key, carry, gn, done = state
                key, sub = jax.random.split(key)
                coeff, lr_t, hyper, in_ee = schedule(it)
                if has_ee:
                    # Phase boundary: the reference re-creates the optimizer
                    # at the end of step ee_iter → zero the moments before
                    # step ee_iter + 1.
                    opt_state = lax.cond(
                        it == ee_iter + 1, opt.reset, lambda s: s, opt_state
                    )
                grad, carry = compute_grad(theta, carry, it, sub, coeff)
                carry = constrain_rows(carry)
                theta_new, opt_state = opt.update(grad, opt_state, theta, lr_t, hyper)
                if encoder is None:
                    # keep the embedding replicated: this is where XLA
                    # inserts the gradient all-reduce of the reference's
                    # mechanism 3 (encoder params are replicated anyway)
                    theta_new = constrain_rep(theta_new)
                # The full-array norm reduction is only READ at check steps;
                # computing it every step cost ~5 ms/iter at 1.3M (scalar
                # reduce over (n,2), round-5 xplane autopsy) — run it under
                # a cond and carry the last checked value between checks.
                check = it % check_interval == 0
                gn = lax.cond(
                    check,
                    lambda _: jnp.sqrt(
                        sum(
                            jnp.sum(g * g)
                            for g in jax.tree_util.tree_leaves(grad)
                        )
                    ),
                    lambda _: gn,
                    None,
                )
                done = jnp.logical_and(check, gn < min_grad_norm)
                return it + 1, theta_new, opt_state, key, carry, gn, done

            state = lax.while_loop(cond, body, state0)
            return state, to_Z(state[1])

        theta0 = self._encoder_variables0_ if encoder is not None else Z0
        state0 = (
            jnp.asarray(0, jnp.int32),
            theta0,
            opt.init(theta0),
            self._root_key(),
            carry0,
            jnp.asarray(jnp.inf, jnp.float32),
            jnp.asarray(False),
        )

        # Cache the compiled loop across fits of this instance: a fresh
        # jax.jit wrapper per fit would RECOMPILE the whole while_loop every
        # fit_transform (axon executables are not disk-cacheable — measured
        # ~50 s per recompile at n=60k, dominating "warm" fits).
        cache_key = (
            self.optimizer, str(base_kwargs), float(lr_ee), float(lr_post),
            mom_ee, mom_post, self.scheduler, has_ee, ee_iter, ee_coeff,
            max_iter, check_interval, min_grad_norm, use_closed_form,
            mesh, encoder is not None,
            tuple(sorted((k, str(v)) for k, v in static_consts.items())),
        )
        cached = getattr(self, "_compiled_run_", None)
        if cached is None or cached[0] != cache_key:
            self._compiled_run_ = (cache_key, jax.jit(run))
        runj = self._compiled_run_[1]

        seg = self.max_iters_per_dispatch
        if seg is None:
            state, Z = runj(state0, array_consts, jnp.asarray(max_iter, jnp.int32))
        else:
            # bounded-duration dispatches: one host sync per segment
            state = state0
            done_it = 0
            while done_it < max_iter:
                it_end = min(done_it + int(seg), max_iter)
                state, Z = runj(
                    state, array_consts, jnp.asarray(it_end, jnp.int32)
                )
                done_it = int(state[0])
                if bool(state[6]) or done_it >= max_iter:
                    break
        it, theta, carry, gn = state[0], state[1], state[4], state[5]
        if encoder is not None:
            self.encoder_variables_ = theta
        self._final_carry_ = jax.tree_util.tree_map(lambda x: x, carry)
        return Z, it, gn
