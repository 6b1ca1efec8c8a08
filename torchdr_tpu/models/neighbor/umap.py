"""UMAP.

TPU-native UMAP (reference: torchdr/neighbor_embedding/umap.py:39-292).
Closed-form gradients; the per-edge ``epochs_per_sample`` update schedule —
a mutated buffer in the reference (umap.py:251-256) — is a CLOSED FORM of
the step counter here (visits of an edge slice happen on a fixed period, so
the burst count is floor(now/eps) − floor((now−period)/eps); no carried
state at all) inside the single compiled ``lax.while_loop``, and negative
sampling draws from the threaded PRNG key. Attraction + repulsion together
are a handful of gathers and fused VPU ops per step; no host round-trips
anywhere in the fit.
"""

from __future__ import annotations

from typing import Dict, Optional, Union

import jax.numpy as jnp
import numpy as np
from jax import lax

from ...affinity.knn_normalized import UMAPAffinity
from .base import NegativeSamplingNeighborEmbedding


def find_ab_params(spread: float, min_dist: float):
    """Fit (a, b) of the output kernel 1/(1 + a d^{2b}) to the offset
    exponential, as in the UMAP reference implementation
    (reference: torchdr/neighbor_embedding/umap.py:19-36).
    """
    from scipy.optimize import curve_fit

    def curve(x, a, b):
        return 1.0 / (1.0 + a * x ** (2 * b))

    xv = np.linspace(0, spread * 3, 300)
    yv = np.zeros(xv.shape)
    yv[xv < min_dist] = 1.0
    yv[xv >= min_dist] = np.exp(-(xv[xv >= min_dist] - min_dist) / spread)
    params, _ = curve_fit(curve, xv, yv)
    return float(params[0]), float(params[1])


class UMAP(NegativeSamplingNeighborEmbedding):
    """UMAP (McInnes et al. 2018; Damrich & Hamprecht 2021 formulation).

    Loss: -Σ_ij P_ij log Q_ij + Σ_{i, j ∈ Neg(i)} log(1 - Q_ij) with
    Q_ij = (1 + a d²ᵇ)⁻¹, optimized with closed-form gradients and the
    per-edge epochs_per_sample schedule.
    """

    _use_closed_form_gradients = True

    def __init__(
        self,
        n_neighbors: float = 30,
        n_components: int = 2,
        min_dist: float = 0.1,
        spread: float = 1.0,
        a: Optional[float] = None,
        b: Optional[float] = None,
        lr: float = 1e0,
        optimizer: str = "SGD",
        optimizer_kwargs: Union[Dict, str, None] = None,
        scheduler: Optional[str] = "LinearLR",
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
        negative_sample_rate: int = 5,
        check_interval: int = 50,
        knn_mode: str = "exact",
        knn_precision: str = "highest",
        max_graph_degree: Optional[int] = None,
        discard_NNs: bool = False,
        shared_negatives: bool = True,
        n_shared_negatives: Optional[int] = None,
        edge_groups: Union[int, str] = "auto",
        edge_schedule: str = "auto",
        **kwargs,
    ):
        self.n_neighbors = n_neighbors
        self.min_dist = min_dist
        self.spread = spread
        self.metric = metric
        self.max_iter_affinity = max_iter_affinity
        self.negative_sample_rate = negative_sample_rate
        self.edge_groups = edge_groups
        self.edge_schedule = edge_schedule
        self._eps = 1e-3

        if a is None or b is None:
            a, b = find_ab_params(spread, min_dist)
        self._a = a
        self._b = b

        self.knn_mode = knn_mode
        self.knn_precision = knn_precision
        # Hub points can give the symmetrized fuzzy graph a per-row width of
        # hundreds of columns; every training-step gather scales with that
        # width. Cap it at the strongest ``max_graph_degree`` edges per row
        # (default 4·n_neighbors) — bounded memory, umap-learn-grade quality
        # (60k benchmark: caps 240/120/64 all reach silhouette 0.9995; 120 is
        # 22% faster end-to-end than 240).
        self.max_graph_degree = (
            int(max_graph_degree) if max_graph_degree is not None else 4 * int(n_neighbors)
        )

        affinity_in = UMAPAffinity(
            n_neighbors=n_neighbors,
            metric=metric,
            max_iter=max_iter_affinity,
            device=device,
            verbose=verbose,
            sparsity=True,
            knn_mode=knn_mode,
            knn_precision=knn_precision,
            max_degree=self.max_graph_degree,
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
            check_interval=check_interval,
            discard_NNs=discard_NNs,
            n_negatives=int(negative_sample_rate * n_neighbors),
            shared_negatives=shared_negatives,
            n_shared_negatives=n_shared_negatives,
            **kwargs,
        )

    # --- epochs_per_sample schedule (reference: umap.py:215-234) ---

    def on_affinity_computation_end(self):
        """Structurally prune dead edges before building training state.

        The reference masks edges with P ≤ max(P)/max_iter to infinity in
        ``epochs_per_sample`` but keeps them resident (umap.py:219-231).
        Hub points can make the symmetrized width huge (hundreds of columns,
        dominated by these never-firing edges); on TPU that width multiplies
        every per-step gather buffer. Since a masked edge can never fire, we
        drop it from the padded representation entirely — same trajectory,
        a fraction of the memory and per-step gather work.
        """
        P = jnp.asarray(self.affinity_in_)
        NN = jnp.asarray(self.NN_indices_)
        A_max = jnp.max(P)
        threshold = A_max / self.max_iter
        keep = (P > threshold) & (NN >= 0)
        kept = int(jnp.max(jnp.sum(keep, axis=1)))
        k_new = max(8, -(-kept // 8) * 8)
        k_new = min(k_new, max(8, -(-self.max_graph_degree // 8) * 8))
        if k_new < P.shape[1]:
            self.logger.info(
                f"Pruning affinity width {P.shape[1]} -> {k_new} "
                f"(threshold + max_graph_degree={self.max_graph_degree})."
            )
            # strongest edges first (dead edges have P·keep = 0 → sort last)
            order = jnp.argsort(-jnp.where(keep, P, 0.0), axis=1, stable=True)[
                :, :k_new
            ]
            keep_s = jnp.take_along_axis(keep, order, axis=1)
            self.affinity_in_ = jnp.where(
                keep_s, jnp.take_along_axis(P, order, axis=1), 0.0
            )
            self.NN_indices_ = jnp.where(
                keep_s, jnp.take_along_axis(NN, order, axis=1), -1
            )
        super().on_affinity_computation_end()

    def _edge_groups_for(self, n: int) -> int:
        """Resolve ``edge_groups="auto"``: rotate 4 edge groups once n is
        large enough that the per-step neighbor gather dominates the loop.

        Quality evidence (round 3, benchmarks/_umap_quality_r3.py,
        _umap_1p3m_r3.py, _umap_1p3m_groups.py): G=4 matches G=1 on
        input-graph neighborhood preservation AND trustworthiness at both
        north-star configs (60k x 784: 0.1169 vs 0.1164; 1.3M x 50:
        0.0039 vs 0.0035), and G=12 at 1.3M keeps preservation
        (0.0050 vs G=4's 0.0036) and silhouette (0.980 vs 0.989) while
        cutting the warm fit 218 s -> 130 s — the attraction gather is
        index-bound (~6.5 ns/index at 1.3M), so gathered-edge count is
        the only lever. Small datasets keep G=1 (exact per-step
        schedule, cost is negligible there).
        """
        if self.edge_groups == "auto":
            if n >= 500_000:
                return 12
            return 4 if n >= 50_000 else 1
        return max(1, int(self.edge_groups))

    def _edge_schedule_for(self, n: int) -> str:
        """Resolve ``edge_schedule="auto"``.

        ``"groups"`` (auto default at n ≥ 50k): round-robin column
        rotation with exact catch-up bursts — measured fastest at every
        scale. ``"bands"`` (opt-in): power-of-two band scheduling — edge
        (i, j) with fire period eps is visited every 2^band steps,
        band = floor(log2(eps)), so the expected gathered-edge count per
        step is Σ_b W_b/2^b; strong edges are visited EVERY step (finest
        temporal granularity on the neighbor mass). Round-4 A/B
        (_umap_1p3m_bands.py, /tmp 60k sweep → docs/ROUND4_STATUS.md):
        bands' ``lax.switch`` over band-prefix widths costs a 556 s cold
        compile at 60k (4-7 big branch programs) and loses warm at both
        scales (60k: 19.8 s vs groups4 11.6 s; 1.3M: 264 s vs groups12
        82 s) for a ≤2% preservation edge (0.1157 vs 0.1133; 0.0048 vs
        0.0050) — groups is the default, bands stays for schedule-
        fidelity studies. ``"exact"``: visit every edge every step.
        """
        if self.edge_schedule == "auto":
            return "groups" if self._edge_groups_for(n) > 1 else "exact"
        if self.edge_schedule not in ("bands", "groups", "exact"):
            raise ValueError(
                f"[TorchDR-TPU] ERROR : unknown edge_schedule "
                f"'{self.edge_schedule}' (bands | groups | exact | auto)."
            )
        if self.edge_schedule != "groups" and self.edge_groups != "auto":
            import warnings

            warnings.warn(
                f"[TorchDR-TPU] edge_groups={self.edge_groups!r} is ignored "
                f"with edge_schedule='{self.edge_schedule}' (groups only "
                f"apply to the 'groups' schedule).",
                UserWarning,
                stacklevel=2,
            )
        return self.edge_schedule

    def _shared_negative_count(self, n: int) -> int:
        if self.n_shared_negatives is not None:
            return int(self.n_shared_negatives)
        # S=512 matches S=2048 on silhouette/preservation at 60k+ (rounds
        # 2-3) and keeps the (n, S) chain cheap; small n keeps the base
        # class's wider sample (variance matters more, cost is trivial).
        if n > 20_000:
            return 512
        return super()._shared_negative_count(n)

    #: number of power-of-two bands; the weakest band is visited every
    #: 2^(N_BANDS-1) = 64 steps, bounding its per-step cost at W/64.
    _N_BANDS = 7

    def _build_consts(self, X):
        consts = super()._build_consts(X)
        P = self.affinity_in_
        NN = jnp.asarray(self.NN_indices_)

        sched = self._edge_schedule_for(P.shape[0])
        consts["edge_schedule"] = sched
        if sched == "bands":
            A_max = jnp.max(P)
            threshold = A_max / self.max_iter
            small = P <= threshold  # also covers the -1 padding slots (P == 0)
            eps_per_sample = jnp.where(small, jnp.inf, A_max / (P + 1e-3))
            # Per-row sort by fire period ascending: band b then occupies a
            # row prefix, so "visit bands ≤ z" is a rectangular prefix slice.
            order = jnp.argsort(eps_per_sample, axis=1, stable=True)
            eps_per_sample = jnp.take_along_axis(eps_per_sample, order, axis=1)
            P = jnp.take_along_axis(P, order, axis=1)
            NN = jnp.take_along_axis(NN, order, axis=1)
            consts["P"] = P
            # gather-safe indices: dead/pad edges (eps=inf → c=0) contribute
            # zero regardless of which row they gather
            consts["NN"] = jnp.maximum(NN, 0)
            consts["epochs_per_sample"] = eps_per_sample
            band = jnp.clip(
                jnp.floor(jnp.log2(jnp.maximum(eps_per_sample, 1.0))),
                0,
                self._N_BANDS - 1,
            )
            band = jnp.where(jnp.isfinite(eps_per_sample), band, self._N_BANDS - 1)
            W_full = P.shape[1]
            # Quantile widths, NOT the max: a single hub row whose edges are
            # all strong would otherwise force every prefix to full width
            # (observed at 1.3M: widths [120]*7 — the schedule silently
            # degenerated to exact). Rows beyond the quantile have their
            # over-width edges DEMOTED to the first band whose prefix
            # reaches their column; the catch-up burst in _attr_core applies
            # the missed fires at each visit, so total impulse is exact for
            # ANY monotone widths — only the temporal granularity of the
            # demoted 2% coarsens.
            widths = []
            for z in range(self._N_BANDS):
                w = int(jnp.quantile(jnp.sum(band <= z, axis=1), 0.98))
                w = min(W_full, max(8, -(-w // 8) * 8))
                if widths:
                    w = max(w, widths[-1])
                widths.append(w)
            widths[-1] = W_full  # every edge rides the last prefix
            consts["band_widths"] = tuple(widths)
            # fixed per-column visit period 2^z_first(col) (see
            # _attractive_gradients_bands)
            cols = np.arange(W_full)
            zf = np.full(W_full, self._N_BANDS - 1)
            for z in reversed(range(self._N_BANDS)):
                zf = np.where(cols < widths[z], z, zf)
            consts["band_period"] = jnp.asarray(
                (2.0 ** zf)[None, :], jnp.float32
            )
            consts["edge_groups_G"] = 1
            consts["edge_group_width"] = 1  # active_edges carries row sums
            if self.verbose:
                exp_w = sum(
                    widths[z] * (2.0 ** -(z + 1)) for z in range(self._N_BANDS - 1)
                ) + widths[-1] * 2.0 ** -(self._N_BANDS - 1)
                self.logger.info(
                    f"Band schedule widths {widths} "
                    f"(expected gather width/step {exp_w:.1f} of {W_full})."
                )
            return consts

        G = self._edge_groups_for(P.shape[0]) if sched == "groups" else 1
        consts["edge_groups_G"] = G
        W = P.shape[1]
        if G > 1:
            # Rotating edge groups: step t touches only the columns of group
            # t % G, cutting the per-step neighbor gather (the measured
            # bottleneck) by G×. Columns are dealt round-robin so each
            # group holds a strength-balanced slice (rows are sorted
            # strongest-first by the pruning above); fire events missed
            # between visits are applied as catch-up bursts (exact total
            # impulse, see _attractive_gradients).
            #
            # State is stacked (G, n, W), NOT (n, G·W): the per-step group
            # slice is then a MAJOR-axis dynamic index (one tile-aligned
            # contiguous block) instead of a 10-lane column window of a
            # 120-lane array — the strided column slice + its layout-copy
            # repack cost ~10 ms/iter at 1.3M (round-5 xplane autopsy).
            k = P.shape[1]
            W = -(-k // G)
            pad = G * W - k
            n_rows = P.shape[0]
            if pad:
                P = jnp.concatenate([P, jnp.zeros((n_rows, pad), P.dtype)], 1)
                NN = jnp.concatenate(
                    [NN, jnp.full((n_rows, pad), -1, NN.dtype)], 1
                )
            # (n, W, G)[:, :, g] = columns g::G — the round-robin deal
            P = jnp.transpose(P.reshape(n_rows, W, G), (2, 0, 1))
            NN = jnp.transpose(NN.reshape(n_rows, W, G), (2, 0, 1))
            consts["P"] = P  # keep P/NN aligned for any consumer
        # gather-safe indices (see bands path note)
        consts["NN"] = jnp.maximum(NN, 0)
        consts["edge_group_width"] = W

        A_max = jnp.max(P)
        threshold = A_max / self.max_iter
        small = P <= threshold  # also covers the -1 padding slots (P == 0)
        eps_per_sample = jnp.where(small, jnp.inf, A_max / (P + 1e-3))
        consts["epochs_per_sample"] = eps_per_sample
        return consts

    def _init_carry(self, consts):
        carry = super()._init_carry(consts)
        # Attraction computes per-edge fire counts; repulsion consumes them.
        # (The visit schedule itself is closed-form — no eons carry.)
        W = consts["edge_group_width"]
        carry["active_edges"] = jnp.zeros((consts["n"], W), jnp.float32)
        return carry

    # --- closed-form gradients (reference: umap.py:236-292) ---

    def _attr_core(self, Z, NN, eps, period, it):
        """Closed-form attraction over one (n, W) edge slice.

        Returns (grad, per-edge fire counts c). The per-edge update schedule
        is DETERMINISTIC (visits of this slice happen every ``period``
        steps), so the reference's mutated ``epoch_of_next_sample`` buffer
        (reference: umap.py:251-256) has a closed form: the catch-up burst
        at step ``it`` is the number of fire events k·eps in
        (now−period, now], i.e. ``floor(now/eps) − floor(max(now−period,0)
        /eps)`` — algebraically identical to the old eons recurrence
        (eons₀ = eps; due/floor/advance), with no carried state. The eons
        carry cost an (n, G·W) f32 loop buffer plus slice/update/copy
        fusions every step (~9 ms/iter at 1.3M, round-5 xplane autopsy).
        Exact for ANY fixed-period visit schedule; dead/pad edges carry
        eps=inf so now/inf = 0 gives c = 0 with no masking.
        """
        # Gather the neighbor embeddings ONCE and derive distances from the
        # same buffer. NN is pre-clamped in _build_consts (dead/pad edges
        # carry eps=inf so their c=0 zeroes the contribution) — a per-step
        # jnp.maximum materialized an (n, W) s32 copy every iteration.
        diff = Z[:, None, :] - Z[NN]
        D = jnp.sum(diff * diff, axis=-1)
        positive = D > 0
        # single pow: D^(b-1) = D^b / D
        t = D**self._b
        coef = 2.0 * self._a * self._b * t / (
            jnp.maximum(D, 1e-20) * (1.0 + self._a * t)
        )
        coef = jnp.where(positive, coef, 0.0)

        now = jnp.asarray(it + 1, eps.dtype)
        prev = jnp.maximum(now - period, 0.0)
        c = jnp.floor(now / eps) - jnp.floor(prev / eps)
        coef = coef * c
        # VPU multiply+reduce, NOT einsum: a dot_general over the tiny d=2
        # contraction would put the loop body in transposed {0,1:T(2,128)}
        # layouts with (n,2)/(n,W) layout copies around every step.
        grad = jnp.clip(jnp.sum(diff * coef[:, :, None], axis=1), -4.0, 4.0)
        return grad, c

    def _attractive_gradients_bands(self, Z, consts, carry, it):
        """Band-scheduled attraction: step t visits the row prefix holding
        every band b with t % 2^b == 0 — i.e. prefix width
        band_widths[trailing_zeros(t)] — via a ``lax.switch`` over the
        static prefix widths. Expected gathered-edge count per step is
        Σ_b W_b/2^b instead of the full width; strong edges (band 0) are
        visited every step so the neighbor mass sees no burst quantization.

        A column c edge is visited exactly at the steps t ≡ 0 (mod
        2^z_first(c)), z_first(c) = first z with widths[z] > c — a fixed
        per-column period (``band_period``), so _attr_core's closed-form
        burst count applies with no eons carry.
        """
        widths = consts["band_widths"]
        NN_full = consts["NN"]
        eps_full = consts["epochs_per_sample"]
        per_full = consts["band_period"]
        n = NN_full.shape[0]

        uniq = sorted(set(widths))
        z_to_branch = jnp.asarray([uniq.index(w) for w in widths], jnp.int32)

        def make_branch(Wz):
            def branch(Z):
                NN = lax.slice(NN_full, (0, 0), (n, Wz))
                eps = lax.slice(eps_full, (0, 0), (n, Wz))
                per = lax.slice(per_full, (0, 0), (1, Wz))
                grad, c = self._attr_core(Z, NN, eps, per, it)
                return grad, jnp.sum(c, axis=1)

            return branch

        it32 = jnp.asarray(it, jnp.int32)
        # trailing zeros; it=0 -> popcount(-1) = 32 -> capped to the last band
        tz = lax.population_count(jnp.bitwise_and(it32, -it32) - 1)
        z = jnp.minimum(tz, len(widths) - 1)
        grad, fires = lax.switch(
            z_to_branch[z], [make_branch(w) for w in uniq], Z
        )
        carry = dict(carry, active_edges=fires[:, None])
        return grad, carry

    def _attractive_gradients(self, Z, consts, carry, it, key):
        if consts.get("edge_schedule") == "bands":
            return self._attractive_gradients_bands(Z, consts, carry, it)
        G = consts["edge_groups_G"]
        eps_full = consts["epochs_per_sample"]
        if G > 1:
            # stacked (G, n, W) state: the group slice is one contiguous
            # major-axis block (see _build_consts)
            g = jnp.mod(it, G)
            NN = lax.dynamic_index_in_dim(consts["NN"], g, 0, keepdims=False)
            eps = lax.dynamic_index_in_dim(eps_full, g, 0, keepdims=False)
        else:
            NN, eps = consts["NN"], eps_full

        # Per-edge update schedule: stronger edges fire more often. With
        # edge groups, fires missed since the last visit are applied as one
        # catch-up burst of count c = #{due fire events} — the integrated
        # impulse matches the reference's every-step schedule exactly
        # (closed form, see _attr_core).
        grad, c = self._attr_core(
            Z, NN, eps, jnp.asarray(float(G), jnp.float32), it
        )
        carry = dict(carry, active_edges=c)
        return grad, carry

    def _use_fused_repulsion(self, Z, S: int) -> bool:
        """Fused Pallas repulsion: TPU backend, single device (GSPMD-sharded
        Z would need a shard_map wrapper), lane-aligned S, small d."""
        import jax as _jax

        return (
            _jax.default_backend() not in ("cpu",)
            and getattr(self, "_fit_mesh_", None) is None
            and S % 128 == 0
            and Z.shape[1] <= 8
        )

    def _repulsive_gradients(self, Z, consts, carry, it, key):
        # Per-point count of negatives due this step: negative_sample_rate
        # per fired positive edge (reference: umap.py:266-292).
        neg_counts = jnp.sum(carry["active_edges"], axis=1) * self.negative_sample_rate

        if self.shared_negatives:
            import jax as _jax

            n = consts["n"]
            S = self._shared_negative_count(int(n))
            if self._use_fused_repulsion(Z, S):
                # Fused Pallas kernel: same draw, same coefficient chain and
                # clip, but direct-difference distances (no gram cancellation)
                # and zero (n, S) HBM intermediates (ops/pallas/umap_kernel.py).
                from ...ops.pallas.umap_kernel import fused_shared_repulsion

                neg = _jax.random.randint(key, (S,), 0, n)
                w = neg_counts.astype(jnp.float32) / S
                grad = fused_shared_repulsion(
                    Z, neg, w, self._a, self._b, self._eps
                )
                return grad, carry
            # TPU-shaped redesign of the repulsion (NOT a translation): all
            # points repel against ONE per-step uniform sample of S points,
            # each weighted by neg_counts_i / S — identical expected force to
            # per-point sampling, far lower variance (S ≫ rate·k), and the
            # per-point random gathers (the measured round-1 bottleneck,
            # ~0.5M 8-byte rows/ms) become two MXU matmuls:
            #   D = ‖z_i‖² + ‖z_s‖² − 2 Z Zₛᵀ ;  grad = (Σ_s c) z_i − c Zₛ.
            D, valid, Zneg = self._shared_negative_sqdists(Z, consts, key)
            S = D.shape[1]
            coef = -2.0 * self._b / (
                (D + self._eps) * (1.0 + self._a * D**self._b)
            )
            coef = jnp.where(valid, coef, 0.0)
            coef = coef * (neg_counts.astype(jnp.float32) / S)[:, None]
            grad = jnp.clip(
                jnp.sum(coef, axis=1)[:, None] * Z
                - jnp.matmul(coef, Zneg, preferred_element_type=jnp.float32),
                -4.0,
                4.0,
            )
            return grad, carry

        neg = self._sample_negatives(key, consts)
        diff = Z[:, None, :] - Z[neg]
        D = jnp.sum(diff * diff, axis=-1)
        coef = -2.0 * self._b / ((D + self._eps) * (1.0 + self._a * D**self._b))

        # Keep negative_sample_rate negative edges per active positive edge.
        col = jnp.arange(self.n_negatives)
        coef = jnp.where(col[None, :] >= neg_counts[:, None], 0.0, coef)

        # VPU multiply+reduce — see _attr_core: an einsum's dot_general
        # forces transposed layouts over the whole loop body
        grad = jnp.clip(jnp.sum(diff * coef[:, :, None], axis=1), -4.0, 4.0)
        return grad, carry
