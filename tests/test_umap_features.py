"""UMAP round-2 features: shared negatives, edge groups, degree capping."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import torchdr_tpu as tdr


@pytest.fixture(scope="module")
def blobs():
    rng = np.random.default_rng(0)
    centers = rng.normal(scale=8.0, size=(4, 10))
    X = np.concatenate(
        [c + rng.normal(size=(60, 10)) for c in centers]
    ).astype(np.float32)
    y = np.repeat(np.arange(4), 60)
    return X, y


class TestSharedNegatives:
    def test_quality_parity_with_perpoint(self, blobs):
        X, y = blobs
        s_shared = tdr.silhouette_score(
            np.asarray(
                tdr.UMAP(n_neighbors=12, max_iter=300, random_state=0,
                         shared_negatives=True).fit_transform(X)
            ), y,
        )
        s_pp = tdr.silhouette_score(
            np.asarray(
                tdr.UMAP(n_neighbors=12, max_iter=300, random_state=0,
                         shared_negatives=False).fit_transform(X)
            ), y,
        )
        assert s_shared > 0.8 and s_pp > 0.8

    def test_custom_S(self, blobs):
        X, y = blobs
        Z = tdr.UMAP(n_neighbors=12, max_iter=100, random_state=0,
                     n_shared_negatives=64).fit_transform(X)
        assert np.isfinite(np.asarray(Z)).all()

    def test_largevis_and_infotsne_shared(self, blobs):
        X, y = blobs
        for cls, kw in [
            (tdr.LargeVis, dict(perplexity=12)),
            (tdr.InfoTSNE, dict(perplexity=12, n_negatives=40)),
        ]:
            Z = cls(max_iter=200, random_state=0, shared_negatives=True,
                    **kw).fit_transform(X)
            assert tdr.silhouette_score(np.asarray(Z), y) > 0.5

    def test_shared_negative_force_is_unbiased(self):
        """The shared estimator's expected repulsive gradient must match the
        full (all-pairs) gradient: average many shared samples and compare
        to the exhaustive negative set."""
        from torchdr_tpu.models.neighbor.umap import UMAP

        rng = np.random.default_rng(0)
        n = 64
        model = UMAP(n_neighbors=8, max_iter=10, random_state=0)
        model._a, model._b = 1.5, 0.9
        # spread Z out so per-pair coefficients are small and the ±4 clip
        # (which breaks naive expectation comparisons) never activates
        Z = jnp.asarray(5.0 * rng.normal(size=(n, 2)).astype(np.float32))
        consts = {"n": n}
        neg_counts = jnp.full((n,), 5.0)
        carry = {"active_edges": jnp.ones((n, 1)) * 5.0}
        model.negative_sample_rate = 1  # counts already folded in

        # exhaustive "sample": every point as negative, weight 5/n each
        model.n_shared_negatives = None

        def exhaustive():
            D = jnp.sum((Z[:, None, :] - Z[None, :, :]) ** 2, -1)
            coef = -2.0 * model._b / (
                (D + model._eps) * (1.0 + model._a * D**model._b)
            )
            coef = jnp.where(jnp.eye(n, dtype=bool), 0.0, coef)
            coef = coef * (5.0 / n)
            return jnp.clip(
                jnp.sum(coef, 1)[:, None] * Z - coef @ Z, -4.0, 4.0
            )

        g_true = exhaustive()
        model.n_shared_negatives = 64
        acc = jnp.zeros_like(Z)
        reps = 300
        for r in range(reps):
            g, _ = model._repulsive_gradients(
                Z, consts, carry, 0, jax.random.PRNGKey(r)
            )
            acc = acc + g
        g_mean = acc / reps
        # unbiasedness up to Monte-Carlo error (clip is rarely active here)
        scale = float(jnp.abs(g_true).max())
        assert float(jnp.abs(g_mean - g_true).max()) < 0.2 * scale + 1e-4


class TestEdgeGroups:
    def test_g1_matches_legacy_semantics(self, blobs):
        """edge_groups=1 must reproduce the ungrouped schedule exactly
        (same seed → same embedding)."""
        X, y = blobs
        Z1 = np.asarray(
            tdr.UMAP(n_neighbors=12, max_iter=150, random_state=0,
                     edge_groups=1).fit_transform(X)
        )
        Z2 = np.asarray(
            tdr.UMAP(n_neighbors=12, max_iter=150, random_state=0).fit_transform(X)
        )
        assert np.allclose(Z1, Z2, atol=1e-6)

    @pytest.mark.parametrize("G", [2, 4])
    def test_quality_holds_on_clustered_data(self, blobs, G):
        X, y = blobs
        Z = tdr.UMAP(n_neighbors=12, max_iter=300, random_state=0,
                     edge_groups=G).fit_transform(X)
        assert tdr.silhouette_score(np.asarray(Z), y) > 0.8

    def test_catchup_counts(self):
        """The closed-form burst count floor(now/eps) − floor((now−G)/eps)
        equals the number of fire events k·eps in (now−G, now], so the
        integrated impulse matches the every-step schedule."""
        eps = jnp.asarray([[1.0, 2.5, jnp.inf, 4.0]])
        # first visit of this slice covers (0, 8]: fires = #{k ≥ 1 : k·eps ≤ 8}
        now, period = 8.0, 8.0
        prev = max(now - period, 0.0)
        c = jnp.floor(now / eps) - jnp.floor(prev / eps)
        assert np.allclose(np.asarray(c)[0], [8.0, 3.0, 0.0, 2.0])

    def test_closed_form_matches_eons_recurrence(self):
        """The closed form must reproduce the eons recurrence (eons₀ = eps;
        due = now − eons; c = ⌊due/eps⌋ + 1 if due ≥ 0; eons += c·eps) at
        every visit of an every-G-steps schedule, for awkward eps values."""
        rng = np.random.default_rng(0)
        # eps = A_max/(P + 1e-3) ≥ ~1 by construction; sub-1 eps (many
        # fires per step) hit float division-boundary jitter where the two
        # formulations can differ by one fire — outside the real domain.
        eps = np.concatenate(
            [rng.uniform(0.9, 60.0, 40), [np.inf, 1.0, 2.0, 2.5]]
        )
        for G in (1, 2, 5, 12):
            eons = eps.copy()
            eps_safe = np.where(np.isfinite(eps), eps, 1.0)
            for it in range(G - 1, 240, G):  # visits of group g = G-1
                now = it + 1.0
                due = now - eons
                c_rec = np.where(
                    (due >= 0) & np.isfinite(eps),
                    np.floor(due / eps_safe) + 1.0,
                    0.0,
                )
                eons = eons + c_rec * eps_safe * (c_rec > 0)
                prev = max(now - G, 0.0)
                with np.errstate(divide="ignore"):
                    c_closed = np.floor(now / eps) - np.floor(prev / eps)
                np.testing.assert_allclose(c_closed, c_rec, err_msg=f"G={G} it={it}")


class TestDegreeCap:
    def test_max_graph_degree_bounds_width(self, blobs):
        X, y = blobs
        m = tdr.UMAP(n_neighbors=12, max_iter=20, random_state=0,
                     max_graph_degree=16)
        m.n_samples_in_, m.n_features_in_ = X.shape
        m._compute_input_affinity(jnp.asarray(X))
        m.on_affinity_computation_end()
        assert m.NN_indices_.shape[1] <= 16

    def test_affinity_level_cap(self, blobs):
        from torchdr_tpu.affinity import UMAPAffinity

        X, y = blobs
        vals, idx = UMAPAffinity(n_neighbors=12, max_degree=16)(
            X, return_indices=True
        )
        assert idx.shape[1] <= 16
        # capped rows keep their strongest edges: values sorted desc-ish
        v = np.asarray(vals)
        assert (v[:, 0] + 1e-6 >= v[:, -1]).all()


class TestBandSchedule:
    """Power-of-two band scheduling (round 3): edge (i, j) with fire period
    eps is visited every 2^band steps, band = floor(log2(eps)); step t's
    visit set is the per-row band prefix of width band_widths[tz(t)]."""

    def test_quality_holds_on_clustered_data(self, blobs):
        X, y = blobs
        Z = tdr.UMAP(n_neighbors=12, max_iter=300, random_state=0,
                     edge_schedule="bands").fit_transform(X)
        assert tdr.silhouette_score(np.asarray(Z), y) > 0.8

    def test_band_widths_monotone_and_cover(self, blobs):
        X, y = blobs
        m = tdr.UMAP(n_neighbors=12, max_iter=100, random_state=0,
                     edge_schedule="bands")
        m.clear_memory = lambda: None  # keep affinity_in_/NN_indices_ alive
        m.fit(X)  # populates affinity_in_ / NN_indices_
        consts = m._build_consts(jnp.asarray(X))
        widths = consts["band_widths"]
        W_full = consts["P"].shape[1]
        # monotone non-decreasing, 8-aligned (except the final full width),
        # last prefix covers every column
        assert len(widths) == m._N_BANDS
        assert all(widths[z] <= widths[z + 1] for z in range(len(widths) - 1))
        assert all(w % 8 == 0 or w == W_full for w in widths)
        assert widths[-1] == W_full
        # every edge's band lies inside its prefix: band b edges occupy
        # columns < widths[b] after the per-row eps sort
        eps = np.asarray(consts["epochs_per_sample"])
        band = np.where(
            np.isfinite(eps),
            np.clip(np.floor(np.log2(np.maximum(eps, 1.0))), 0, m._N_BANDS - 1),
            m._N_BANDS - 1,
        ).astype(int)
        cols = np.arange(eps.shape[1])[None, :]
        for z in range(m._N_BANDS):
            # Widths are 0.98-quantiles of the per-row band counts (a max
            # would let one hub row degenerate every prefix to full width);
            # rows beyond the quantile have their over-width edges demoted
            # to deeper bands (exact via catch-up bursts). Invariant: at
            # most ~2% of rows may have band-z edges past prefix z.
            escaped = np.any((cols >= widths[z]) & (band <= z), axis=1)
            assert escaped.mean() <= 0.021, (
                f"band {z}: {escaped.mean():.1%} of rows escape the prefix"
            )
        # the deepest prefix covers every edge
        assert widths[-1] == eps.shape[1]

    def test_visit_schedule_total_impulse(self):
        """Simulate the per-edge carry over T steps under band visits and
        check each edge's total fire count equals the exact every-step
        schedule's count: #{k >= 1 : k*eps <= T}."""
        from torchdr_tpu.models.neighbor.umap import UMAP

        T = 256
        eps_vals = np.array([1.0, 1.7, 2.5, 5.0, 13.0, 40.0, 90.0, np.inf])
        bands = np.where(
            np.isfinite(eps_vals),
            np.clip(np.floor(np.log2(np.maximum(eps_vals, 1.0))), 0,
                    UMAP._N_BANDS - 1),
            UMAP._N_BANDS - 1,
        ).astype(int)
        eons = eps_vals.copy()
        fires = np.zeros_like(eps_vals)
        # eps=inf rows never fire (c==0 there), so dividing/multiplying by
        # a sanitized eps is exact and keeps the mirror warning-clean
        eps_safe = np.where(np.isfinite(eps_vals), eps_vals, 1.0)
        for it in range(T):
            tz = UMAP._N_BANDS - 1 if it == 0 else min(
                (it & -it).bit_length() - 1, UMAP._N_BANDS - 1)
            visited = bands <= tz
            now = it + 1.0
            due = now - eons
            c = np.where((due >= 0) & visited & np.isfinite(eps_vals),
                         np.floor(due / eps_safe) + 1.0, 0.0)
            eons = eons + c * eps_safe
            fires += c
        exact = np.where(np.isfinite(eps_vals),
                         np.floor(T / eps_vals), 0.0)
        # An edge's fire can lag by at most one visit period (2^band steps):
        # total impulse is never lost, only deferred by < one period.
        lag = exact - fires
        assert np.all(lag >= 0) and np.all(lag <= 1), (fires, exact)
        # running the schedule one extra full period catches every edge up
        for it in range(T, T + 2 ** (UMAP._N_BANDS - 1)):
            tz = min((it & -it).bit_length() - 1, UMAP._N_BANDS - 1)
            visited = bands <= tz
            due = it + 1.0 - eons
            c = np.where((due >= 0) & visited & np.isfinite(eps_vals),
                         np.floor(due / eps_safe) + 1.0, 0.0)
            eons = eons + c * eps_safe
            fires += c
        assert np.all(fires >= exact), (fires, exact)

    def test_trailing_zeros_dispatch(self):
        """The in-jit trailing-zeros branch index matches the host formula."""
        from jax import lax

        for it in range(0, 130):
            it32 = jnp.asarray(it, jnp.int32)
            tz = int(lax.population_count(jnp.bitwise_and(it32, -it32) - 1))
            host = 32 if it == 0 else (it & -it).bit_length() - 1
            assert tz == host, (it, tz, host)
