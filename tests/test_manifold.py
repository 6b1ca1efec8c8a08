"""Poincaré-ball manifold property tests.

Mirrors the reference's manifold/RiemannianAdam depth coverage
(reference: torchdr/tests/test_utils.py:262-1150, geoopt-derived ops):
Möbius group identities, expmap/logmap inversion, parallel-transport
isometry, metric properties, and curvature sweeps.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from torchdr_tpu.utils.manifold import (
    egrad2rgrad,
    lambda_x,
    mobius_add,
    poincare_expmap,
    poincare_expmap0,
    poincare_inner,
    poincare_logmap,
    poincare_logmap0,
    poincare_project,
    poincare_ptransp,
    poincare_sqdist,
)

CURVATURES = [0.5, 1.0, 2.0]


def _points(seed, n=32, d=4, scale=0.3):
    """Random points safely inside the ball (radius ~scale)."""
    rng = np.random.default_rng(seed)
    x = rng.normal(size=(n, d)).astype(np.float32)
    x /= np.linalg.norm(x, axis=-1, keepdims=True)
    r = scale * rng.uniform(0.1, 1.0, size=(n, 1)).astype(np.float32)
    return jnp.asarray(x * r)


class TestMobiusGroup:
    @pytest.mark.parametrize("c", CURVATURES)
    def test_zero_is_identity(self, c):
        x = _points(0)
        z = jnp.zeros_like(x)
        assert np.allclose(mobius_add(x, z, c), x, atol=1e-6)
        assert np.allclose(mobius_add(z, x, c), x, atol=1e-6)

    @pytest.mark.parametrize("c", CURVATURES)
    def test_left_inverse(self, c):
        x = _points(1)
        assert np.abs(np.asarray(mobius_add(-x, x, c))).max() < 1e-5

    @pytest.mark.parametrize("c", CURVATURES)
    def test_result_stays_in_ball(self, c):
        x, y = _points(2, scale=0.6), _points(3, scale=0.6)
        r = np.linalg.norm(np.asarray(mobius_add(x, y, c)), axis=-1)
        assert (r < 1.0 / np.sqrt(c) + 1e-6).all()

    def test_left_cancellation(self):
        """(-x) ⊕ (x ⊕ y) = y — the Möbius left-cancellation law."""
        x, y = _points(4), _points(5)
        out = mobius_add(-x, mobius_add(x, y, 1.0), 1.0)
        assert np.allclose(out, y, atol=1e-5)


class TestExpLogMaps:
    @pytest.mark.parametrize("c", CURVATURES)
    def test_expmap0_logmap0_roundtrip(self, c):
        p = _points(6)
        assert np.allclose(poincare_expmap0(poincare_logmap0(p, c), c), p, atol=1e-5)

    @pytest.mark.parametrize("c", CURVATURES)
    def test_logmap0_expmap0_roundtrip(self, c):
        u = _points(7, scale=0.5)  # tangent vector at origin
        assert np.allclose(poincare_logmap0(poincare_expmap0(u, c), c), u, atol=1e-5)

    @pytest.mark.parametrize("c", CURVATURES)
    def test_expmap_reaches_logmap_target(self, c):
        p1, p2 = _points(8), _points(9)
        u = poincare_logmap(p1, p2, c)
        assert np.allclose(poincare_expmap(u, p1, c), p2, atol=1e-4)

    def test_expmap_zero_tangent_is_identity(self):
        p = _points(10)
        assert np.allclose(poincare_expmap(jnp.zeros_like(p), p), p, atol=1e-6)

    def test_tangent_norm_equals_distance(self):
        """‖logmap_p1(p2)‖_{p1} (Riemannian norm) = d(p1, p2)."""
        p1, p2 = _points(11), _points(12)
        u = poincare_logmap(p1, p2, 1.0)
        riem_norm_sq = np.asarray(poincare_inner(p1, u, u, 1.0))[..., 0]
        dist_sq = np.asarray(poincare_sqdist(p1, p2, 1.0))
        assert np.allclose(riem_norm_sq, dist_sq, rtol=1e-3)


class TestMetric:
    def test_sqdist_symmetry_and_zero_diag(self):
        p1, p2 = _points(13), _points(14)
        d12 = np.asarray(poincare_sqdist(p1, p2))
        d21 = np.asarray(poincare_sqdist(p2, p1))
        assert np.allclose(d12, d21, rtol=1e-4)
        assert np.abs(np.asarray(poincare_sqdist(p1, p1))).max() < 1e-6

    def test_lambda_at_origin_is_two(self):
        z = jnp.zeros((3, 4))
        assert np.allclose(lambda_x(z), 2.0)

    def test_lambda_diverges_near_boundary(self):
        p = jnp.asarray([[0.999, 0.0]])
        assert float(lambda_x(p)[0, 0]) > 100.0

    def test_triangle_inequality(self):
        p1, p2, p3 = _points(15), _points(16), _points(17)
        d = lambda a, b: np.sqrt(np.asarray(poincare_sqdist(a, b)))
        assert (d(p1, p3) <= d(p1, p2) + d(p2, p3) + 1e-4).all()

    def test_project_clips_to_ball(self):
        x = jnp.asarray([[2.0, 0.0], [0.0, -3.0], [0.1, 0.1]])
        r = np.linalg.norm(np.asarray(poincare_project(x)), axis=-1)
        assert (r < 1.0).all()
        # interior points untouched
        assert np.allclose(np.asarray(poincare_project(x))[2], [0.1, 0.1])


class TestTransportAndGradient:
    @pytest.mark.parametrize("c", CURVATURES)
    def test_ptransp_preserves_inner_product(self, c):
        """Parallel transport is a gyro-isometry: ⟨u,v⟩_x = ⟨Pu,Pv⟩_y."""
        x, y = _points(18), _points(19)
        u, v = _points(20, scale=0.5), _points(21, scale=0.5)
        lhs = np.asarray(poincare_inner(x, u, v, c))
        pu, pv = poincare_ptransp(x, y, u, c), poincare_ptransp(x, y, v, c)
        rhs = np.asarray(poincare_inner(y, pu, pv, c))
        assert np.allclose(lhs, rhs, rtol=1e-3, atol=1e-5)

    def test_ptransp_from_x_to_x_is_identity(self):
        x, u = _points(22), _points(23)
        assert np.allclose(poincare_ptransp(x, x, u), u, atol=1e-5)

    def test_egrad2rgrad_scaling(self):
        """rgrad = egrad · (1−c‖p‖²)²/4 = egrad / λ_x² — inverse conformal
        metric scaling (geoopt convention)."""
        x, g = _points(24), _points(25)
        expected = np.asarray(g) / np.asarray(lambda_x(x)) ** 2
        assert np.allclose(egrad2rgrad(x, g), expected, rtol=1e-5)

    def test_rgrad_descent_decreases_sqdist(self):
        """Gradient flow on d²(p, target) moves p toward target."""
        target = _points(26, n=8)
        p = _points(27, n=8)

        def loss(p):
            return jnp.sum(poincare_sqdist(p, target))

        for _ in range(50):
            g = jax.grad(loss)(p)
            p = poincare_project(
                poincare_expmap(-0.05 * egrad2rgrad(p, g), p)
            )
        assert float(loss(p)) < 0.01 * float(
            jnp.sum(poincare_sqdist(_points(27, n=8), target))
        )


class TestJitAndShapes:
    def test_all_ops_jit_and_batch(self):
        x, y, u = _points(28), _points(29), _points(30, scale=0.5)
        fns = [
            lambda: jax.jit(mobius_add)(x, y),
            lambda: jax.jit(poincare_sqdist)(x, y),
            lambda: jax.jit(poincare_expmap)(u, x),
            lambda: jax.jit(poincare_logmap)(x, y),
            lambda: jax.jit(poincare_ptransp)(x, y, u),
        ]
        for f in fns:
            out = np.asarray(f())
            assert out.shape[0] == 32 and np.isfinite(out).all()
