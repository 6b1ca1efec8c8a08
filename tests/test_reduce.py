"""Blockwise O(n²) reduction tier (the KeOps replacement) — dedicated
coverage beyond the Pallas interpret tests in test_ops.py."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.scipy.special import logsumexp

from torchdr_tpu.ops.reduce import (
    pairwise_logkernel_logsumexp,
    pairwise_logkernel_rowlse,
    pairwise_logkernel_rowlse_autodiff,
)


@pytest.fixture(scope="module")
def Z():
    return jax.random.normal(jax.random.PRNGKey(0), (257, 2))


def _dense_rowlse(Z, kernel, exclude_diag=True):
    D = jnp.sum((Z[:, None, :] - Z[None, :, :]) ** 2, -1)
    logq = -jnp.log1p(D) if kernel == "student" else -D
    if exclude_diag:
        logq = jnp.where(jnp.eye(Z.shape[0], dtype=bool), -jnp.inf, logq)
    return logsumexp(logq, axis=1)


class TestBlockwiseRowLSE:
    @pytest.mark.parametrize("kernel", ["student", "gaussian"])
    @pytest.mark.parametrize("block", [32, 100, 257, 1024])
    def test_matches_dense_any_block(self, Z, kernel, block):
        ref = _dense_rowlse(Z, kernel)
        got = pairwise_logkernel_rowlse(Z, kernel, True, block)
        assert jnp.abs(ref - got).max() < 1e-5

    @pytest.mark.parametrize("kernel", ["student", "gaussian"])
    def test_include_diag(self, Z, kernel):
        ref = _dense_rowlse(Z, kernel, exclude_diag=False)
        got = pairwise_logkernel_rowlse(Z, kernel, False, 64)
        assert jnp.abs(ref - got).max() < 1e-5

    @pytest.mark.parametrize("kernel", ["student", "gaussian"])
    def test_gradient_matches_dense(self, Z, kernel):
        def f_ref(z):
            return jnp.sum(jnp.cos(_dense_rowlse(z, kernel)))

        def f_blk(z):
            return jnp.sum(jnp.cos(pairwise_logkernel_rowlse(z, kernel, True, 64)))

        g1, g2 = jax.grad(f_ref)(Z), jax.grad(f_blk)(Z)
        assert jnp.abs(g1 - g2).max() < 1e-5

    def test_global_logsumexp(self, Z):
        ref = logsumexp(_dense_rowlse(Z, "student"))
        got = pairwise_logkernel_logsumexp(Z, "student", True, 64)
        assert abs(float(ref - got)) < 1e-5

    def test_unknown_kernel_raises(self, Z):
        with pytest.raises(ValueError, match="kernel"):
            pairwise_logkernel_rowlse(Z, "cauchyish", True, 64)

    def test_second_order_grad_through_autodiff_tier(self, Z):
        """The remat tier must support grad-of-grad (encoders chain
        through it)."""
        Zs = Z[:64] * 0.1

        def loss(z):
            return jnp.sum(
                pairwise_logkernel_rowlse_autodiff(
                    z, lambda D: -jnp.log1p(D), "sqeuclidean", True, 32
                )
            )

        h = jax.grad(lambda z: jnp.sum(jax.grad(loss)(z) ** 2))(Zs)
        assert bool(jnp.isfinite(h).all())


class TestJitStability:
    def test_inside_jit_and_scan(self, Z):
        @jax.jit
        def step(z):
            return logsumexp(pairwise_logkernel_rowlse(z, "student", True, 64))

        v1 = step(Z)
        v2 = step(Z + 0.0)
        assert jnp.allclose(v1, v2)
