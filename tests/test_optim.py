"""Functional optimizer/scheduler tests with torch.optim as the oracle.

The engine's phase switching relies on update semantics matching
torch.optim exactly (reference tuning transfers); verify step-by-step
against torch on random gradient sequences.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from torchdr_tpu.utils.optim import make_optimizer
from torchdr_tpu.utils.schedulers import make_scheduler


def _run_ours(name, grads, lr, hyper):
    opt = make_optimizer(name)
    p = jnp.zeros(grads[0].shape)
    state = opt.init(p)
    for g in grads:
        p, state = opt.update(jnp.asarray(g), state, p, lr, hyper)
    return np.asarray(p)


def _run_torch(optimizer_cls, grads, lr, **kwargs):
    p = torch.zeros(grads[0].shape, dtype=torch.float64)
    p.requires_grad_(True)
    opt = optimizer_cls([p], lr=lr, **kwargs)
    for g in grads:
        opt.zero_grad()
        p.grad = torch.as_tensor(g, dtype=torch.float64)
        opt.step()
    return p.detach().numpy()


@pytest.fixture
def grads():
    rng = np.random.default_rng(0)
    return [rng.normal(size=(7,)).astype(np.float64) for _ in range(10)]


class TestOptimizers:
    @pytest.mark.parametrize("momentum", [0.0, 0.5, 0.9])
    def test_sgd_matches_torch(self, grads, momentum):
        ours = _run_ours("SGD", grads, 0.1, {"momentum": momentum})
        theirs = _run_torch(torch.optim.SGD, grads, 0.1, momentum=momentum)
        assert np.abs(ours - theirs).max() < 1e-5

    def test_adam_matches_torch(self, grads):
        ours = _run_ours("Adam", grads, 0.05, {})
        theirs = _run_torch(torch.optim.Adam, grads, 0.05)
        assert np.abs(ours - theirs).max() < 1e-5

    def test_adamw_matches_torch(self, grads):
        ours = _run_ours("AdamW", grads, 0.05, {"weight_decay": 1e-2})
        theirs = _run_torch(torch.optim.AdamW, grads, 0.05, weight_decay=1e-2)
        assert np.abs(ours - theirs).max() < 1e-4

    def test_reset_zeroes_moments(self):
        opt = make_optimizer("SGD")
        p = jnp.zeros((3,))
        state = opt.init(p)
        p, state = opt.update(jnp.ones((3,)), state, p, 0.1, {"momentum": 0.9})
        state = opt.reset(state)
        assert float(jnp.abs(state["buf"]).max()) == 0.0
        assert int(state["step"]) == 0

    def test_unknown_optimizer_raises(self):
        with pytest.raises(ValueError, match="not supported"):
            make_optimizer("Bogus")

    def test_riemannian_adam_stays_on_ball(self):
        import jax

        opt = make_optimizer("RiemannianAdam")
        p = 0.9 * jax.random.normal(jax.random.PRNGKey(0), (20, 2))
        p = p / (1.0 + jnp.linalg.norm(p, axis=1, keepdims=True))
        state = opt.init(p)
        for i in range(20):
            g = jax.random.normal(jax.random.PRNGKey(i), p.shape)
            p, state = opt.update(g, state, p, 0.1, {})
        assert float(jnp.linalg.norm(p, axis=1).max()) < 1.0


class TestSchedulers:
    def test_linear_matches_torch(self):
        sched = make_scheduler("LinearLR", {"start_factor": 1.0, "end_factor": 0.0})
        p = torch.zeros(1, requires_grad=True)
        opt = torch.optim.SGD([p], lr=1.0)
        tsched = torch.optim.lr_scheduler.LinearLR(
            opt, start_factor=1.0, end_factor=0.0, total_iters=10
        )
        for t in range(10):
            torch_lr = opt.param_groups[0]["lr"]
            ours = float(sched(jnp.asarray(float(t)), jnp.asarray(10.0)))
            assert abs(ours - torch_lr) < 1e-6, (t, ours, torch_lr)
            opt.step()
            tsched.step()

    def test_exponential(self):
        sched = make_scheduler("ExponentialLR", {"gamma": 0.9})
        assert abs(float(sched(jnp.asarray(3.0), jnp.asarray(10.0))) - 0.9**3) < 1e-6

    def test_none_is_constant(self):
        sched = make_scheduler(None)
        assert float(sched(jnp.asarray(7.0), jnp.asarray(10.0))) == 1.0

    def test_unknown_raises(self):
        with pytest.raises(ValueError, match="Scheduler"):
            make_scheduler("Bogus")


class TestLBFGS:
    """Fixed-step two-loop L-BFGS (the reference's SEA LBFGS branch analog,
    torchdr/affinity/entropic.py:437-577)."""

    @pytest.mark.slow
    def test_quadratic_beats_adam(self):
        rng = np.random.default_rng(0)
        A = rng.normal(size=(30, 30))
        A = jnp.asarray(A @ A.T / 30 + np.eye(30), jnp.float32)
        b = jnp.asarray(rng.normal(size=30), jnp.float32)

        def resid(name, lr):
            opt = make_optimizer(name)
            x = jnp.zeros(30)
            st = opt.init(x)
            for _ in range(60):
                x, st = opt.update(A @ x - b, st, x, lr, {})
            return float(jnp.linalg.norm(A @ x - b))

        assert resid("LBFGS", 1.0) < 1e-4
        assert resid("LBFGS", 1.0) < resid("Adam", 0.1) / 100

    def test_reset_clears_history(self):
        opt = make_optimizer("LBFGS")
        x = jnp.ones(8)
        st = opt.init(x)
        x, st = opt.update(x * 2.0, st, x, 0.1, {})
        x, st = opt.update(x * 2.0, st, x, 0.1, {})
        st2 = opt.reset(st)
        assert int(st2["step"]) == 0
        assert float(jnp.abs(st2["rho"]).max()) == 0.0

    def test_sea_lbfgs_matches_adam(self):
        from torchdr_tpu.affinity import SymmetricEntropicAffinity

        rng = np.random.default_rng(1)
        X = jnp.asarray(rng.normal(size=(100, 6)).astype(np.float32))
        Pa = SymmetricEntropicAffinity(perplexity=12, optimizer="Adam", max_iter=800)(X)
        Pl = SymmetricEntropicAffinity(
            perplexity=12, optimizer="LBFGS", lr=0.5, max_iter=300
        )(X)
        assert float(jnp.max(jnp.abs(jnp.exp(Pa) - jnp.exp(Pl)))) < 1e-4

    def test_jit_compatible(self):
        opt = make_optimizer("LBFGS")

        @jax.jit
        def step(x, st):
            return opt.update(2.0 * x, st, x, 0.5, {})

        x = jnp.ones(5)
        st = opt.init(x)
        for _ in range(5):
            x, st = step(x, st)
        assert bool(jnp.isfinite(x).all())


class TestLBFGSMinimize:
    """Full L-BFGS solver with strong-Wolfe line search (the analog of the
    reference's torch.optim.LBFGS(line_search_fn='strong_wolfe') branch,
    torchdr/affinity/entropic.py:500-530, run entirely on-device)."""

    def test_rosenbrock_pytree(self):
        from torchdr_tpu.utils.optim import lbfgs_minimize

        def f(p):
            x, y = p
            return (1.0 - x) ** 2 + 100.0 * (y - x * x) ** 2

        x0 = (jnp.asarray(-1.2), jnp.asarray(1.0))
        (x, y), fv, k = lbfgs_minimize(
            jax.value_and_grad(f), x0, max_iter=200, tol=1e-5
        )
        assert abs(float(x) - 1.0) < 1e-2 and abs(float(y) - 1.0) < 1e-2
        assert float(fv) < 1e-4
        assert int(k) < 200  # converged before the cap

    def test_quadratic_fast_and_monotone(self):
        from torchdr_tpu.utils.optim import lbfgs_minimize

        rng = np.random.default_rng(3)
        A = rng.normal(size=(40, 40))
        A = jnp.asarray(A @ A.T / 40 + np.eye(40), jnp.float32)
        b = jnp.asarray(rng.normal(size=40), jnp.float32)

        def f(x):
            return 0.5 * x @ A @ x - b @ x

        x0 = jnp.zeros(40)
        x, fv, k = lbfgs_minimize(jax.value_and_grad(f), x0, max_iter=100, tol=1e-5)
        assert float(jnp.linalg.norm(A @ x - b)) < 1e-3
        assert float(fv) <= float(f(x0))  # never ends above the start
        assert int(k) <= 60

    def test_line_search_survives_steep_start(self):
        # unit step at x0 overshoots by ~1e4: the Wolfe search must backtrack
        from torchdr_tpu.utils.optim import lbfgs_minimize

        def f(x):
            return jnp.sum(jnp.cosh(5.0 * x))

        x0 = jnp.full((4,), 2.0)
        x, fv, _ = lbfgs_minimize(jax.value_and_grad(f), x0, max_iter=100, tol=1e-5)
        assert bool(jnp.isfinite(fv))
        assert float(jnp.max(jnp.abs(x))) < 1e-3

    def test_sea_dual_value_envelope_identity(self):
        # jax.grad of the explicit dual objective must reproduce the
        # first-order dual gradients the Adam path ascends with.
        from torchdr_tpu.affinity.entropic import sea_dual_value, _log_Pse
        from torchdr_tpu.ops.reductions import entropy as entropy_red

        rng = np.random.default_rng(5)
        X = rng.normal(size=(40, 4)).astype(np.float32)
        C = jnp.asarray(((X[:, None] - X[None]) ** 2).sum(-1))
        eps = jnp.asarray(rng.uniform(0.5, 2.0, 40).astype(np.float32))
        mu = jnp.asarray(rng.normal(size=40).astype(np.float32))
        target = jnp.log(12.0) + 1.0

        for eps_square in (True, False):
            g_eps, g_mu = jax.grad(
                lambda e, m: sea_dual_value(C, e, m, eps_square, target),
                argnums=(0, 1),
            )(eps, mu)
            log_P = _log_Pse(C, eps, mu, eps_square)
            H = entropy_red(log_P, log=True)
            ref_eps = H - target
            if eps_square:
                ref_eps = 2.0 * eps * ref_eps
            ref_mu = jnp.sum(jnp.exp(log_P), axis=1) - 1.0
            np.testing.assert_allclose(g_eps, ref_eps, rtol=2e-3, atol=2e-3)
            np.testing.assert_allclose(g_mu, ref_mu, rtol=2e-3, atol=2e-3)

    def test_sea_lbfgs_hits_entropy_target(self):
        from torchdr_tpu.affinity import SymmetricEntropicAffinity
        from torchdr_tpu.ops.reductions import entropy as entropy_red

        rng = np.random.default_rng(7)
        X = jnp.asarray(rng.normal(size=(80, 5)).astype(np.float32))
        aff = SymmetricEntropicAffinity(perplexity=10, optimizer="LBFGS", max_iter=200)
        log_P = aff(X, log=True) + np.log(80)  # un-do the 1/n normalization
        H = np.asarray(entropy_red(jnp.asarray(log_P), log=True))
        target = np.log(10.0) + 1.0
        assert np.abs(H - target).max() < 0.05
