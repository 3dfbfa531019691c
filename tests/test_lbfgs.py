"""Batched L-BFGS tests: correctness on analytic problems, vmap behaviour,
and a head-to-head against torch.optim.LBFGS on identical objectives."""

import numpy as np
import jax
import jax.numpy as jnp

from globalegomocap_tpu.optimize import lbfgs_minimize, adam_minimize


class TestQuadratic:
    def test_solves_quadratic_exactly(self):
        A = jnp.asarray(np.diag([1.0, 10.0, 100.0]).astype(np.float32))
        b = jnp.asarray([1.0, -2.0, 3.0])

        def loss(x):
            return 0.5 * x @ A @ x - b @ x

        res = lbfgs_minimize(loss, jnp.zeros(3), max_iter=50)
        expected = np.linalg.solve(np.asarray(A), np.asarray(b))
        np.testing.assert_allclose(np.asarray(res.x), expected, atol=1e-4)

    def test_rosenbrock(self):
        def loss(x):
            return jnp.sum(100.0 * (x[1:] - x[:-1] ** 2) ** 2
                           + (1 - x[:-1]) ** 2)

        res = lbfgs_minimize(loss, jnp.zeros(6), max_iter=200, lr=1.0,
                             tolerance_change=1e-9)
        np.testing.assert_allclose(np.asarray(res.x), np.ones(6), atol=1e-3)

    def test_vmap_batch(self):
        """Each lane minimizes its own shifted quadratic."""
        centers = jnp.asarray(np.random.default_rng(0).normal(
            size=(16, 8)).astype(np.float32))

        def loss_for(center):
            return lambda x: jnp.sum((x - center) ** 2 * jnp.arange(1, 9))

        def solve(center, x0):
            return lbfgs_minimize(loss_for(center), x0, max_iter=30).x

        x0 = jnp.zeros((16, 8))
        out = jax.vmap(solve)(centers, x0)
        # tolerance_change=1e-6 on f gives ~1e-3 precision on x
        np.testing.assert_allclose(np.asarray(out), np.asarray(centers),
                                   atol=1e-3)

    def test_jit_and_convergence_counters(self):
        def loss(x):
            return jnp.sum((x - 3.0) ** 2)

        res = jax.jit(lambda x0: lbfgs_minimize(loss, x0))(jnp.zeros(4))
        np.testing.assert_allclose(np.asarray(res.x), 3.0, atol=1e-5)
        assert int(res.n_iter) <= 3
        assert float(res.grad_norm) < 1e-4


class TestVsTorch:
    def test_matches_torch_on_smooth_nonconvex(self):
        """Same objective, same hyperparameters: final loss should agree to
        high accuracy with torch.optim.LBFGS(strong_wolfe)."""
        import torch

        rng = np.random.default_rng(1)
        W1 = rng.normal(size=(12, 12)).astype(np.float32) * 0.3
        W2 = rng.normal(size=(12, 12)).astype(np.float32) * 0.3
        target = rng.normal(size=(12,)).astype(np.float32)
        x0 = rng.normal(size=(12,)).astype(np.float32)

        def jloss(x):
            h = jnp.tanh(jnp.asarray(W1) @ x)
            y = jnp.asarray(W2) @ h
            return jnp.sum((y - jnp.asarray(target)) ** 2)

        res = lbfgs_minimize(jloss, jnp.asarray(x0), max_iter=25, lr=2.0)

        tx = torch.nn.Parameter(torch.tensor(x0))
        opt = torch.optim.LBFGS([tx], lr=2.0, max_iter=25,
                                tolerance_change=1e-6,
                                line_search_fn="strong_wolfe")

        tW1, tW2, tt = map(torch.tensor, (W1, W2, target))

        def closure():
            opt.zero_grad()
            loss = torch.sum((tW2 @ torch.tanh(tW1 @ tx) - tt) ** 2)
            loss.backward()
            return loss

        tloss = opt.step(closure)
        final_torch = float(torch.sum(
            (tW2 @ torch.tanh(tW1 @ tx) - tt) ** 2))
        final_jax = float(res.f)
        # both should have essentially minimized; compare achieved losses
        assert final_jax <= final_torch * 1.5 + 1e-4, \
            (final_jax, final_torch)


class TestAdam:
    def test_adam_minimizes_quadratic(self):
        def loss(x):
            return jnp.sum((x - 2.0) ** 2)

        res = adam_minimize(loss, jnp.zeros(5), steps=400, lr=0.1)
        np.testing.assert_allclose(np.asarray(res.x), 2.0, atol=1e-2)
