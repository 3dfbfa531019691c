"""Fixed-iteration (scan-based) L-BFGS tests."""

import numpy as np
import jax
import jax.numpy as jnp

from globalegomocap_tpu.optimize.lbfgs import (
    lbfgs_minimize, lbfgs_minimize_fixed)


def test_solves_quadratic():
    A = jnp.asarray(np.diag([1.0, 10.0, 100.0]).astype(np.float32))
    b = jnp.asarray([1.0, -2.0, 3.0])

    def loss(x):
        return 0.5 * x @ A @ x - b @ x

    res = lbfgs_minimize_fixed(loss, jnp.zeros(3), max_iter=50)
    expected = np.linalg.solve(np.asarray(A), np.asarray(b))
    np.testing.assert_allclose(np.asarray(res.x), expected, atol=1e-3)


def test_close_to_adaptive_on_nonconvex():
    rng = np.random.default_rng(2)
    W = jnp.asarray(rng.normal(size=(10, 10)).astype(np.float32) * 0.4)
    t = jnp.asarray(rng.normal(size=(10,)).astype(np.float32))

    def loss(x):
        return jnp.sum((W @ jnp.tanh(x) - t) ** 2) + 0.01 * jnp.sum(x ** 2)

    x0 = jnp.zeros(10)
    f_adaptive = float(lbfgs_minimize(loss, x0, max_iter=25).f)
    f_fixed = float(lbfgs_minimize_fixed(loss, x0, max_iter=25).f)
    assert f_fixed <= f_adaptive * 1.5 + 1e-3, (f_fixed, f_adaptive)


def test_fused_probes_identical_trajectory():
    """fused_probes folds the accepted-point value_and_grad into the probe
    batch — the solver trajectory must be unchanged."""
    rng = np.random.default_rng(4)
    W = jnp.asarray(rng.normal(size=(10, 10)).astype(np.float32) * 0.4)
    t = jnp.asarray(rng.normal(size=(10,)).astype(np.float32))

    def loss(x):
        return jnp.sum((W @ jnp.tanh(x) - t) ** 2) + 0.01 * jnp.sum(x ** 2)

    x0 = jnp.asarray(rng.normal(size=(10,)).astype(np.float32))
    r0 = lbfgs_minimize_fixed(loss, x0, max_iter=15)
    r1 = lbfgs_minimize_fixed(loss, x0, max_iter=15, fused_probes=True)
    np.testing.assert_allclose(np.asarray(r1.x), np.asarray(r0.x),
                               rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(float(r1.f), float(r0.f),
                               rtol=1e-5, atol=1e-8)
    assert int(r1.n_evals) < int(r0.n_evals)


def test_compact_direction_equals_two_loop():
    """The compact (Byrd-Nocedal-Schnabel) direction must equal the
    two-loop recursion for every history fill level."""
    from globalegomocap_tpu.optimize.lbfgs import (
        _two_loop_direction, _compact_direction)
    rng = np.random.default_rng(7)
    m, dim = 8, 24
    for n_valid in (0, 1, 3, 8):
        s = np.zeros((m, dim), np.float32)
        y = np.zeros((m, dim), np.float32)
        valid = np.zeros((m,), bool)
        for i in range(m - n_valid, m):   # newest slots filled (roll order)
            si = rng.normal(size=dim).astype(np.float32)
            yi = si * rng.uniform(0.5, 2.0) + \
                rng.normal(size=dim).astype(np.float32) * 0.1
            if float(si @ yi) <= 1e-10:
                yi = si  # force positive curvature
            s[i], y[i], valid[i] = si, yi, True
        rho = np.where(valid, 1.0 / np.maximum(
            np.sum(s * y, -1), 1e-12), 0.0).astype(np.float32)
        g = jnp.asarray(rng.normal(size=dim).astype(np.float32))

        d0 = _two_loop_direction(g, jnp.asarray(s), jnp.asarray(y),
                                 jnp.asarray(rho), jnp.asarray(valid))
        d1 = _compact_direction(g, jnp.asarray(s), jnp.asarray(y),
                                jnp.asarray(valid))
        np.testing.assert_allclose(np.asarray(d1), np.asarray(d0),
                                   rtol=1e-4, atol=1e-5)


def test_compact_direction_solver_trajectory():
    """End-to-end: compact_direction=True reaches the same solution."""
    rng = np.random.default_rng(8)
    W = jnp.asarray(rng.normal(size=(10, 10)).astype(np.float32) * 0.4)
    t = jnp.asarray(rng.normal(size=(10,)).astype(np.float32))

    def loss(x):
        return jnp.sum((W @ jnp.tanh(x) - t) ** 2) + 0.01 * jnp.sum(x ** 2)

    x0 = jnp.asarray(rng.normal(size=(10,)).astype(np.float32))
    r0 = lbfgs_minimize_fixed(loss, x0, max_iter=15, fused_probes=True)
    r1 = lbfgs_minimize_fixed(loss, x0, max_iter=15, fused_probes=True,
                              compact_direction=True)
    # per-iteration directions are equal (unit test above), but fp-level
    # differences can flip a candidate pick over many iterations; require
    # the same solution QUALITY
    np.testing.assert_allclose(float(r1.f), float(r0.f),
                               rtol=1e-2, atol=1e-6)
    assert float(r1.f) <= float(r0.f) * 1.01 + 1e-6


def test_circular_history_identical_trajectory():
    """circular_history replaces the per-iteration roll copies with a
    pointer row write — the trajectory must be bit-compatible (same
    history contents in a different slot order)."""
    rng = np.random.default_rng(11)
    W = jnp.asarray(rng.normal(size=(12, 12)).astype(np.float32) * 0.4)
    t = jnp.asarray(rng.normal(size=(12,)).astype(np.float32))

    def loss(x):
        return jnp.sum((W @ jnp.tanh(x) - t) ** 2) + 0.01 * jnp.sum(x ** 2)

    x0 = jnp.asarray(rng.normal(size=(12,)).astype(np.float32))
    # history smaller than max_iter so the buffer wraps (the pointer
    # arithmetic's hard case), plus fused_probes (the production config)
    for m in (3, 5, 25):
        r0 = lbfgs_minimize_fixed(loss, x0, max_iter=15, history_size=m,
                                  fused_probes=True)
        r1 = lbfgs_minimize_fixed(loss, x0, max_iter=15, history_size=m,
                                  fused_probes=True, circular_history=True)
        np.testing.assert_allclose(np.asarray(r1.x), np.asarray(r0.x),
                                   rtol=1e-5, atol=1e-7)
        np.testing.assert_allclose(float(r1.f), float(r0.f),
                                   rtol=1e-6, atol=1e-9)


def test_circular_two_loop_equals_rolled():
    """The pointer-indexed two-loop must equal the rolled two-loop for
    every pointer position and fill level."""
    from globalegomocap_tpu.optimize.lbfgs import (
        _two_loop_direction, _two_loop_direction_circular)
    rng = np.random.default_rng(13)
    m, dim = 6, 16
    for n_valid in (0, 2, 6):
        for ptr in (0, 2, 5):
            # build the rolled layout (newest at m-1, oldest-valid first)
            s = np.zeros((m, dim), np.float32)
            y = np.zeros((m, dim), np.float32)
            valid = np.zeros((m,), bool)
            for i in range(m - n_valid, m):
                si = rng.normal(size=dim).astype(np.float32)
                yi = si * rng.uniform(0.5, 2.0)
                s[i], y[i], valid[i] = si, yi, True
            rho = np.where(valid, 1.0 / np.maximum(
                np.sum(s * y, -1), 1e-12), 0.0).astype(np.float32)
            g = jnp.asarray(rng.normal(size=dim).astype(np.float32))
            d0 = _two_loop_direction(g, jnp.asarray(s), jnp.asarray(y),
                                     jnp.asarray(rho), jnp.asarray(valid))
            # circular layout: slot (ptr-1-k) % m holds the k-th newest
            perm = np.asarray([(ptr - 1 - k) % m for k in range(m)])
            sc = np.zeros_like(s)
            yc = np.zeros_like(y)
            rhoc = np.zeros_like(rho)
            vc = np.zeros((m,), bool)
            for k in range(m):
                sc[perm[k]] = s[m - 1 - k]
                yc[perm[k]] = y[m - 1 - k]
                rhoc[perm[k]] = rho[m - 1 - k]
                vc[perm[k]] = valid[m - 1 - k]
            d1 = _two_loop_direction_circular(
                g, jnp.asarray(sc), jnp.asarray(yc), jnp.asarray(rhoc),
                jnp.asarray(vc), jnp.asarray(ptr, jnp.int32))
            np.testing.assert_allclose(np.asarray(d1), np.asarray(d0),
                                       rtol=1e-5, atol=1e-6)


def test_vmap_batch():
    centers = jnp.asarray(np.random.default_rng(0).normal(
        size=(12, 6)).astype(np.float32))

    def solve(center, x0):
        return lbfgs_minimize_fixed(
            lambda x: jnp.sum((x - center) ** 2 * jnp.arange(1, 7)),
            x0, max_iter=30).x

    out = jax.vmap(solve)(centers, jnp.zeros((12, 6)))
    np.testing.assert_allclose(np.asarray(out), np.asarray(centers),
                               atol=1e-3)


def test_deterministic_iteration_count():
    def loss(x):
        return jnp.sum((x - 1.0) ** 2)

    res = lbfgs_minimize_fixed(loss, jnp.zeros(4), max_iter=7)
    assert int(res.n_iter) == 7


def test_pallas_direction_equals_two_loop():
    """The fused Pallas two-loop kernel (interpret mode on CPU) must match
    the XLA two-loop recursion for every history fill level, incl. the
    valid-slot masking and the gamma scaling."""
    from globalegomocap_tpu.optimize.lbfgs import _two_loop_direction
    from globalegomocap_tpu.ops.pallas.lbfgs_direction import (
        lbfgs_direction_pallas)
    rng = np.random.default_rng(7)
    m, dim = 8, 24
    for n_valid in (0, 1, 3, 8):
        s = np.zeros((m, dim), np.float32)
        y = np.zeros((m, dim), np.float32)
        valid = np.zeros((m,), bool)
        for i in range(m - n_valid, m):
            si = rng.normal(size=dim).astype(np.float32)
            yi = si * rng.uniform(0.5, 2.0) + \
                rng.normal(size=dim).astype(np.float32) * 0.1
            if float(si @ yi) <= 1e-10:
                yi = si
            s[i], y[i], valid[i] = si, yi, True
        rho = np.where(valid, 1.0 / np.maximum(
            np.sum(s * y, -1), 1e-12), 0.0).astype(np.float32)
        g = jnp.asarray(rng.normal(size=dim).astype(np.float32))
        d0 = _two_loop_direction(g, jnp.asarray(s), jnp.asarray(y),
                                 jnp.asarray(rho), jnp.asarray(valid))
        d1 = lbfgs_direction_pallas(g, jnp.asarray(s), jnp.asarray(y),
                                    jnp.asarray(rho), jnp.asarray(valid))
        np.testing.assert_allclose(np.asarray(d1), np.asarray(d0),
                                   rtol=1e-4, atol=1e-5)


def test_pallas_direction_vmapped_batch():
    """Under vmap (the solver's production use) the batching rule turns
    the lane axis into the kernel grid; results must match per-lane."""
    from globalegomocap_tpu.optimize.lbfgs import _two_loop_direction
    from globalegomocap_tpu.ops.pallas.lbfgs_direction import (
        lbfgs_direction_pallas)
    rng = np.random.default_rng(3)
    b, m, dim = 5, 6, 32
    s = rng.normal(size=(b, m, dim)).astype(np.float32) * 0.1
    y = (s + rng.normal(size=(b, m, dim)).astype(np.float32) * 0.03)
    rho = (1.0 / np.sum(s * y, -1)).astype(np.float32)
    valid = np.ones((b, m), bool)
    g = rng.normal(size=(b, dim)).astype(np.float32)
    args = tuple(jnp.asarray(a) for a in (g, s, y, rho, valid))
    ref = jax.vmap(_two_loop_direction)(*args)
    pal = jax.vmap(lbfgs_direction_pallas)(*args)
    np.testing.assert_allclose(np.asarray(pal), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)


def test_pallas_direction_solver_trajectory():
    """End-to-end: pallas_direction=True reaches the same solution
    quality (fp reduction-order differences can flip a candidate pick,
    so assert quality not bitwise equality)."""
    rng = np.random.default_rng(8)
    W = jnp.asarray(rng.normal(size=(10, 10)).astype(np.float32) * 0.4)
    t = jnp.asarray(rng.normal(size=(10,)).astype(np.float32))

    def loss(x):
        return jnp.sum((W @ jnp.tanh(x) - t) ** 2) + 0.01 * jnp.sum(x ** 2)

    x0 = jnp.asarray(rng.normal(size=(10,)).astype(np.float32))
    r0 = lbfgs_minimize_fixed(loss, x0, max_iter=15, fused_probes=True)
    r1 = lbfgs_minimize_fixed(loss, x0, max_iter=15, fused_probes=True,
                              pallas_direction=True)
    np.testing.assert_allclose(float(r1.f), float(r0.f),
                               rtol=1e-2, atol=1e-6)
    assert float(r1.f) <= float(r0.f) * 1.01 + 1e-6


def test_pallas_direction_batched_pad_path():
    """The lane-blocked batched kernel pads B up to the block multiple;
    results for B=13 (pad 3 at LANE_BLOCK=8) must match per-lane XLA."""
    from globalegomocap_tpu.optimize.lbfgs import _two_loop_direction
    from globalegomocap_tpu.ops.pallas.lbfgs_direction import (
        lbfgs_direction_pallas_batched)
    rng = np.random.default_rng(5)
    b, m, dim = 13, 6, 32
    s = rng.normal(size=(b, m, dim)).astype(np.float32) * 0.1
    y = (s + rng.normal(size=(b, m, dim)).astype(np.float32) * 0.03)
    rho = (1.0 / np.sum(s * y, -1)).astype(np.float32)
    valid = np.ones((b, m), bool)
    g = rng.normal(size=(b, dim)).astype(np.float32)
    ref = jax.vmap(_two_loop_direction)(
        jnp.asarray(g), jnp.asarray(s), jnp.asarray(y), jnp.asarray(rho),
        jnp.asarray(valid))
    pal = lbfgs_direction_pallas_batched(
        jnp.asarray(g), jnp.asarray(s), jnp.asarray(y), jnp.asarray(rho),
        jnp.asarray(valid))
    assert pal.shape == (b, dim)
    np.testing.assert_allclose(np.asarray(pal), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)


def test_circular_history_incompatible_with_direction_variants():
    """pallas/compact direction readers assume rolled history layout;
    combining them with pointer-order circular buffers must raise
    (ADVICE r2 low) rather than silently corrupt descent directions."""
    import pytest
    from globalegomocap_tpu.optimize.lbfgs import lbfgs_minimize_fixed

    def f(x):
        return jnp.sum(x ** 2)

    x0 = jnp.ones((4,))
    for bad in ({"pallas_direction": True}, {"compact_direction": True}):
        with pytest.raises(ValueError, match="circular_history"):
            lbfgs_minimize_fixed(f, x0, max_iter=2,
                                 circular_history=True, **bad)


def test_unroll_identical_trajectory():
    """lax.scan unroll is a scheduling knob only — the solver trajectory
    must be bitwise-stable across unroll factors (incl. a non-divisor of
    max_iter), for both the vmapped and the explicitly-batched solver."""
    from globalegomocap_tpu.optimize.lbfgs import (
        lbfgs_minimize_fixed_batched)
    rng = np.random.default_rng(11)
    W = jnp.asarray(rng.normal(size=(10, 10)).astype(np.float32) * 0.4)
    t = jnp.asarray(rng.normal(size=(10,)).astype(np.float32))

    def loss(x):
        return jnp.sum((W @ jnp.tanh(x) - t) ** 2) + 0.01 * jnp.sum(x ** 2)

    x0 = jnp.asarray(rng.normal(size=(10,)).astype(np.float32))
    r1 = lbfgs_minimize_fixed(loss, x0, max_iter=15, fused_probes=True)
    for u in (2, 4):
        ru = lbfgs_minimize_fixed(loss, x0, max_iter=15, fused_probes=True,
                                  unroll=u)
        np.testing.assert_array_equal(np.asarray(ru.x), np.asarray(r1.x))
        assert float(ru.f) == float(r1.f)

    # explicitly-batched variant: (R, B, d) objective
    xb = jnp.asarray(rng.normal(size=(4, 10)).astype(np.float32))

    def vg_batch(z3):
        def be(z3_):
            return jax.vmap(jax.vmap(loss))(z3_)
        vals, pull = jax.vjp(be, z3)
        (gz,) = pull(jnp.ones_like(vals))
        return vals, gz

    b1 = lbfgs_minimize_fixed_batched(vg_batch, xb, max_iter=15)
    b3 = lbfgs_minimize_fixed_batched(vg_batch, xb, max_iter=15, unroll=4)
    np.testing.assert_array_equal(np.asarray(b3.x), np.asarray(b1.x))
