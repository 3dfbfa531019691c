"""Pallas kernel correctness tests (interpreter mode on CPU; the same code
compiles to Mosaic on TPU)."""

import numpy as np
import jax
import jax.numpy as jnp

from globalegomocap_tpu.ops.pallas.heatmap_sample import (
    heatmap_sample_pallas)
from globalegomocap_tpu.ops.sampling import (
    grid_sample_bilinear, grid_sample_bilinear_dense)


rng = np.random.default_rng(0)


def test_forward_matches_reference_sampling():
    n = 300  # not a multiple of BLOCK: exercises the padded tail
    maps = rng.normal(size=(n, 64, 64)).astype(np.float32)
    pts = rng.uniform(-1.3, 1.3, size=(n, 2)).astype(np.float32)
    out = heatmap_sample_pallas(jnp.asarray(maps), jnp.asarray(pts))
    ref = grid_sample_bilinear(jnp.asarray(maps), jnp.asarray(pts))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-4,
                               atol=1e-5)


def test_gradient_matches_dense():
    n = 64
    maps = jnp.asarray(rng.normal(size=(n, 32, 32)).astype(np.float32))
    pts = jnp.asarray(rng.uniform(-0.9, 0.9, size=(n, 2))
                      .astype(np.float32))

    def loss_pallas(p):
        return jnp.sum(heatmap_sample_pallas(maps, p) ** 2)

    def loss_dense(p):
        return jnp.sum(grid_sample_bilinear_dense(maps, p) ** 2)

    ga = jax.grad(loss_pallas)(pts)
    gb = jax.grad(loss_dense)(pts)
    np.testing.assert_allclose(np.asarray(ga), np.asarray(gb), rtol=1e-3,
                               atol=1e-4)


def test_under_jit_and_vmap():
    maps = jnp.asarray(rng.normal(size=(4, 30, 16, 16)).astype(np.float32))
    pts = jnp.asarray(rng.uniform(-0.8, 0.8, size=(4, 30, 2))
                      .astype(np.float32))
    out = jax.jit(jax.vmap(heatmap_sample_pallas))(maps, pts)
    ref = jax.vmap(grid_sample_bilinear)(maps, pts)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-4,
                               atol=1e-5)
