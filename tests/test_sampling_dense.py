"""Dense (MXU) bilinear sampling must match the gather implementation and
torch grid_sample everywhere, including out-of-bounds."""

import numpy as np
import jax
import jax.numpy as jnp

from globalegomocap_tpu.ops.sampling import (
    grid_sample_bilinear, grid_sample_bilinear_dense)


rng = np.random.default_rng(0)


def test_dense_matches_gather():
    imgs = rng.normal(size=(64, 64, 64)).astype(np.float32)
    grid = rng.uniform(-1.4, 1.4, size=(64, 2)).astype(np.float32)
    a = grid_sample_bilinear(jnp.asarray(imgs), jnp.asarray(grid))
    b = grid_sample_bilinear_dense(jnp.asarray(imgs), jnp.asarray(grid))
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4,
                               atol=1e-5)


def test_dense_matches_torch():
    import torch
    import torch.nn.functional as F
    n = 32
    imgs = rng.normal(size=(n, 1, 16, 16)).astype(np.float32)
    grid = rng.uniform(-1.3, 1.3, size=(n, 1, 1, 2)).astype(np.float32)
    expected = F.grid_sample(torch.tensor(imgs), torch.tensor(grid),
                             align_corners=True).numpy().reshape(n)
    out = grid_sample_bilinear_dense(jnp.asarray(imgs[:, 0]),
                                     jnp.asarray(grid[:, 0, 0]))
    np.testing.assert_allclose(np.asarray(out), expected, rtol=1e-4,
                               atol=1e-5)


def test_dense_gradients_match_gather():
    imgs = jnp.asarray(rng.normal(size=(8, 16, 16)).astype(np.float32))
    g = jnp.asarray(rng.uniform(-0.8, 0.8, size=(8, 2)).astype(np.float32))

    ga = jax.grad(lambda p: jnp.sum(grid_sample_bilinear(imgs, p)))(g)
    gb = jax.grad(lambda p: jnp.sum(grid_sample_bilinear_dense(imgs, p)))(g)
    np.testing.assert_allclose(np.asarray(ga), np.asarray(gb), rtol=1e-3,
                               atol=1e-4)
