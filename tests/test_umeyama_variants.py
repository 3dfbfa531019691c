"""RANSAC and no-centering Umeyama variant tests."""

import numpy as np
import jax.numpy as jnp

from globalegomocap_tpu.ops.umeyama import (
    umeyama, umeyama_ransac, umeyama_no_centering)


rng = np.random.default_rng(0)


def test_ransac_rejects_outliers():
    from scipy.spatial.transform import Rotation
    n = 60
    P = rng.normal(size=(n, 3))
    R_true = Rotation.random(random_state=2).as_matrix()
    c_true, t_true = 2.2, np.array([0.5, -0.2, 1.0])
    Q = P @ R_true * c_true + t_true
    # corrupt 20% of correspondences badly
    bad = rng.choice(n, size=n // 5, replace=False)
    Q[bad] += rng.normal(scale=5.0, size=(len(bad), 3))

    # plain umeyama is pulled off by the outliers
    c0, R0, t0 = umeyama(jnp.asarray(P), jnp.asarray(Q))
    err_plain = abs(float(c0) - c_true)

    c, R, t = umeyama_ransac(jnp.asarray(P.astype(np.float32)),
                             jnp.asarray(Q.astype(np.float32)),
                             epsilon=0.2, n_iters=80)
    np.testing.assert_allclose(float(c), c_true, rtol=1e-2)
    np.testing.assert_allclose(np.asarray(R), R_true, atol=2e-2)
    np.testing.assert_allclose(np.asarray(t), t_true, atol=5e-2)
    assert abs(float(c) - c_true) < err_plain


def test_no_centering_exact_on_origin_fit():
    """NOTE the reference variant's quirk (replicated): the covariance is
    uncentered but the scale normalizer is the centered variance, so the
    scale is only exact for zero-mean clouds."""
    from scipy.spatial.transform import Rotation
    P = rng.normal(size=(30, 3))
    P = P - P.mean(axis=0)
    R_true = Rotation.random(random_state=3).as_matrix()
    Q = P @ R_true * 1.5  # pure rotation+scale about the origin
    c, R, t = umeyama_no_centering(jnp.asarray(P), jnp.asarray(Q))
    np.testing.assert_allclose(np.asarray(R), R_true, atol=1e-4)
    np.testing.assert_allclose(float(c), 1.5, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(t), 0.0, atol=1e-4)
