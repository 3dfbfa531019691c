"""Umeyama similarity alignment (scale + rotation + translation), batched.

Returns (c, R, t) with the reference's application convention
`Q ≈ P @ R * c + t` (reference: utils/rigid_transform_with_scale.py:18-43),
including its SVD sign-flip rule.  Batched over arbitrary leading axes via a
single batched SVD, so the 17-metric evaluation suite's per-frame Procrustes
runs as one device launch instead of a Python loop of tiny SVDs.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# full-precision matmuls: Procrustes feeds millimetre-resolution metrics
_PREC = jax.lax.Precision.HIGHEST


def umeyama(P: jnp.ndarray, Q: jnp.ndarray):
    """Least-squares similarity transform aligning P onto Q.

    P, Q: (..., n, d) corresponding point clouds.
    Returns (c (...,), R (..., d, d), t (..., d)) minimizing
    sum_i ||P_i @ (c R) + t - Q_i||².
    """
    n = P.shape[-2]
    muP = jnp.mean(P, axis=-2, keepdims=True)
    muQ = jnp.mean(Q, axis=-2, keepdims=True)
    cP = P - muP
    cQ = Q - muQ

    C = jnp.einsum("...ni,...nj->...ij", cP, cQ, precision=_PREC) / n
    V, S, W = jnp.linalg.svd(C)

    # keep R a proper rotation: flip the last singular direction when the
    # determinant product is negative (same rule as the reference).
    d = (jnp.linalg.det(V) * jnp.linalg.det(W)) < 0.0
    sign = jnp.where(d, -1.0, 1.0)
    S = S.at[..., -1].multiply(sign)
    V = V.at[..., :, -1].multiply(sign[..., None])

    R = jnp.matmul(V, W, precision=_PREC)

    varP = jnp.sum(jnp.var(P, axis=-2), axis=-1)
    c = jnp.sum(S, axis=-1) / varP
    t = muQ[..., 0, :] - jnp.einsum(
        "...j,...ji->...i", muP[..., 0, :], c[..., None, None] * R,
        precision=_PREC)
    return c, R, t


def umeyama_align(P: jnp.ndarray, Q: jnp.ndarray) -> jnp.ndarray:
    """Align P onto Q and return the transformed points (..., n, d)."""
    c, R, t = umeyama(P, Q)
    return jnp.einsum("...ni,...ij->...nj", P, R,
                      precision=_PREC) * c[..., None, None] + t[..., None, :]


def umeyama_scale_only(P: jnp.ndarray, Q: jnp.ndarray) -> jnp.ndarray:
    """Scale P by the Umeyama scale factor only (no rotation/translation),
    the behaviour of the reference's `align_skeleton_size`
    (calculate_errors.py:49-60)."""
    c, _, _ = umeyama(P, Q)
    return P * c[..., None, None]
