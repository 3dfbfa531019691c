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


def umeyama_no_centering(P: jnp.ndarray, Q: jnp.ndarray):
    """Umeyama variant that skips the centroid subtraction, the
    reference's `umeyama_dim_2` (rigid_transform_with_scale.py:95-118) —
    the rotation is fit about the origin rather than the centroids."""
    n = P.shape[-2]
    C = jnp.einsum("...ni,...nj->...ij", P, Q, precision=_PREC) / n
    V, S, W = jnp.linalg.svd(C)
    d = (jnp.linalg.det(V) * jnp.linalg.det(W)) < 0.0
    sign = jnp.where(d, -1.0, 1.0)
    S = S.at[..., -1].multiply(sign)
    V = V.at[..., :, -1].multiply(sign[..., None])
    R = jnp.matmul(V, W, precision=_PREC)
    varP = jnp.sum(jnp.var(P, axis=-2), axis=-1)
    c = jnp.sum(S, axis=-1) / varP
    t = jnp.mean(Q, axis=-2) - jnp.einsum(
        "...j,...ji->...i", jnp.mean(P, axis=-2),
        c[..., None, None] * R, precision=_PREC)
    return c, R, t


def umeyama_ransac(P: jnp.ndarray, Q: jnp.ndarray, epsilon: float = 0.2,
                   n_iters: int = 80, sample_size: int = 4,
                   seed: int = 0):
    """RANSAC-robust Umeyama (reference:
    rigid_transform_with_scale.py:72-93): fit on random minimal samples,
    keep the largest inlier set (residual < epsilon), refit on it.

    TPU-first formulation: ALL n_iters candidate fits run as one batched
    SVD (no Python loop over hypotheses); the final inlier refit uses a
    masked weighted Umeyama so shapes stay static under jit.
    """
    import jax

    n = P.shape[-2]
    key = jax.random.PRNGKey(seed)
    # (n_iters, sample_size) random correspondence subsets
    idx = jax.vmap(lambda k: jax.random.choice(
        k, n, (sample_size,), replace=False))(
        jax.random.split(key, n_iters))
    Ps = jnp.take(P, idx, axis=-2)      # (n_iters, s, d)
    Qs = jnp.take(Q, idx, axis=-2)
    c, R, t = umeyama(Ps, Qs)           # batched over hypotheses

    proj = jnp.einsum("kni,kij->knj", jnp.broadcast_to(P, Ps.shape[:1] +
                                                       P.shape), R,
                      precision=_PREC) * c[:, None, None] + t[:, None, :]
    residual = jnp.linalg.norm(proj - Q[None], axis=-1)  # (n_iters, n)
    inliers = residual < epsilon
    best = jnp.argmax(jnp.sum(inliers, axis=-1))
    mask = inliers[best].astype(P.dtype)                 # (n,)

    # masked refit: weighted means/covariance over the inlier set
    wsum = jnp.maximum(jnp.sum(mask), 1.0)
    muP = jnp.sum(P * mask[:, None], axis=0) / wsum
    muQ = jnp.sum(Q * mask[:, None], axis=0) / wsum
    cP = (P - muP) * mask[:, None]
    cQ = (Q - muQ) * mask[:, None]
    C = jnp.einsum("ni,nj->ij", cP, cQ, precision=_PREC) / wsum
    V, S, W = jnp.linalg.svd(C)
    d = (jnp.linalg.det(V) * jnp.linalg.det(W)) < 0.0
    sign = jnp.where(d, -1.0, 1.0)
    S = S.at[-1].multiply(sign)
    V = V.at[:, -1].multiply(sign)
    Rb = jnp.matmul(V, W, precision=_PREC)
    varP = jnp.sum(jnp.square(cP)) / wsum
    cb = jnp.sum(S) / varP
    tb = muQ - muP @ (cb * Rb)
    return cb, Rb, tb
