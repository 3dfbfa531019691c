"""Fisheye epipolar geometry: essential matrix estimation/decomposition and
two-view triangulation on unit rays.

Rebuild of the reference's external-camera experiments
(reference: utils/fisheye/fisheye_epipolar_geometry.py:31-167) as pure jnp.
Convention (Hartley & Zisserman): camera 1 is [I|0], camera 2 is [R|t]
(x2 = R x1 + t), the essential matrix is E = [t]x R with the constraint
x2' E x1 = 0.  Fisheye pixels unproject to unit rays through the calibrated
camera model, so the same machinery serves any central camera.
"""

from __future__ import annotations

import jax.numpy as jnp

from globalegomocap_tpu.ops import fisheye


def pixels_to_rays(params: fisheye.FisheyeParams,
                   points2d: jnp.ndarray) -> jnp.ndarray:
    """Fisheye pixels -> unit direction rays (..., 3)."""
    p3d = fisheye.camera2world(params, points2d,
                               jnp.ones(points2d.shape[:-1],
                                        dtype=points2d.dtype))
    return p3d / jnp.linalg.norm(p3d, axis=-1, keepdims=True)


def essential_from_rays(rays1: jnp.ndarray, rays2: jnp.ndarray
                        ) -> jnp.ndarray:
    """8-point estimate of E from unit-ray correspondences (N >= 8):
    least-squares null vector of the bilinear constraints, projected onto
    the essential manifold (two equal singular values, one zero)."""
    a = jnp.einsum("ni,nj->nij", rays2, rays1).reshape(-1, 9)
    _, _, vt = jnp.linalg.svd(a)
    E = vt[-1].reshape(3, 3)
    u, s, vt2 = jnp.linalg.svd(E)
    sigma = (s[0] + s[1]) / 2.0
    return u @ jnp.diag(jnp.asarray([sigma, sigma, 0.0])) @ vt2


def decompose_essential(E: jnp.ndarray):
    """E = [t]x R -> the four (R, t) candidates, rotations proper, |t|=1."""
    u, _, vt = jnp.linalg.svd(E)
    u = u * jnp.sign(jnp.linalg.det(u))
    vt = vt * jnp.sign(jnp.linalg.det(vt))
    W = jnp.asarray([[0.0, -1.0, 0.0], [1.0, 0.0, 0.0], [0.0, 0.0, 1.0]])
    R1 = u @ W @ vt
    R2 = u @ W.T @ vt
    t = u[:, 2]
    return (R1, t), (R1, -t), (R2, t), (R2, -t)


def triangulate_midpoint(rays1: jnp.ndarray, rays2: jnp.ndarray,
                         R: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """Midpoint triangulation under pose x2 = R x1 + t.

    Camera-2's center in camera-1 coordinates is C2 = -R' t and its ray
    directions map into camera 1 as R' d2.  Returns (N, 3) points in
    camera-1 coordinates (scale fixed by |t| = 1).
    """
    d1 = rays1
    d2 = jnp.einsum("ji,nj->ni", R, rays2)   # R^T d2
    o2 = -jnp.einsum("ji,j->i", R, t)        # -R^T t
    a = jnp.sum(d1 * d1, axis=-1)
    b = jnp.sum(d1 * d2, axis=-1)
    c = jnp.sum(d2 * d2, axis=-1)
    w = o2[None, :]                           # o2 - o1
    dd = jnp.sum(d1 * w, axis=-1)
    e = jnp.sum(d2 * w, axis=-1)
    denom = a * c - b * b
    denom = jnp.where(jnp.abs(denom) > 1e-12, denom, 1e-12)
    s = (c * dd - b * e) / denom
    u = (b * dd - a * e) / denom
    p1 = s[:, None] * d1
    p2 = o2 + u[:, None] * d2
    return (p1 + p2) / 2.0


def cheirality_score(rays1: jnp.ndarray, rays2: jnp.ndarray,
                     R: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """Count of correspondences with positive depth in both cameras."""
    X = triangulate_midpoint(rays1, rays2, R, t)
    depth1 = jnp.sum(X * rays1, axis=-1)
    X2 = jnp.einsum("ij,nj->ni", R, X) + t
    depth2 = jnp.sum(X2 * rays2, axis=-1)
    return jnp.sum((depth1 > 0) & (depth2 > 0))


def recover_pose(rays1: jnp.ndarray, rays2: jnp.ndarray):
    """Full two-view pipeline: E -> best (R, t) by cheirality -> points."""
    E = essential_from_rays(rays1, rays2)
    candidates = decompose_essential(E)
    scores = jnp.stack([cheirality_score(rays1, rays2, R, t)
                        for R, t in candidates])
    best = int(jnp.argmax(scores))
    R, t = candidates[best]
    return R, t, triangulate_midpoint(rays1, rays2, R, t)


def pinhole_pixels_to_rays(K: jnp.ndarray,
                           points2d: jnp.ndarray) -> jnp.ndarray:
    """Pinhole pixels -> unit direction rays via K^-1 (..., 3)."""
    ones = jnp.ones(points2d.shape[:-1] + (1,), dtype=points2d.dtype)
    homo = jnp.concatenate([points2d, ones], axis=-1)
    rays = jnp.einsum("ij,...j->...i", jnp.linalg.inv(K[:3, :3]), homo)
    return rays / jnp.linalg.norm(rays, axis=-1, keepdims=True)


def recover_pose_fisheye_pinhole(fisheye_params: fisheye.FisheyeParams,
                                 points_fisheye: jnp.ndarray,
                                 pinhole_K: jnp.ndarray,
                                 points_pinhole: jnp.ndarray):
    """Relative pose between the egocentric fisheye camera and an external
    pinhole camera from 2D-2D correspondences (the reference's external-
    camera convenience, utils/fisheye/fisheye_epipolar_geometry.py:110-167,
    which undistorts the fisheye points and runs K-based fundamental-matrix
    recovery).  Here both cameras unproject straight to unit rays — the
    fisheye through its calibrated polynomial, the pinhole through K^-1 —
    and share the generic ray-based pipeline, so no undistortion resampling
    error enters.  Returns (R, t, points3d): x_pinhole = R x_fisheye + t,
    |t| = 1 (metric scale is not observable from 2D-2D), points3d in the
    fisheye camera's frame."""
    rays1 = pixels_to_rays(fisheye_params, points_fisheye)
    rays2 = pinhole_pixels_to_rays(jnp.asarray(pinhole_K), points_pinhole)
    return recover_pose(rays1, rays2)
