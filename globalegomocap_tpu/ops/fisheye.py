"""Fisheye camera models (Scaramuzza-style calibrated omnidirectional model
and the analytic equisolid model), pure jnp and fully batched.

Behavioural contract follows the reference cameras
(reference: utils/fisheye/FishEyeCalibrated.py:6-144 and
FishEyeEquisolid.py:6-56): polynomial unprojection/projection with the same
z-flip convention, so poses and projections are numerically interchangeable
with the reference pipeline.

Camera parameters are a small immutable pytree (`FisheyeParams`), so cameras
pass through jit/vmap boundaries as ordinary arguments.
"""

from __future__ import annotations

import json
from dataclasses import dataclass
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class FisheyeParams:
    """Calibrated omnidirectional camera parameters as a jax pytree."""
    # image center (cx, cy) in pixels
    center: jnp.ndarray
    # ascending-order polynomial rho(pixel radius) -> z component (C2W)
    poly_c2w: jnp.ndarray
    # ascending-order polynomial theta -> image radius rho (W2C)
    poly_w2c: jnp.ndarray
    # (w, h) image size in pixels — static metadata, still traced-safe
    img_size: jnp.ndarray


def load_calibration(path: str) -> FisheyeParams:
    """Load a fisheye calibration JSON (keys: intrinsic, size, polynomialC2W,
    polynomialW2C — the reference's calibration file contract)."""
    with open(path) as f:
        data = json.load(f)
    return params_from_dict(data)


def params_from_dict(data: dict) -> FisheyeParams:
    intrinsic = np.asarray(data["intrinsic"], dtype=np.float32)
    return FisheyeParams(
        center=jnp.asarray([intrinsic[0][2], intrinsic[1][2]], dtype=jnp.float32),
        poly_c2w=jnp.asarray(data["polynomialC2W"], dtype=jnp.float32),
        poly_w2c=jnp.asarray(data["polynomialW2C"], dtype=jnp.float32),
        img_size=jnp.asarray(data["size"], dtype=jnp.float32),
    )


def _polyval_ascending(coeffs: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """Evaluate sum_i coeffs[i] * x**i with Horner's scheme.

    The unrolled Python loop is over the *static* coefficient count, so XLA
    sees a fixed chain of fused multiply-adds (VPU-friendly).
    """
    out = jnp.zeros_like(x)
    for c in coeffs[::-1]:
        out = out * x + c
    return out


def camera2world(params: FisheyeParams, points2d: jnp.ndarray,
                 depth: jnp.ndarray) -> jnp.ndarray:
    """Unproject 2D pixels with per-point depth to camera-space 3D.

    points2d: (..., 2) pixel coordinates; depth: (...,).
    returns (..., 3).

    Same math as the reference's `camera2world`
    (FishEyeCalibrated.py:18-33): z from the C2W polynomial of the radial
    pixel distance, then the ray [x, y, -z] normalized and scaled by depth.
    """
    centered = points2d - params.center
    x = centered[..., 0]
    y = centered[..., 1]
    r = jnp.sqrt(x * x + y * y)
    z = _polyval_ascending(params.poly_c2w, r)
    ray = jnp.stack([x, y, -z], axis=-1)
    norm = jnp.linalg.norm(ray, axis=-1, keepdims=True)
    return ray / norm * depth[..., None]


def world2camera(params: FisheyeParams, points3d: jnp.ndarray) -> jnp.ndarray:
    """Project camera-space 3D points to fisheye pixels.

    points3d: (..., 3) -> (..., 2).

    Same math as the reference's `world2camera[_pytorch]`
    (FishEyeCalibrated.py:57-129): flip z, theta = atan(z/||xy||), radial
    distance rho = poly_w2c(theta), scale the unit xy direction.
    A tiny epsilon guards the ||xy|| = 0 singularity (the reference raises an
    exception there; under jit we keep it finite instead).
    """
    x = points3d[..., 0]
    y = points3d[..., 1]
    z = -points3d[..., 2]
    norm = jnp.sqrt(x * x + y * y)
    safe_norm = jnp.maximum(norm, 1e-9)
    theta = jnp.arctan(z / safe_norm)
    rho = _polyval_ascending(params.poly_w2c, theta)
    inv = rho / safe_norm
    px = x * inv + params.center[0]
    py = y * inv + params.center[1]
    return jnp.stack([px, py], axis=-1)


def world2camera_with_depth(params: FisheyeParams, points3d: jnp.ndarray):
    """Project and also return the ray length as depth
    (reference: FishEyeCalibrated.py:89-94)."""
    points2d = world2camera(params, points3d)
    depth = jnp.linalg.norm(points3d, axis=-1)
    return points2d, depth


def undistort(params: FisheyeParams, points2d: jnp.ndarray,
              focal: float = 500.0) -> jnp.ndarray:
    """Map fisheye pixels to an ideal pinhole image (unit depth unprojection
    followed by a pinhole projection with the calibration's intrinsics),
    matching the reference's `undistort` (FishEyeCalibrated.py:131-144)."""
    p3d = camera2world(params, points2d, jnp.ones(points2d.shape[:-1],
                                                  dtype=points2d.dtype))
    x = p3d[..., 0] / p3d[..., 2]
    y = p3d[..., 1] / p3d[..., 2]
    return jnp.stack([focal * x + params.center[0],
                      focal * y + params.center[1]], axis=-1)


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class EquisolidParams:
    """Analytic equisolid fisheye: r = 2 f sin(theta/2)."""
    focal_px: jnp.ndarray   # focal length in pixels
    center: jnp.ndarray     # (cx, cy)
    max_radius: jnp.ndarray  # f * sqrt(2), the r of theta = 90°


def equisolid(focal_length_mm: float = 9.0, sensor_size_mm: float = 32.0,
              img_size: Sequence[int] = (1280, 1024)) -> EquisolidParams:
    """Build the default equisolid camera of the reference
    (FishEyeEquisolid.py:6-28, the `Skeleton(None)` default)."""
    img = np.asarray(img_size, dtype=np.float32)
    focal_px = focal_length_mm / np.max(sensor_size_mm) * np.max(img)
    return EquisolidParams(
        focal_px=jnp.asarray(focal_px, dtype=jnp.float32),
        center=jnp.asarray(img / 2 + 1e-10, dtype=jnp.float32),
        max_radius=jnp.asarray(focal_px * np.sqrt(2.0), dtype=jnp.float32),
    )


def equisolid_camera2world(params: EquisolidParams, points2d: jnp.ndarray,
                           depth: jnp.ndarray) -> jnp.ndarray:
    """Unproject with the equisolid model (FishEyeEquisolid.py:30-53):
    clamp near-rim radii, theta = 2 asin(r / 2f), Z = r / tan(theta)."""
    centered = points2d - params.center
    x = centered[..., 0]
    y = centered[..., 1]
    r = jnp.sqrt(x * x + y * y)
    r = jnp.where(r > params.max_radius - 30.0, params.max_radius, r)
    theta = 2.0 * jnp.arcsin(r / (2.0 * params.focal_px))
    Z = r / jnp.tan(theta)
    ray = jnp.stack([x, y, Z], axis=-1)
    norm = jnp.linalg.norm(ray, axis=-1, keepdims=True)
    return ray / norm * depth[..., None]


# Built-in calibrations: the published calibration constants of the two
# egocentric camera rigs used by the reference datasets (data, not code).
EGOSYN_CALIBRATION = {
    "name": "egosyn",
    "size": [1280, 1024],
    "intrinsic": [
        [500, 0, 6.597087109684564E+02, 0],
        [0, 500, 5.300556618148025E+02, 0],
        [0, 0, 1, 0],
        [0, 0, 0, 1],
    ],
    "imageCircleRadius": 512.0,
    "polynomialC2W": [-2.924126419694919E+02, 0.0, 1.075613595858202E-03,
                      2.072664555244253E-07, 4.493499097653669E-10,
                      -1.192028310212584E-15, -1.822337421183959E-17],
    "polynomialW2C": [4.785893205484341E+02, 3.503715828980770E+02,
                      7.900065565120241E+01, 6.228794005673283E+01,
                      3.264466851189552E+01, 1.568380500967838E+01,
                      7.766879336977007E+00, 2.190791369989537E+00,
                      -1.084229689289942E-01, -1.903842667463734E-01,
                      -2.776267870029922E-02],
}

POSE_FISHEYE_CALIBRATION = {
    "name": "new",
    "size": [1280, 1024],
    "intrinsic": [
        [500, 0, 639.074101, 0],
        [0, 500, 511.081780, 0],
        [0, 0, 1, 0],
        [0, 0, 0, 1],
    ],
    "imageCircleRadius": 512.0,
    "polynomialC2W": [-4.083907e+02, 0.0, 1.679882e-03, -3.677087e-06,
                      7.461604e-09],
    "polynomialW2C": [492.969845, 193.289959, -28.612327, 51.744505,
                      -2.120082, 13.644155, 1.512262, -18.789714, 18.962317,
                      14.989157, -12.692345, -5.804379, 3.508978, 1.511979],
}


def default_camera(name: str = "egosyn") -> FisheyeParams:
    """Get a built-in calibrated camera by name ('egosyn' or 'pose_fisheye')."""
    table = {"egosyn": EGOSYN_CALIBRATION,
             "pose_fisheye": POSE_FISHEYE_CALIBRATION}
    return params_from_dict(table[name])
