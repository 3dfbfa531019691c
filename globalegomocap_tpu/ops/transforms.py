"""SE(3) pose/coordinate transforms, batched.

TPU-first re-design of the reference's per-frame Python loops
(reference: utils/utils.py:62-139) as single einsums over whole windows and
batches of windows.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# Geometry runs at full float32 precision even on TPU: poses are metre-scale
# while the evaluation metrics resolve millimetres, so the MXU's default
# bfloat16 passes are not acceptable here.  These matrices are tiny (4x4), so
# HIGHEST precision costs nothing.
_PREC = jax.lax.Precision.HIGHEST


def transform_pose(pose: jnp.ndarray, matrix: jnp.ndarray) -> jnp.ndarray:
    """Apply a homogeneous 4x4 transform to 3D joint positions.

    pose:   (..., J, 3)
    matrix: (..., 4, 4)  broadcastable against pose's leading axes.
    returns (..., J, 3)

    Semantics of the reference's `transform_pose` (utils/utils.py:62-66),
    batched: p' = R p + t.
    """
    rot = matrix[..., :3, :3]
    trans = matrix[..., :3, 3]
    return jnp.einsum("...ij,...nj->...ni", rot, pose,
                      precision=_PREC) + trans[..., None, :]


def invert_se3(matrix: jnp.ndarray) -> jnp.ndarray:
    """Closed-form inverse of a rigid 4x4 transform: [R t]⁻¹ = [Rᵀ -Rᵀt]."""
    rot = matrix[..., :3, :3]
    trans = matrix[..., :3, 3]
    rot_t = jnp.swapaxes(rot, -1, -2)
    new_t = -jnp.einsum("...ij,...j->...i", rot_t, trans, precision=_PREC)
    out = jnp.zeros_like(matrix)
    out = out.at[..., :3, :3].set(rot_t)
    out = out.at[..., :3, 3].set(new_t)
    out = out.at[..., 3, 3].set(1.0)
    return out


def relative_global_pose(local_pose_seq: jnp.ndarray,
                         camera_matrix_seq: jnp.ndarray) -> jnp.ndarray:
    """Re-express every frame's camera-space pose in the window's first
    camera frame ("relative global pose").

    local_pose_seq:    (..., T, J, 3) camera-frame joint positions
    camera_matrix_seq: (..., T, 4, 4) cam->world matrices
    returns            (..., T, J, 3)

    Same math as the reference's per-frame loop
    (utils/utils.py:99-112: pose_i' = inv(C_0) @ C_i @ pose_i) but computed
    as one batched einsum over the whole window (and any batch of windows).
    """
    cam0_inv = invert_se3(camera_matrix_seq[..., 0:1, :, :])  # (..., 1, 4, 4)
    rel_cam = jnp.matmul(cam0_inv, camera_matrix_seq,
                         precision=_PREC)                 # (..., T, 4, 4)
    return transform_pose(local_pose_seq, rel_cam)


def relative_to_global_pose(relative_pose_seq: jnp.ndarray,
                            camera_matrix_0: jnp.ndarray) -> jnp.ndarray:
    """Push a relative-global window back into the world frame using the
    window's first camera matrix (reference: optimizer.py:302-308).

    relative_pose_seq: (..., T, J, 3)
    camera_matrix_0:   (..., 4, 4) the first camera of the window.
    """
    return transform_pose(relative_pose_seq, camera_matrix_0[..., None, :, :])


def quat_to_rotmat(quat: jnp.ndarray) -> jnp.ndarray:
    """Quaternion (x, y, z, w — scipy convention) -> rotation matrix.

    quat: (..., 4) need not be normalized.
    Matches `scipy.spatial.transform.Rotation.from_quat(...).as_matrix()`
    used by the reference (utils/utils.py:33-42).
    """
    q = quat / jnp.linalg.norm(quat, axis=-1, keepdims=True)
    x, y, z, w = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z
    m = jnp.stack([
        1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy),
        2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx),
        2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy),
    ], axis=-1)
    return m.reshape(*q.shape[:-1], 3, 3)


def quat_trans_to_matrix(trans: jnp.ndarray, quat: jnp.ndarray) -> jnp.ndarray:
    """Build 4x4 cam->world matrices from translation + quaternion.

    trans: (..., 3), quat: (..., 4) scipy xyzw order.
    Reference: utils/utils.py:33-42 (`trans_qrot_to_matrix`).
    """
    rot = quat_to_rotmat(quat)
    batch = jnp.broadcast_shapes(trans.shape[:-1], quat.shape[:-1])
    out = jnp.zeros(batch + (4, 4), dtype=rot.dtype)
    out = out.at[..., :3, :3].set(rot)
    out = out.at[..., :3, 3].set(trans)
    out = out.at[..., 3, 3].set(1.0)
    return out


def rotmat_to_quat(rot: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrix -> quaternion (x, y, z, w), scipy-compatible sign-free
    up to quaternion double cover.  Shepperd's method, branchless via where.
    """
    m = rot
    t = jnp.trace(m, axis1=-2, axis2=-1)
    m00, m11, m22 = m[..., 0, 0], m[..., 1, 1], m[..., 2, 2]

    # four candidate constructions, pick the numerically largest pivot
    qw = jnp.sqrt(jnp.maximum(0.0, 1 + t)) / 2
    qx = jnp.sqrt(jnp.maximum(0.0, 1 + m00 - m11 - m22)) / 2
    qy = jnp.sqrt(jnp.maximum(0.0, 1 - m00 + m11 - m22)) / 2
    qz = jnp.sqrt(jnp.maximum(0.0, 1 - m00 - m11 + m22)) / 2

    qx = jnp.copysign(qx, m[..., 2, 1] - m[..., 1, 2])
    qy = jnp.copysign(qy, m[..., 0, 2] - m[..., 2, 0])
    qz = jnp.copysign(qz, m[..., 1, 0] - m[..., 0, 1])
    q = jnp.stack([qx, qy, qz, qw], axis=-1)
    return q / jnp.linalg.norm(q, axis=-1, keepdims=True)
