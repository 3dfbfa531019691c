"""Blender <-> OpenCV camera coordinate conversions.

Rebuild of the reference's conversion helpers
(reference: utils/utils.py:141-249), used when generating synthetic
egocentric data in Blender: build world->cv extrinsics from Blender camera
location/euler-rotation, and compute relative transforms between cameras.
Host-side numpy (these run in data-generation, not on device).
"""

from __future__ import annotations

import numpy as np
from scipy.spatial.transform import Rotation

# Blender camera looks down -Z with +Y up; CV looks down +Z with -Y up.
_R_BCAM2CV = np.array([[1.0, 0.0, 0.0],
                       [0.0, -1.0, 0.0],
                       [0.0, 0.0, -1.0]])


def cv_rt_from_blender(location, rotation_euler_xyz):
    """Blender camera pose -> (T_world2cv, R_world2cv, 4x4 world->cv)
    (reference: utils/utils.py:191-223)."""
    loc = np.asarray(location, dtype=np.float64)
    r_world2bcam = Rotation.from_euler(
        "xyz", rotation_euler_xyz, degrees=False).as_matrix().T
    t_world2bcam = -r_world2bcam @ loc
    r_world2cv = _R_BCAM2CV @ r_world2bcam
    t_world2cv = _R_BCAM2CV @ t_world2bcam
    mat = np.eye(4)
    mat[:3, :3] = r_world2cv
    mat[:3, 3] = t_world2cv
    return t_world2cv, r_world2cv, mat


def cv_rt_from_cv(location, rotation_euler_xyz):
    """Same construction without the Blender axis flip
    (reference: utils/utils.py:226-249)."""
    loc = np.asarray(location, dtype=np.float64)
    r_world2cv = Rotation.from_euler(
        "xyz", rotation_euler_xyz, degrees=False).as_matrix().T
    t_world2cv = -r_world2cv @ loc
    mat = np.eye(4)
    mat[:3, :3] = r_world2cv
    mat[:3, 3] = t_world2cv
    return t_world2cv, r_world2cv, mat


def relative_transform_from_blender(location1, rotation1, location2,
                                    rotation2):
    """Object transform of camera 2 relative to camera 1 in CV coords
    (reference: utils/utils.py:141-154).  Returns (euler_xyz, translation,
    4x4 cv2->cv1)."""
    _, _, m1 = cv_rt_from_blender(location1, rotation1)
    _, _, m2 = cv_rt_from_blender(location2, rotation2)
    cv1_to_cv2 = np.linalg.inv(m1) @ m2
    cv2_to_cv1 = np.linalg.inv(cv1_to_cv2)
    euler = Rotation.from_matrix(cv2_to_cv1[:3, :3]).as_euler("xyz")
    return euler, cv2_to_cv1[:3, 3], cv2_to_cv1


def consecutive_global_cameras(cam_seq: np.ndarray,
                               last_cam: np.ndarray) -> np.ndarray:
    """Chain a window's camera matrices onto the previous window's final
    camera: C_i' = last ∘ C_0⁻¹ ∘ C_i (reference: utils/utils.py:75-83)."""
    cam_seq = np.asarray(cam_seq)
    inv0 = np.linalg.inv(cam_seq[0])
    return np.einsum("ij,jk,nkl->nil", last_cam, inv0, cam_seq)
