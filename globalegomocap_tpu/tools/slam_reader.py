"""OpenVSLAM trajectory reading with metric scale recovery.

Rebuild of the reference's SLAM ETL
(reference: MakeDataForOptimization/slam_reader.py:11-200):

  1. parse `frame_trajectory.txt` (timestamp tx ty tz qx qy qz qw per
     line), timestamp -> frame id via the capture fps;
  2. re-base all poses to the window's first frame;
  3. recover the unknown monocular-SLAM metric scale by Umeyama-fitting the
     SLAM-implied head trajectory (local pose[0] pushed through each SLAM
     pose) to the ground-truth head trajectory, then scaling translations.

Everything is numpy/jnp; the per-frame Open3D point-cloud transforms of the
reference are one batched einsum.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from globalegomocap_tpu.ops.transforms import (
    quat_trans_to_matrix, transform_pose, invert_se3)
from globalegomocap_tpu.ops.umeyama import umeyama


def parse_trajectory_file(path: str, fps: float, start_frame: int,
                          end_frame: int):
    """Parse the OpenVSLAM trajectory text file into (trans (N,3),
    quat (N,4) xyzw) for frames in [start_frame, end_frame)."""
    trans_list, rot_list = [], []
    with open(path) as f:
        for line in f:
            parts = line.strip().split()
            if len(parts) < 8:
                continue
            frame_id = round(float(parts[0]) * fps)
            if start_frame <= frame_id < end_frame:
                trans_list.append([float(x) for x in parts[1:4]])
                rot_list.append([float(x) for x in parts[4:8]])
    return (np.asarray(trans_list, dtype=np.float64),
            np.asarray(rot_list, dtype=np.float64))


def rebase_to_first(mats: jnp.ndarray) -> jnp.ndarray:
    """Re-express all cam->world matrices relative to the first frame
    (reference: slam_reader.py:155-167)."""
    inv0 = invert_se3(mats[0])
    return jnp.matmul(inv0[None], mats)


def read_trajectory(path: str, fps: float, start_frame: int, end_frame: int,
                    scale: float = 1.0) -> np.ndarray:
    """Trajectory -> (N, 4, 4) re-based matrices with translations scaled
    by a fixed factor (reference: slam_reader.py:169-200)."""
    trans, quat = parse_trajectory_file(path, fps, start_frame, end_frame)
    mats = quat_trans_to_matrix(jnp.asarray(trans), jnp.asarray(quat))
    mats = rebase_to_first(mats)
    mats = mats.at[:, :3, 3].multiply(scale)
    return np.asarray(mats)


def recover_metric_scale(rel_mats: jnp.ndarray, local_pose_list: np.ndarray,
                         gt_global_pose: np.ndarray):
    """Umeyama scale recovery (reference: slam_reader.py:81-117).

    rel_mats:        (N, 4, 4) re-based SLAM cam->world matrices.
    local_pose_list: (N, 15, 3) per-frame local pose estimates.
    gt_global_pose:  (N, 15, 3) ground truth world poses.
    Returns (scale c, R_1, t_1) where (R_1, t_1) is the inverse fit
    (gt -> slam frame) the reference also returns.
    """
    local = jnp.asarray(np.asarray(local_pose_list, dtype=np.float32))
    slam_heads = transform_pose(local, rel_mats)[:, 0, :]  # (N, 3)
    gt_heads = jnp.asarray(
        np.asarray(gt_global_pose, dtype=np.float32))[:, 0, :]
    c, _, _ = umeyama(slam_heads, gt_heads)
    c1, R1, t1 = umeyama(gt_heads, slam_heads)
    return float(c), np.asarray(R1), np.asarray(t1)


def read_trajectory_with_scale(path: str, fps: float,
                               local_pose_list: np.ndarray,
                               gt_global_pose: np.ndarray,
                               start_frame: int, end_frame: int):
    """The reference's `read_trajectory_new` (slam_reader.py:50-121):
    parse + rebase + head-trajectory scale recovery; returns
    (matrices (N, 4, 4) with scaled translations, R_1, t_1)."""
    trans, quat = parse_trajectory_file(path, fps, start_frame, end_frame)
    mats = quat_trans_to_matrix(jnp.asarray(trans), jnp.asarray(quat))
    rel = rebase_to_first(mats)
    c, R1, t1 = recover_metric_scale(rel, local_pose_list, gt_global_pose)
    scaled = rel.at[:, :3, 3].multiply(c)
    return np.asarray(scaled), R1, t1
