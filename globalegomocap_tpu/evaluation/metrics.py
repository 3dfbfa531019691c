"""The 17-metric MPJPE evaluation suite, fully on-device.

Metric definitions and key names match the reference's `calculate_errors`
(reference: calculate_errors.py:114-179):

  * raw global MPJPE of the estimated / mid (stage-1) / optimized sequences
  * "camera position" error — the hip-midpoint (joints 7, 11) trajectory
    error (calculate_errors.py:33-47)
  * sequence-level Umeyama alignment variants (whole sequence aligned as a
    single point cloud, calculate_errors.py:8-21)
  * per-frame Procrustes-aligned (PA-)MPJPE (calculate_errors.py:62-83) —
    here a single batched SVD over all frames instead of a Python loop
  * bone-length-normalized + Procrustes (BA-)MPJPE: both prediction and GT
    are first resized to the mean3D reference skeleton
    (calculate_errors.py:149-155)
  * per-joint mean error of the BA-aligned optimized sequence

All inputs are (N, 15, 3) world-frame joint sequences.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from globalegomocap_tpu.ops.skeleton import (
    skeleton_resize, mean3d_bone_lengths_mm)
from globalegomocap_tpu.ops.umeyama import umeyama_align

METRIC_KEYS = (
    "original_global_mpjpe",
    "mid_global_mpjpe",
    "optimized_global_mpjpe",
    "original_camera_pos_error",
    "optimized_camera_pos_error",
    "original_aligned_camera_pos_error",
    "mid_aligned_camera_pose_error",
    "optimized_aligned_camera_pos_error",
    "original_aligned_global_mpjpe",
    "aligned_mid_seq_mpjpe",
    "optimized_aligned_global_mpjpe",
    "aligned_original_mpjpe",
    "aligned_mid_optimized_mpjpe",
    "aligned_optimized_mpjpe",
    "bone_length_aligned_original_mpjpe",
    "bone_length_aligned_mid_optimized_mpjpe",
    "bone_length_aligned_optimized_mpjpe",
    "joints_error",
)


def mpjpe(pred: jnp.ndarray, gt: jnp.ndarray) -> jnp.ndarray:
    """Mean per-joint position error over all frames and joints."""
    return jnp.mean(jnp.linalg.norm(pred - gt, axis=-1))


def per_joint_error(pred: jnp.ndarray, gt: jnp.ndarray) -> jnp.ndarray:
    """(15,) mean error per joint (calculate_errors.py:105-111)."""
    return jnp.mean(jnp.linalg.norm(pred - gt, axis=-1), axis=0)


def hip_midpoint(seq: jnp.ndarray) -> jnp.ndarray:
    """(N, 3) trajectory of the pelvis proxy: mean of R/L hip (joints 7, 11)."""
    return (seq[:, 7, :] + seq[:, 11, :]) / 2.0


def camera_position_error(pred: jnp.ndarray, gt: jnp.ndarray,
                          align: bool = False) -> jnp.ndarray:
    """Hip-midpoint trajectory error (calculate_errors.py:33-47)."""
    p = hip_midpoint(pred)
    g = hip_midpoint(gt)
    if align:
        p = umeyama_align(p, g)
    return jnp.mean(jnp.linalg.norm(p - g, axis=-1))


def align_sequence_globally(pred: jnp.ndarray,
                            gt: jnp.ndarray) -> jnp.ndarray:
    """One Umeyama fit of the whole (N*15, 3) cloud
    (calculate_errors.py:8-21)."""
    n = pred.shape[0]
    aligned = umeyama_align(pred.reshape(-1, 3), gt.reshape(-1, 3))
    return aligned.reshape(n, 15, 3)


def align_per_frame(pred: jnp.ndarray, gt: jnp.ndarray) -> jnp.ndarray:
    """Per-frame Procrustes alignment — batched SVD over all N frames at
    once (the reference loops: calculate_errors.py:75-81)."""
    return umeyama_align(pred, gt)


def resize_to_mean3d(seq: jnp.ndarray) -> jnp.ndarray:
    """Resize every frame's bone lengths to the mean3D reference skeleton
    (calculate_errors.py:66-73 via Skeleton.skeleton_resize_single)."""
    target = jnp.asarray(mean3d_bone_lengths_mm(), dtype=seq.dtype)
    return skeleton_resize(seq, target)


def calculate_errors(estimated: jnp.ndarray, mid: jnp.ndarray,
                     optimized: jnp.ndarray, gt: jnp.ndarray) -> dict:
    """Full 17-metric suite + per-joint errors.

    estimated/mid/optimized/gt: (N, 15, 3) world-frame sequences.
    Returns a dict keyed by METRIC_KEYS with scalar jnp values (and a (15,)
    vector for 'joints_error'), same names and same math as the reference.
    """
    out = {}
    out["original_global_mpjpe"] = mpjpe(estimated, gt)
    out["mid_global_mpjpe"] = mpjpe(mid, gt)
    out["optimized_global_mpjpe"] = mpjpe(optimized, gt)

    out["original_camera_pos_error"] = camera_position_error(estimated, gt)
    out["optimized_camera_pos_error"] = camera_position_error(optimized, gt)

    est_seq_aligned = align_sequence_globally(estimated, gt)
    mid_seq_aligned = align_sequence_globally(mid, gt)
    opt_seq_aligned = align_sequence_globally(optimized, gt)

    out["original_aligned_camera_pos_error"] = camera_position_error(
        est_seq_aligned, gt)
    out["mid_aligned_camera_pose_error"] = camera_position_error(
        mid_seq_aligned, gt)
    out["optimized_aligned_camera_pos_error"] = camera_position_error(
        opt_seq_aligned, gt)

    out["original_aligned_global_mpjpe"] = mpjpe(est_seq_aligned, gt)
    out["aligned_mid_seq_mpjpe"] = mpjpe(mid_seq_aligned, gt)
    out["optimized_aligned_global_mpjpe"] = mpjpe(opt_seq_aligned, gt)

    out["aligned_original_mpjpe"] = mpjpe(align_per_frame(estimated, gt), gt)
    out["aligned_mid_optimized_mpjpe"] = mpjpe(align_per_frame(mid, gt), gt)
    out["aligned_optimized_mpjpe"] = mpjpe(align_per_frame(optimized, gt), gt)

    # bone-length-normalized: both sides resized to the mean3D skeleton
    gt_r = resize_to_mean3d(gt)
    est_r = align_per_frame(resize_to_mean3d(estimated), gt_r)
    mid_r = align_per_frame(resize_to_mean3d(mid), gt_r)
    opt_r = align_per_frame(resize_to_mean3d(optimized), gt_r)

    out["bone_length_aligned_original_mpjpe"] = mpjpe(est_r, gt_r)
    out["bone_length_aligned_mid_optimized_mpjpe"] = mpjpe(mid_r, gt_r)
    out["bone_length_aligned_optimized_mpjpe"] = mpjpe(opt_r, gt_r)
    out["joints_error"] = per_joint_error(opt_r, gt_r)
    return out


calculate_errors_jit = jax.jit(calculate_errors)
