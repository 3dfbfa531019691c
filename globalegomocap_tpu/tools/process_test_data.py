"""Test-data preprocessing ETL: heatmaps + depths + SLAM + GT -> test_data.pkl.

Rebuild of the reference's `MakeDataForOptimization/process_test_data.py`:
per 100-frame chunk, lift per-frame heatmap/depth predictions to local 3D
poses via the calibrated fisheye camera, read the SLAM trajectory with
metric-scale recovery, compose local pose with camera pose into global
skeletons, and write the `test_data.pkl` contract.

The heatmap->pose lifting replicates `Skeleton.set_skeleton_from_file`
(reference: utils/skeleton.py:74-90): resize the 64x64 maps to 1024x1024
(nearest), pad x by 128 to the 1280-wide frame, argmax, then fisheye
unprojection at the predicted depth.  Here the resize+argmax collapses to
argmax on the 64x64 map followed by the affine pixel mapping — identical
coordinates without materializing the 1024² upsample.
"""

from __future__ import annotations

import os
import pickle

import numpy as np
import jax.numpy as jnp

from globalegomocap_tpu.data.test_data import TestChunk, save_test_chunk
from globalegomocap_tpu.ops import fisheye
from globalegomocap_tpu.ops.skeleton import heatmap_argmax
from globalegomocap_tpu.ops.transforms import transform_pose
from globalegomocap_tpu.tools.slam_reader import read_trajectory_with_scale

# 64x64 heatmap -> 1280x1024 fisheye pixel mapping: nearest-neighbour
# upsample by 16 puts bin k at pixel 16*k (cv2.INTER_NEAREST picks the
# top-left source sample), then the x-pad shifts by +128.
HEATMAP_UPSCALE = 16.0
CROP_PAD_X = 128.0


def heatmap_to_pixel(coords_64: jnp.ndarray) -> jnp.ndarray:
    """(..., 2) argmax coords on the 64x64 map -> full-image pixels."""
    px = coords_64[..., 0] * HEATMAP_UPSCALE + CROP_PAD_X
    py = coords_64[..., 1] * HEATMAP_UPSCALE
    return jnp.stack([px, py], axis=-1)


def lift_heatmaps_to_pose(heatmaps: np.ndarray, depths: np.ndarray,
                          camera: fisheye.FisheyeParams) -> np.ndarray:
    """(N, H, W, 15) heatmaps + (N, 15) depths -> (N, 15, 3) local poses.

    Batched over all frames at once (the reference loops per frame through
    cv2.resize + numpy argmax)."""
    hm = jnp.asarray(heatmaps).transpose(0, 3, 1, 2)  # (N, 15, H, W)
    coords, _ = heatmap_argmax(hm)
    pixels = heatmap_to_pixel(coords)  # (N, 15, 2)
    pose = fisheye.camera2world(camera, pixels, jnp.asarray(depths))
    return np.asarray(pose, dtype=np.float32)


def load_mat_frames(heatmap_dir: str, depth_dir: str, start: int, end: int):
    """Read per-frame .mat files ('heatmap' (H, W, 15), 'depth' (15,)),
    natural-sorted (reference: process_test_data.py:49-68)."""
    from scipy.io import loadmat

    def natkey(s):
        import re
        return [int(t) if t.isdigit() else t for t in re.split(r"(\d+)", s)]

    hm_files = sorted(os.listdir(heatmap_dir), key=natkey)[start:end]
    dp_files = sorted(os.listdir(depth_dir), key=natkey)[start:end]
    heatmaps, depths = [], []
    for hf, df in zip(hm_files, dp_files):
        heatmaps.append(loadmat(os.path.join(heatmap_dir, hf))["heatmap"])
        depths.append(loadmat(os.path.join(depth_dir, df))["depth"][0])
    return np.asarray(heatmaps, dtype=np.float32), \
        np.asarray(depths, dtype=np.float32)


def build_chunk(heatmaps: np.ndarray, depths: np.ndarray,
                slam_path: str, gt_global: np.ndarray, fps: float,
                start_frame: int, end_frame: int,
                camera: fisheye.FisheyeParams | None = None) -> TestChunk:
    """Assemble one chunk from already-loaded arrays."""
    camera = camera or fisheye.default_camera("egosyn")
    local_pose = lift_heatmaps_to_pose(heatmaps, depths, camera)
    traj, _, _ = read_trajectory_with_scale(
        slam_path, fps, local_pose, gt_global, start_frame, end_frame)
    est_global = np.asarray(transform_pose(
        jnp.asarray(local_pose), jnp.asarray(traj)), dtype=np.float32)
    return TestChunk(
        estimated_local=local_pose,
        estimated_global=est_global,
        gt_global=np.asarray(gt_global, dtype=np.float32),
        camera_poses=np.asarray(traj, dtype=np.float32),
        heatmaps=np.asarray(heatmaps, dtype=np.float32),
    )


def process_sequence(slam_path: str, heatmap_dir: str, depth_dir: str,
                     gt_path: str, out_root: str,
                     total_start: int, total_end: int,
                     fps: float = 25.0, chunk_size: int = 100,
                     mat_start_frame: int | None = None,
                     calibration_path: str | None = None):
    """Split a sequence into fixed-size chunks and write one
    `data_start_X_end_Y/test_data.pkl` per chunk
    (reference: process_test_data.py:167-184)."""
    camera = (fisheye.load_calibration(calibration_path)
              if calibration_path else fisheye.default_camera("egosyn"))
    with open(gt_path, "rb") as f:
        gt_all = np.asarray(pickle.load(f))
    mat_start = total_start if mat_start_frame is None else mat_start_frame

    out_paths = []
    for s in range(total_start, total_end - chunk_size, chunk_size):
        e = s + chunk_size
        heatmaps, depths = load_mat_frames(heatmap_dir, depth_dir, s, e)
        gt = gt_all[s - mat_start:e - mat_start]
        chunk = build_chunk(heatmaps, depths, slam_path, gt, fps, s, e,
                            camera)
        out_dir = os.path.join(out_root, f"data_start_{s}_end_{e}")
        out_paths.append(save_test_chunk(chunk, out_dir))
        mpjpe = np.linalg.norm(
            chunk.estimated_global - chunk.gt_global, axis=-1).mean()
        print(f"chunk {s}..{e}: initial mpjpe {mpjpe:.4f}")
    return out_paths
