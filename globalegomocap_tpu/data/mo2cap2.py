"""Mo2Cap2 fine-tuning dataset: training windows sliced from a
`test_data.pkl` chunk.

Rebuild of the reference's `Mo2Cap2Dataset`
(reference: networks/dataset/global_dataset.py:114-169 and
local_dataset.py:101-156): disjoint frame_num-long windows of the estimated
skeleton, optionally converted to the relative-global (camera-0) frame,
together with the window's cameras and ground truth.
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np

from globalegomocap_tpu.data.test_data import TestChunk
from globalegomocap_tpu.ops.transforms import relative_global_pose


class Mo2Cap2Windows(NamedTuple):
    poses: np.ndarray      # (W, T, 45) training windows
    cameras: np.ndarray    # (W, T, 4, 4)
    gt: np.ndarray         # (W, T, 15, 3)


def mo2cap2_windows(chunk: TestChunk, frame_num: int = 10,
                    local_pose: bool = False) -> Mo2Cap2Windows:
    """Disjoint windows over a chunk (stride = frame_num, the reference's
    split loop at global_dataset.py:127)."""
    import jax.numpy as jnp

    n = chunk.n_frames
    starts = np.arange(0, n - frame_num, frame_num)
    idx = starts[:, None] + np.arange(frame_num)[None, :]
    pose_win = chunk.estimated_local[idx]        # (W, T, 15, 3)
    cam_win = chunk.camera_poses[idx]
    gt_win = chunk.gt_global[idx]
    if local_pose:
        out = pose_win
    else:
        out = np.asarray(relative_global_pose(jnp.asarray(pose_win),
                                              jnp.asarray(cam_win)))
    return Mo2Cap2Windows(
        poses=out.reshape(len(starts), frame_num, 45).astype(np.float32),
        cameras=cam_win.astype(np.float32),
        gt=gt_win.astype(np.float32))
