"""The `test_data.pkl` contract — the public input format of the optimizer.

Produced by the preprocessing ETL (tools/process_test_data.py here;
reference: MakeDataForOptimization/process_test_data.py:149-155) and
consumed by the optimization driver (reference: optimizer.py:315-324).

Keys: gt_global_skeleton (N, 15, 3), estimated_global_skeleton (N, 15, 3),
estimated_local_skeleton (N, 15, 3), camera_pose_list (N, 4, 4) cam->world,
heatmap_list (N, H, W, 15).
"""

from __future__ import annotations

import os
import pickle
from typing import NamedTuple

import numpy as np


class TestChunk(NamedTuple):
    estimated_local: np.ndarray   # (N, 15, 3) camera-frame estimates
    estimated_global: np.ndarray  # (N, 15, 3) world-frame estimates
    gt_global: np.ndarray         # (N, 15, 3)
    camera_poses: np.ndarray      # (N, 4, 4)
    heatmaps: np.ndarray          # (N, H, W, 15)

    @property
    def n_frames(self) -> int:
        return self.estimated_local.shape[0]


def load_test_chunk(path: str) -> TestChunk:
    """Load one chunk directory (or pkl file) in the reference's format."""
    if os.path.isdir(path):
        path = os.path.join(path, "test_data.pkl")
    with open(path, "rb") as f:
        data = pickle.load(f)
    return TestChunk(
        estimated_local=np.asarray(data["estimated_local_skeleton"],
                                   dtype=np.float32),
        estimated_global=np.asarray(data["estimated_global_skeleton"],
                                    dtype=np.float32),
        gt_global=np.asarray(data["gt_global_skeleton"], dtype=np.float32),
        camera_poses=np.asarray(data["camera_pose_list"], dtype=np.float32),
        heatmaps=np.asarray(data["heatmap_list"], dtype=np.float32),
    )


def save_test_chunk(chunk: TestChunk, out_dir: str) -> str:
    """Write a chunk in the reference's pkl format (reference:
    process_test_data.py:149-157)."""
    os.makedirs(out_dir, exist_ok=True)
    out_path = os.path.join(out_dir, "test_data.pkl")
    with open(out_path, "wb") as f:
        pickle.dump({
            "gt_global_skeleton": chunk.gt_global,
            "estimated_global_skeleton": chunk.estimated_global,
            "estimated_local_skeleton": chunk.estimated_local,
            "camera_pose_list": chunk.camera_poses,
            "heatmap_list": chunk.heatmaps,
        }, f)
    return out_path


def list_chunk_dirs(data_dir: str) -> list[str]:
    """Naturally-sorted chunk subdirectories of a sequence directory
    (reference: optimize_whole_sequence.py:48-52 uses natsort)."""
    def natkey(s: str):
        import re
        return [int(t) if t.isdigit() else t for t in re.split(r"(\d+)", s)]

    out = []
    for name in sorted(os.listdir(data_dir), key=natkey):
        p = os.path.join(data_dir, name)
        if os.path.isdir(p) and os.path.exists(
                os.path.join(p, "test_data.pkl")):
            out.append(p)
    return out
