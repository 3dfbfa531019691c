"""AMASS motion-capture training data pipeline.

Reimplements the reference's dataset semantics
(reference: networks/dataset/global_dataset.py:12-111 and
local_dataset.py:15-98) without torch DataLoaders: the whole windowed
dataset materializes as one (W, T, 45) array that lives on device, and
batches are random gathers — the TPU-friendly input pipeline for a dataset
this size (~10⁵ windows × 450 floats).

Covered options: fps resampling by frame-rate striding, slide-window vs
disjoint windowing, train/test split (last 10 files are test), walking
balance (subsample 'walk' sequences to 1/20 of the rest), mo2cap2-subset
filtering by sequence-name list, and local-pose vs relative-global-pose
targets.
"""

from __future__ import annotations

import os
import pickle
from typing import Sequence

import numpy as np

from globalegomocap_tpu.ops.transforms import (
    quat_trans_to_matrix, relative_global_pose)


def load_amass_pkls(path: str, is_train: bool = True,
                    mo2cap2_names: Sequence[str] | None = None,
                    balance_walking: bool = False,
                    seed: int = 0) -> list[dict]:
    """Load AMASS pkl dicts from a directory with the reference's
    filtering/split rules (global_dataset.py:43-74)."""
    names = sorted(os.listdir(path))
    if mo2cap2_names is not None:
        names = [n for n in names
                 if any(seq in n for seq in mo2cap2_names)]
    names = names[:-10] if is_train else names[-10:]
    if balance_walking:
        walk = [n for n in names if "walk" in n.lower()]
        non_walk = [n for n in names if "walk" not in n.lower()]
        rng = np.random.default_rng(seed)
        rng.shuffle(walk)
        names = non_walk + walk[: int(len(non_walk) / 20)]
    out = []
    for n in names:
        with open(os.path.join(path, n), "rb") as f:
            out.append(pickle.load(f))
    return out


def _cams_to_matrices(cam_list) -> np.ndarray:
    """[{'loc','rot'}] -> (N, 4, 4), quaternions in scipy xyzw order
    (reference contract: utils/utils.py:85-97)."""
    import jax.numpy as jnp
    locs = np.stack([np.asarray(c["loc"], dtype=np.float32)
                     for c in cam_list])
    rots = np.stack([np.asarray(c["rot"], dtype=np.float32)
                     for c in cam_list])
    return np.asarray(quat_trans_to_matrix(jnp.asarray(locs),
                                           jnp.asarray(rots)))


def window_sequences(data_list: list[dict], frame_num: int = 10,
                     fps: int = 25, slide_window: bool = True,
                     local_pose: bool = False,
                     dilation: int = 1) -> np.ndarray:
    """Slice all sequences into (W, frame_num, 45) training windows.

    Resampling: stride = round(seq_frame_rate / fps)
    (global_dataset.py:90-100).  local_pose=False converts every window to
    the relative-global (camera-0) frame, the global prior's target;
    local_pose=True emits the raw camera-frame windows (the local prior's
    target, local_dataset.py:82-98).

    `dilation` is the reference's `windows_size` / `--slide_window_step`
    option (global_dataset.py:82-109: a window spans
    frame_num*windows_size resampled frames and keeps every
    windows_size-th) — algebraically it just multiplies the temporal
    stride, which is how it is implemented here.
    """
    import jax.numpy as jnp

    windows = []
    for seq in data_list:
        poses = np.asarray(seq["local_pose_list"], dtype=np.float32)
        n = len(poses)
        stride_t = max(1, round(int(seq["frame_rate"]) / fps)) * dilation
        span = frame_num * stride_t
        interval = 1 if slide_window else span
        if n <= span:
            continue
        cams = None
        if not local_pose:
            cams = _cams_to_matrices(seq["cam_list"])
        starts = list(range(0, n - span, interval))
        if not starts:
            continue
        # gather all windows of this sequence at once
        idx = np.asarray(starts)[:, None] + \
            np.arange(0, span, stride_t)[None, :]
        pose_win = poses[idx]                       # (w, T, 15, 3)
        if local_pose:
            windows.append(pose_win.reshape(len(starts), frame_num, 45))
        else:
            cam_win = cams[idx]                     # (w, T, 4, 4)
            rel = np.asarray(relative_global_pose(
                jnp.asarray(pose_win), jnp.asarray(cam_win)))
            windows.append(rel.reshape(len(starts), frame_num, 45))
    if not windows:
        return np.zeros((0, frame_num, 45), dtype=np.float32)
    return np.concatenate(windows, axis=0).astype(np.float32)


class AmassWindows:
    """Materialized window dataset with epoch shuffling.

    Usage:
        ds = AmassWindows.from_dir(path, frame_num=10, ...)
        for batch in ds.epoch_batches(rng, batch_size): ...
    """

    def __init__(self, windows: np.ndarray):
        self.windows = windows

    @classmethod
    def from_dir(cls, path: str, frame_num: int = 10, fps: int = 25,
                 is_train: bool = True, slide_window: bool = True,
                 local_pose: bool = False, balance_walking: bool = False,
                 mo2cap2_names=None, dilation: int = 1) -> "AmassWindows":
        data = load_amass_pkls(path, is_train, mo2cap2_names,
                               balance_walking)
        return cls(window_sequences(data, frame_num, fps, slide_window,
                                    local_pose, dilation))

    @classmethod
    def from_sequences(cls, data_list: list[dict], frame_num: int = 10,
                       fps: int = 25, slide_window: bool = True,
                       local_pose: bool = False) -> "AmassWindows":
        return cls(window_sequences(data_list, frame_num, fps,
                                    slide_window, local_pose))

    def __len__(self) -> int:
        return len(self.windows)

    def epoch_batches(self, rng: np.random.Generator, batch_size: int,
                      drop_last: bool = True, shuffle: bool = True):
        n = len(self.windows)
        order = rng.permutation(n) if shuffle else np.arange(n)
        end = n - n % batch_size if drop_last else n
        for i in range(0, end, batch_size):
            yield self.windows[order[i:i + batch_size]]
