"""Appendable HDF5 window-dataset packing.

Rebuild of the reference's HDF5 packer (reference: networks/make_dataset.py:
15-131): converts a directory of AMASS pkls into an HDF5 file with the
datasets `relative_global_pose` (W, T, 15, 3), `local_pose` (W, T, 15, 3)
and `camera_matrix` (W, T, 4, 4), plus a reader returning `AmassWindows`.
"""

from __future__ import annotations

import os
import pickle

import numpy as np

from globalegomocap_tpu.data.amass import _cams_to_matrices
from globalegomocap_tpu.ops.transforms import relative_global_pose


class HDF5Store:
    """Append-only HDF5 datasets with a shared batch axis."""

    def __init__(self, path: str, dataset_shapes: dict, dtype=np.float32):
        import h5py
        self.path = path
        with h5py.File(path, "w") as f:
            for name, shape in dataset_shapes.items():
                f.create_dataset(name, shape=(0,) + tuple(shape),
                                 maxshape=(None,) + tuple(shape),
                                 dtype=dtype)

    def append(self, batches: dict):
        import h5py
        with h5py.File(self.path, "a") as f:
            for name, values in batches.items():
                values = np.asarray(values)
                d = f[name]
                n0 = d.shape[0]
                d.resize((n0 + len(values),) + d.shape[1:])
                d[n0:] = values
            f.flush()


def sequence_windows_with_cameras(seq: dict, frame_num: int, fps: int,
                                  slide_window: bool):
    """One AMASS sequence -> (relative_global (w,T,15,3),
    local (w,T,15,3), cameras (w,T,4,4))."""
    import jax.numpy as jnp

    poses = np.asarray(seq["local_pose_list"], dtype=np.float32)
    n = len(poses)
    stride_t = max(1, round(int(seq["frame_rate"]) / fps))
    span = frame_num * stride_t
    interval = 1 if slide_window else span
    starts = list(range(0, n - span, interval))
    if not starts:
        z = np.zeros((0, frame_num, 15, 3), np.float32)
        return z, z, np.zeros((0, frame_num, 4, 4), np.float32)
    cams = _cams_to_matrices(seq["cam_list"])
    idx = np.asarray(starts)[:, None] + \
        np.arange(0, span, stride_t)[None, :]
    pose_win = poses[idx]
    cam_win = cams[idx]
    rel = np.asarray(relative_global_pose(jnp.asarray(pose_win),
                                          jnp.asarray(cam_win)))
    return rel.astype(np.float32), pose_win, cam_win.astype(np.float32)


def pack_amass_dir(source_dir: str, output_path: str, frame_num: int = 10,
                   fps: int = 25, slide_window: bool = True):
    """Directory of AMASS pkls -> one HDF5 file (reference:
    make_dataset.py:60-73)."""
    store = HDF5Store(output_path, {
        "relative_global_pose": (frame_num, 15, 3),
        "local_pose": (frame_num, 15, 3),
        "camera_matrix": (frame_num, 4, 4),
    })
    for name in sorted(os.listdir(source_dir)):
        with open(os.path.join(source_dir, name), "rb") as f:
            seq = pickle.load(f)
        rel, local, cams = sequence_windows_with_cameras(
            seq, frame_num, fps, slide_window)
        if len(rel):
            store.append({"relative_global_pose": rel,
                          "local_pose": local,
                          "camera_matrix": cams})
    return output_path


def load_hdf5_windows(path: str, local_pose: bool = False):
    """HDF5 file -> AmassWindows of (W, T, 45) windows."""
    import h5py
    from globalegomocap_tpu.data.amass import AmassWindows
    key = "local_pose" if local_pose else "relative_global_pose"
    with h5py.File(path, "r") as f:
        w = np.asarray(f[key])
    return AmassWindows(w.reshape(w.shape[0], w.shape[1], 45))


class HDF5WindowStream:
    """Streaming window dataset over a packed HDF5 file — the epoch_batches
    protocol of AmassWindows without materializing the windows in RAM.

    Shuffling is two-level (shuffled slab order x in-slab permutation): each
    epoch reads contiguous `slab_size`-row slabs in random order — fast
    sequential HDF5 IO — and permutes rows within the slab, carrying
    leftovers across slab boundaries so batch composition still mixes slabs.
    This is the AMASS-scale loader the materializing AmassWindows can't be
    (reference: networks/make_dataset.py packs HDF5 but its dataset classes
    still load everything, networks/dataset/global_dataset.py:29-60).
    """

    def __init__(self, path: str, local_pose: bool = False,
                 slab_size: int = 4096, start: int = 0,
                 stop: int | None = None):
        import h5py
        self.path = path
        self.key = "local_pose" if local_pose else "relative_global_pose"
        self.slab_size = int(slab_size)
        try:
            self._file = h5py.File(path, "r")
        except OSError as e:
            raise OSError(
                f"{path} is not a readable HDF5 window file (expected the "
                f"pack_amass_dir format with a {self.key!r} dataset): {e}"
            ) from e
        if self.key not in self._file:
            raise KeyError(
                f"{path} has no {self.key!r} dataset; datasets present: "
                f"{list(self._file)}")
        self._dset = self._file[self.key]
        n = int(self._dset.shape[0])
        self.start = max(0, start if start >= 0 else n + start)
        self.stop = n if stop is None else min(n, stop if stop >= 0
                                               else n + stop)

    def __len__(self) -> int:
        return max(0, self.stop - self.start)

    def close(self):
        if self._file is not None:
            self._file.close()
            self._file = None

    def _read_slab(self, offset: int) -> np.ndarray:
        lo = self.start + offset
        hi = min(lo + self.slab_size, self.stop)
        block = np.asarray(self._dset[lo:hi], dtype=np.float32)
        return block.reshape(block.shape[0], block.shape[1], -1)

    def epoch_batches(self, rng: np.random.Generator, batch_size: int,
                      drop_last: bool = True, shuffle: bool = True):
        starts = np.arange(0, len(self), self.slab_size)
        if shuffle:
            starts = rng.permutation(starts)
        pending = None
        for s in starts:
            block = self._read_slab(int(s))
            if shuffle:
                block = block[rng.permutation(len(block))]
            if pending is not None:
                block = np.concatenate([pending, block])
                pending = None
            n_full = len(block) // batch_size
            for i in range(n_full):
                yield block[i * batch_size:(i + 1) * batch_size]
            rem = len(block) - n_full * batch_size
            if rem:
                pending = block[-rem:]
        if pending is not None and not drop_last:
            yield pending


def interpolate_frames(sequence: np.ndarray, factor: int = 5) -> np.ndarray:
    """Linear temporal upsampling (reference: make_dataset.py:76-86)."""
    a = sequence[:-1]
    b = sequence[1:]
    alphas = np.arange(factor) / factor
    out = a[:, None] + alphas[(None, slice(None)) + (None,) * (a.ndim - 1)] \
        * (b - a)[:, None]
    return out.reshape((-1,) + sequence.shape[1:])
