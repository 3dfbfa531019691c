"""Sliding-window slicing and overlap-averaged merging.

The reference slides a 10-frame window with stride 8 (overlap 2) over each
sequence, optimizes windows serially, and merges by averaging the 2-frame
overlaps (reference: optimizer.py:328-330, 370, 425-437).  Here both
directions are single gathers/scatters:

  * `slice_windows` materializes ALL windows as one (W, T, ...) batch — the
    unit of vmap/sharding for the optimizer.
  * `merge_windows` is a scatter-mean, exactly equivalent to the reference's
    overlap averaging for any stride/overlap.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def num_windows(n_frames: int, seq_len: int = 10, stride: int = 8) -> int:
    """Number of windows the reference's loop produces
    (range(0, n - seq_len + 1, stride))."""
    if n_frames < seq_len:
        return 0
    return (n_frames - seq_len) // stride + 1


def covered_frames(n_frames: int, seq_len: int = 10, stride: int = 8) -> int:
    """Frames covered by the merged output (the reference's merge drops any
    tail frames not reached by the final window)."""
    w = num_windows(n_frames, seq_len, stride)
    return (w - 1) * stride + seq_len if w else 0


def window_indices(n_frames: int, seq_len: int = 10,
                   stride: int = 8) -> np.ndarray:
    """(W, T) static frame-index table for gathering windows."""
    w = num_windows(n_frames, seq_len, stride)
    starts = np.arange(w) * stride
    return starts[:, None] + np.arange(seq_len)[None, :]


def slice_windows(seq: jnp.ndarray, seq_len: int = 10,
                  stride: int = 8) -> jnp.ndarray:
    """(N, ...) frame sequence -> (W, T, ...) batch of windows."""
    idx = window_indices(seq.shape[0], seq_len, stride)
    return jnp.take(seq, jnp.asarray(idx.reshape(-1)), axis=0).reshape(
        idx.shape + seq.shape[1:])


def merge_windows(windows: jnp.ndarray, stride: int = 8) -> jnp.ndarray:
    """(W, T, ...) optimized windows -> (covered_frames, ...) merged
    sequence; overlapping frames are averaged (scatter-mean).

    For stride = T - overlap this reproduces the reference's
    `merge_batches` output exactly: overlap frames appear in exactly two
    windows and are averaged, all others appear once.
    """
    w, t = windows.shape[0], windows.shape[1]
    n = (w - 1) * stride + t
    idx = jnp.asarray(window_indices(n, t, stride).reshape(-1))
    flat = windows.reshape((w * t,) + windows.shape[2:])
    acc = jnp.zeros((n,) + windows.shape[2:], windows.dtype).at[idx].add(flat)
    cnt = jnp.zeros((n,), windows.dtype).at[idx].add(1.0)
    cnt = cnt.reshape((n,) + (1,) * (windows.ndim - 2))
    return acc / cnt
