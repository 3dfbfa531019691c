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

import functools

import jax
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


@functools.lru_cache(maxsize=None)
def merge_matrix(w: int, t: int, stride: int = 8,
                 smooth_sigma: float = 0.0) -> np.ndarray:
    """The (covered_frames, W*T) matrix M with `merged = M @ flat(windows)`
    equal to `merge_windows` (scatter-mean of overlapping frames) — and,
    when smooth_sigma > 0, with the final gaussian time-smoothing FOLDED
    in (both are linear maps along time with static coefficients, so
    S @ (M @ x) = (S @ M) @ x exactly).

    Why a matmul: the scatter-add/count/divide (+ separate smoothing
    conv) cost several dispatches per merged field on a launch whose
    intercept is dispatch-bound (intercept_probe_r3.json); one small MXU
    matmul replaces them.  The smoothing block is built by pushing the
    identity through `ops.filtering.gaussian_filter1d` itself, so its
    edge handling is identical by construction.
    """
    n = (w - 1) * stride + t
    idx = window_indices(n, t, stride).reshape(-1)          # (w*t,)
    m = np.zeros((n, w * t), np.float32)
    m[idx, np.arange(w * t)] = 1.0
    m /= m.sum(axis=1, keepdims=True)                       # scatter-MEAN
    if smooth_sigma > 0.0:
        # pure-numpy replica of ops.filtering.gaussian_filter1d applied
        # to the identity (same kernel + 'symmetric' padding), so this
        # stays host-side even when called under an outer jit trace
        from globalegomocap_tpu.ops.filtering import _gaussian_kernel
        k = _gaussian_kernel(smooth_sigma, 4.0)
        r = (len(k) - 1) // 2
        padded = np.pad(np.eye(n, dtype=np.float32),
                        [(r, r), (0, 0)], mode="symmetric")
        s = np.zeros((n, n), np.float32)
        for i in range(len(k)):
            s += k[i] * padded[i:i + n]
        m = s @ m
    return m


def merge_windows_matmul(windows: jnp.ndarray, stride: int = 8,
                         smooth_sigma: float = 0.0) -> jnp.ndarray:
    """`merge_windows` (optionally + final gaussian smoothing) as ONE
    matmul.  Same signature/semantics as `merge_windows`; under an outer
    vmap (per-chunk) the constant matrix makes this a single batched
    matmul.  Geometry must not run at the TPU's default bf16 matmul
    precision (millimetre metrics on metre-scale poses), hence HIGHEST.
    """
    w, t = windows.shape[0], windows.shape[1]
    m = jnp.asarray(merge_matrix(w, t, stride, smooth_sigma))
    flat = windows.reshape(w * t, -1).astype(jnp.float32)
    out = jnp.matmul(m, flat, precision=jax.lax.Precision.HIGHEST)
    # preserve the input dtype (merge_windows returns windows.dtype); the
    # accumulation above stays f32 either way
    return out.reshape((m.shape[0],) + windows.shape[2:]).astype(
        windows.dtype)


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
