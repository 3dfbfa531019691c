"""Temporal filtering: Gaussian sequence smoothing and the one-euro filter.

`gaussian_filter1d` reproduces scipy.ndimage.gaussian_filter1d's default
behaviour (truncate=4, 'reflect' boundary) — the smoother the reference calls
at optimizer.py:383, 406, 450 — as a static-kernel depthwise convolution that
XLA fuses on-device, batched over arbitrary trailing feature axes.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np


def _gaussian_kernel(sigma: float, truncate: float = 4.0) -> np.ndarray:
    """The discrete Gaussian weights scipy uses (normalized, radius
    = int(truncate*sigma + 0.5))."""
    radius = int(truncate * float(sigma) + 0.5)
    x = np.arange(-radius, radius + 1, dtype=np.float64)
    w = np.exp(-0.5 / (float(sigma) ** 2) * x ** 2)
    w = w / w.sum()
    return w.astype(np.float32)


def gaussian_filter1d(seq: jnp.ndarray, sigma: float, axis: int = 0,
                      truncate: float = 4.0) -> jnp.ndarray:
    """Gaussian-smooth `seq` along `axis` with scipy-compatible semantics.

    sigma and truncate must be static Python numbers (the kernel is baked
    into the compiled program).  Boundary mode is scipy's default 'reflect'
    (edge sample duplicated), i.e. numpy's 'symmetric' padding.
    """
    kernel = jnp.asarray(_gaussian_kernel(sigma, truncate))
    radius = (kernel.shape[0] - 1) // 2

    seq = jnp.moveaxis(seq, axis, 0)
    t = seq.shape[0]
    flat = seq.reshape(t, -1)

    pad_width = [(radius, radius), (0, 0)]
    padded = jnp.pad(flat, pad_width, mode="symmetric")

    # correlate along time: out[t] = sum_k kernel[k] * padded[t + k]
    # As a tiny static unrolled sum of shifted slices — cheap for the 9-tap
    # sigma=1 kernel and fully fusable by XLA.
    out = jnp.zeros_like(flat)
    for k in range(kernel.shape[0]):
        out = out + kernel[k] * jax.lax.dynamic_slice_in_dim(padded, k, t, 0)
    out = out.reshape(seq.shape)
    return jnp.moveaxis(out, 0, axis)


def _smoothing_factor(t_e, cutoff):
    r = 2.0 * math.pi * cutoff * t_e
    return r / (r + 1.0)


def one_euro_filter(timestamps: jnp.ndarray, values: jnp.ndarray,
                    min_cutoff: float = 1.0, beta: float = 0.0,
                    d_cutoff: float = 1.0) -> jnp.ndarray:
    """Vectorized one-euro filter over a whole sequence.

    timestamps: (T,) sample times; values: (T, ...) signal.
    Returns the filtered signal, same shape as `values`.

    Same recurrence as the reference's scalar `OneEuroFilter`
    (utils/one_euro_filter.py:13-44), expressed as a `lax.scan` so the whole
    sequence filters in one compiled launch, batched over every trailing
    axis at once.
    """
    def step(carry, inp):
        x_prev, dx_prev, t_prev = carry
        t, x = inp
        t_e = t - t_prev
        a_d = _smoothing_factor(t_e, d_cutoff)
        dx = (x - x_prev) / t_e
        dx_hat = a_d * dx + (1.0 - a_d) * dx_prev
        cutoff = min_cutoff + beta * jnp.abs(dx_hat)
        a = _smoothing_factor(t_e, cutoff)
        x_hat = a * x + (1.0 - a) * x_prev
        return (x_hat, dx_hat, t), x_hat

    x0 = values[0]
    init = (x0, jnp.zeros_like(x0), timestamps[0])
    _, out = jax.lax.scan(step, init, (timestamps[1:], values[1:]))
    return jnp.concatenate([values[:1], out], axis=0)
