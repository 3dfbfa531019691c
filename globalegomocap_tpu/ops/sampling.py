"""Bilinear grid sampling with `align_corners=True` + zero padding semantics.

This is the exact sampling contract of the heatmap reprojection energy
(reference: optimizer.py:139-149 uses torch.nn.functional.grid_sample with
align_corners=True and default zero padding), implemented as pure gathers so
it vmaps over (window, frame, joint) and differentiates cleanly under
jax.grad.

Two coordinate conventions:
  * `grid_sample_bilinear[_dense](images, grid_xy)` — normalized [-1, 1]
    coordinates over the image (torch grid_sample contract).
  * `bilinear_sample_pixels / bilinear_dense_pixels(images, ix, iy)` —
    raw pixel coordinates; the building block for sampling CROPPED maps,
    where the pixel coords are computed against the full map and shifted by
    the crop origin.
"""

from __future__ import annotations

import jax.numpy as jnp


def bilinear_sample_pixels(images: jnp.ndarray, ix: jnp.ndarray,
                           iy: jnp.ndarray) -> jnp.ndarray:
    """Bilinear sample at pixel coords (zero outside [0, size-1]).

    images: (..., H, W); ix, iy: (...,) pixel coordinates.
    All four taps are fetched in ONE flat-indexed gather (TPU: a single
    small gather beats chained row gathers; indices are non-differentiable,
    the coordinate gradient flows through the weights).
    """
    h, w = images.shape[-2], images.shape[-1]

    x0 = jnp.floor(ix)
    y0 = jnp.floor(iy)
    x1 = x0 + 1.0
    y1 = y0 + 1.0

    wx1 = ix - x0
    wx0 = 1.0 - wx1
    wy1 = iy - y0
    wy0 = 1.0 - wy1

    def flat_idx(yf, xf):
        xi = jnp.clip(xf, 0, w - 1).astype(jnp.int32)
        yi = jnp.clip(yf, 0, h - 1).astype(jnp.int32)
        return yi * w + xi

    def inb(yf, xf):
        return ((xf >= 0) & (xf <= w - 1) &
                (yf >= 0) & (yf <= h - 1)).astype(jnp.float32)

    idx = jnp.stack([flat_idx(y0, x0), flat_idx(y0, x1),
                     flat_idx(y1, x0), flat_idx(y1, x1)], axis=-1)
    wts = jnp.stack([wy0 * wx0 * inb(y0, x0), wy0 * wx1 * inb(y0, x1),
                     wy1 * wx0 * inb(y1, x0), wy1 * wx1 * inb(y1, x1)],
                    axis=-1)
    flat = images.reshape(images.shape[:-2] + (h * w,))
    vals = jnp.take_along_axis(flat, idx, axis=-1)          # (..., 4)
    return jnp.sum(vals * wts, axis=-1)


def bilinear_dense_pixels(images: jnp.ndarray, ix: jnp.ndarray,
                          iy: jnp.ndarray) -> jnp.ndarray:
    """Gather-free bilinear sampling at pixel coords for TPU: the two
    bilinear taps per axis are dense triangle-kernel weight vectors and the
    sample becomes a batched contraction that maps onto the MXU —
    sample[p] = Σ_h Σ_w  tri(iy_p - h) · im[p, h, w] · tri(ix_p - w).

    Triangle weights max(0, 1 - |i - c|) reproduce torch's
    align_corners=True + zero-padding semantics exactly (out-of-bounds taps
    get zero weight) and differentiate cleanly.
    """
    h, w = images.shape[-2], images.shape[-1]
    cols = jnp.arange(w, dtype=jnp.float32)
    rows = jnp.arange(h, dtype=jnp.float32)
    wx = jnp.maximum(0.0, 1.0 - jnp.abs(ix[..., None] - cols))  # (..., W)
    wy = jnp.maximum(0.0, 1.0 - jnp.abs(iy[..., None] - rows))  # (..., H)

    inner = jnp.einsum("...hw,...w->...h", images, wx)
    return jnp.einsum("...h,...h->...", inner, wy)


def _to_pixels(images, grid_xy):
    """align_corners=True: -1 -> 0, +1 -> size-1."""
    h, w = images.shape[-2], images.shape[-1]
    ix = (grid_xy[..., 0] + 1.0) * 0.5 * (w - 1)
    iy = (grid_xy[..., 1] + 1.0) * 0.5 * (h - 1)
    return ix, iy


def grid_sample_bilinear(images: jnp.ndarray, grid_xy: jnp.ndarray
                         ) -> jnp.ndarray:
    """Sample each image at one (or more) normalized grid points.

    images:  (..., H, W) one single-channel image per leading index.
    grid_xy: (..., 2) normalized coordinates in [-1, 1]; x indexes width,
             y indexes height; broadcast-compatible with images' leading axes.
    returns  (...,) bilinearly interpolated values; out-of-bounds corner taps
             contribute zero (torch zero-padding semantics).
    """
    ix, iy = _to_pixels(images, grid_xy)
    return bilinear_sample_pixels(images, ix, iy)


def grid_sample_bilinear_dense(images: jnp.ndarray, grid_xy: jnp.ndarray
                               ) -> jnp.ndarray:
    """Normalized-coordinate wrapper of `bilinear_dense_pixels` (same
    contract as `grid_sample_bilinear`)."""
    ix, iy = _to_pixels(images, grid_xy)
    return bilinear_dense_pixels(images, ix, iy)
