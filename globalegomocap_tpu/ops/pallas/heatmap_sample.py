"""Pallas TPU kernel: fused bilinear heatmap sampling (+ custom VJP).

The hot op of the reprojection energy (reference: optimizer.py:139-149 uses
torch grid_sample): sample N per-joint score maps at N projected points,
inside every objective evaluation of the batched L-BFGS.  The kernel fuses
the align_corners grid mapping, the dense triangle-weight construction and
the two contractions into one VMEM pass per block — the weights never
round-trip to HBM, and the (B, H, W) x (B, W) contraction runs on the MXU.

The backward pass (gradient w.r.t. the sample points — the only input on
the differentiation path; maps are constants of the optimization) is its
own fused kernel using the triangle kernel's a.e.-derivative.

All shapes are static; grids are `cdiv(N, BLOCK)` with masked tails.
Falls back to interpreter mode automatically off-TPU so the same code path
is testable on CPU.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

# Block size bounds the VMEM working set: a (BLOCK, 64, 64) f32 map block
# is BLOCK*16KB; under an outer vmap the batching rule adds a grid dim but
# the scoped VMEM budget (16MB) still has to hold the double-buffered block
# plus the dot_general scratch, so keep the block small.
BLOCK = 64


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _weights(coord, size, dtype):
    """(B,) pixel coords -> (B, size) triangle weights."""
    cols = jax.lax.broadcasted_iota(jnp.int32, (coord.shape[0], size),
                                    1).astype(dtype)
    return jnp.maximum(0.0, 1.0 - jnp.abs(coord[:, None] - cols))


def _fwd_kernel(maps_ref, pts_ref, out_ref):
    # maps may be stored bf16 (halved HBM traffic); compute in f32 in VMEM
    maps = maps_ref[...].astype(jnp.float32)   # (B, H, W)
    pts = pts_ref[...]              # (B, 2)
    h, w = maps.shape[-2], maps.shape[-1]
    ix = (pts[:, 0] + 1.0) * 0.5 * (w - 1)
    iy = (pts[:, 1] + 1.0) * 0.5 * (h - 1)
    wx = _weights(ix, w, maps.dtype)   # (B, W)
    wy = _weights(iy, h, maps.dtype)   # (B, H)
    inner = jax.lax.dot_general(
        maps, wx, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)  # (B, H)
    out_ref[...] = jnp.sum(inner * wy, axis=-1, keepdims=True)  # (B, 1)


def _bwd_kernel(maps_ref, pts_ref, g_ref, dpts_ref):
    maps = maps_ref[...].astype(jnp.float32)   # (B, H, W)
    pts = pts_ref[...]              # (B, 2)
    g = g_ref[...][:, 0]            # (B,)
    h, w = maps.shape[-2], maps.shape[-1]
    sx = 0.5 * (w - 1)
    sy = 0.5 * (h - 1)
    ix = (pts[:, 0] + 1.0) * sx
    iy = (pts[:, 1] + 1.0) * sy

    wx = _weights(ix, w, maps.dtype)
    wy = _weights(iy, h, maps.dtype)
    # d tri(c - i)/d i = -sign(i - c) on the support |i - c| < 1, else 0
    cols = jax.lax.broadcasted_iota(jnp.int32, (ix.shape[0], w),
                                    1).astype(maps.dtype)
    rows = jax.lax.broadcasted_iota(jnp.int32, (iy.shape[0], h),
                                    1).astype(maps.dtype)
    dwx = jnp.where(jnp.abs(ix[:, None] - cols) < 1.0,
                    -jnp.sign(ix[:, None] - cols), 0.0)
    dwy = jnp.where(jnp.abs(iy[:, None] - rows) < 1.0,
                    -jnp.sign(iy[:, None] - rows), 0.0)

    inner_x = jax.lax.dot_general(
        maps, dwx, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)        # (B, H)
    dix = jnp.sum(inner_x * wy, axis=-1)
    inner_y = jax.lax.dot_general(
        maps, wx, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)        # (B, H)
    diy = jnp.sum(inner_y * dwy, axis=-1)

    dpts_ref[...] = jnp.stack([g * dix * sx, g * diy * sy], axis=-1)


def _pad_to_block(x, n_pad):
    return jnp.pad(x, [(0, n_pad)] + [(0, 0)] * (x.ndim - 1))


@jax.custom_vjp
def heatmap_sample_pallas(maps: jnp.ndarray,
                          points: jnp.ndarray) -> jnp.ndarray:
    """maps (N, H, W), points (N, 2) in [-1, 1] -> (N,) bilinear samples
    with align_corners=True + zero padding semantics."""
    return _forward(maps, points)


def _forward(maps, points):
    n, h, w = maps.shape
    n_blocks = pl.cdiv(n, BLOCK)
    pad = n_blocks * BLOCK - n
    maps_p = _pad_to_block(maps, pad)
    pts_p = _pad_to_block(points, pad)
    out = pl.pallas_call(
        _fwd_kernel,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((BLOCK, h, w), lambda i: (i, 0, 0)),
            pl.BlockSpec((BLOCK, 2), lambda i: (i, 0)),
        ],
        out_specs=pl.BlockSpec((BLOCK, 1), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((n_blocks * BLOCK, 1), jnp.float32),
        interpret=_interpret(),
    )(maps_p, pts_p)
    return out[:n, 0]


def _fwd_rule(maps, points):
    return _forward(maps, points), (maps, points)


def _bwd_rule(res, g):
    maps, points = res
    n, h, w = maps.shape
    n_blocks = pl.cdiv(n, BLOCK)
    pad = n_blocks * BLOCK - n
    maps_p = _pad_to_block(maps, pad)
    pts_p = _pad_to_block(points, pad)
    g_p = _pad_to_block(g.reshape(n, 1), pad)
    dpts = pl.pallas_call(
        _bwd_kernel,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((BLOCK, h, w), lambda i: (i, 0, 0)),
            pl.BlockSpec((BLOCK, 2), lambda i: (i, 0)),
            pl.BlockSpec((BLOCK, 1), lambda i: (i, 0)),
        ],
        out_specs=pl.BlockSpec((BLOCK, 2), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((n_blocks * BLOCK, 2), jnp.float32),
        interpret=_interpret(),
    )(maps_p, pts_p, g_p)
    # maps are constants of the latent optimization; their cotangent is a
    # symbolic zero (cheap broadcast, DCE'd when unused)
    return jnp.zeros_like(maps), dpts[:len(points)]


heatmap_sample_pallas.defvjp(_fwd_rule, _bwd_rule)
