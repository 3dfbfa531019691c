"""The FULL mega-kernel: conv-decoder chain + fisheye projection + crop
sampling + all energy terms, forward AND backward, in ONE Pallas kernel.

Round-3 follow-up to ops/pallas/fused_energy.py (which fuses only the
post-decode energy and measured +49%/+73%, fused_ab.json): the scan-timed
eval decomposition (eval_decomp.json) shows the DECODER fwd+bwd is 78% of
the remaining objective eval (0.644 of 0.827 ms) and ~120 of its ~146
HLO fusions — dozens of small shift-matmul/pad/activation kernels over a
(B*T, <=512) working set.  Here the whole k=3/stride-1 conv chain (the
reference decoder minus its first dense layer, SeqConvVAE.py:62-92 after
BN folding) runs VMEM-resident per window block: ~2.2 MB of conv weights
stay on-chip, each layer is three (BLK*T, Cin)x(Cin, Cout) MXU
contractions plus sublane shifts, activations are saved in registers/VMEM
for the in-kernel backward, and the energy core is shared with the v1
kernel (`_energy_core`).

Only the first dense layer (latent 2048 -> T*512: 42 MB of weights,
vastly over the 16 MB scoped-VMEM budget — and a single large MXU matmul
XLA already schedules perfectly) stays outside; the kernel takes its
output h0 and returns (energy, dE/dh0), so one objective eval is:
one XLA matmul + ONE kernel + one XLA transpose-matmul for dz.

The decoded-pose channel order (t, joint*3+coord) is rearranged to the
energy core's coordinate-major (3, T*J) layout by a constant (45, 45)
permutation matmul + an in-kernel minor-dims reshape (and their exact
transposes on the way back).
"""

from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from globalegomocap_tpu.ops.pallas.fused_energy import (
    _difference_matrix, _energy_core, _interpret)

BLOCK = 16   # windows per kernel instance (VMEM-bounded, see fused_energy)


def _pose_perm(j: int = 15) -> np.ndarray:
    """(3j, 3j) permutation P with (pose45 @ P) ordered [x(15), y, z]."""
    p = np.zeros((3 * j, 3 * j), dtype=np.float32)
    for jj in range(j):
        for c in range(3):
            p[jj * 3 + c, c * j + jj] = 1.0
    return p


def _dg(h, w):
    """(B, T, Cin) x (Cin, Cout) -> (B, T, Cout) on the MXU."""
    return jax.lax.dot_general(h, w, (((2,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)


def _dg_t(g, w):
    """(B, T, Cout) x (Cin, Cout) -> (B, T, Cin) (contract Cout)."""
    return jax.lax.dot_general(g, w, (((2,), (1,)), ((), ())),
                               preferred_element_type=jnp.float32)


def _conv_fwd(h, kref, bref):
    """SAME-padded k=3/stride-1 conv along T: out[t] = k0 h[t-1]
    + k1 h[t] + k2 h[t+1] + b."""
    m0 = _dg(h, kref[0])
    m1 = _dg(h, kref[1])
    m2 = _dg(h, kref[2])
    z = jnp.zeros_like(m0[:, :1])
    out = (jnp.concatenate([z, m0[:, :-1]], axis=1) + m1
           + jnp.concatenate([m2[:, 1:], z], axis=1))
    return out + bref[0][None, None, :]


def _conv_bwd(g, kref):
    """Transpose of `_conv_fwd` w.r.t. its input:
    g_in[t] = k0^T g[t+1] + k1^T g[t] + k2^T g[t-1]."""
    g0 = _dg_t(g, kref[0])
    g1 = _dg_t(g, kref[1])
    g2 = _dg_t(g, kref[2])
    z = jnp.zeros_like(g0[:, :1])
    return (jnp.concatenate([g0[:, 1:], z], axis=1) + g1
            + jnp.concatenate([z, g2[:, :-1]], axis=1))


def _make_kernel(n_layers, t, j, k, sx, sy, crop_offset):
    def kernel(*refs):
        h0_ref = refs[0]
        layer_refs = refs[1:1 + 2 * n_layers]
        (anchor_ref, crops_ref, ox_ref, oy_ref, bone_ref, amat_ref,
         pperm_ref, w_ref, poly_ref, e_ref, gh0_ref) = refs[1 + 2 * n_layers:]

        # ---- decoder conv chain forward, saving backward context -------
        h = h0_ref[...]                       # (blk, T, C0)
        saved = []                            # (input, mask) per layer
        for li in range(n_layers):
            kref = layer_refs[2 * li]
            bref = layer_refs[2 * li + 1]
            pre = _conv_fwd(h, kref, bref)
            if li < n_layers - 1:
                mask = jnp.where(pre >= 0.0, 1.0, 0.01)
                saved.append((h, mask))
                h = pre * mask
            else:
                saved.append((h, None))
                h = pre                        # (blk, T, 3j)

        # ---- rearrange to coordinate-major (blk, L) ---------------------
        blk = h.shape[0]
        L = t * j
        pc = _dg(h, pperm_ref[...])            # (blk, T, 3j) -> [x|y|z]
        px_ = pc[:, :, :j].reshape(blk, L)
        py_ = pc[:, :, j:2 * j].reshape(blk, L)
        pz_ = pc[:, :, 2 * j:].reshape(blk, L)

        e, gx, gy, gz = _energy_core(
            px_, py_, pz_,
            (anchor_ref[:, 0, :], anchor_ref[:, 1, :],
             anchor_ref[:, 2, :]),
            lambda cell: crops_ref[:, cell, :],
            ox_ref[:, :], oy_ref[:, :], bone_ref[:, :], amat_ref[...],
            w_ref, poly_ref, t=t, j=j, k=k, sx=sx, sy=sy,
            crop_offset=crop_offset)
        e_ref[...] = e

        # ---- backward: energy grad -> channel order -> conv chain ------
        gc = jnp.concatenate([gx.reshape(blk, t, j),
                              gy.reshape(blk, t, j),
                              gz.reshape(blk, t, j)], axis=-1)
        g = _dg_t(gc, pperm_ref[...])          # (blk, T, 3j), P^T
        for li in range(n_layers - 1, -1, -1):
            _, mask = saved[li]
            if mask is not None:
                g = g * mask
            g = _conv_bwd(g, layer_refs[2 * li])
        gh0_ref[...] = g

    return kernel


def _decode_energy_and_grad(h0_rt, layers, anchor_t, crops, ox, oy, bone,
                            wvec, poly, t, j, k, full_hw, crop_offset,
                            half_extent):
    """h0_rt (R, B, T, C0) -> (e (R, B), g_h0 (R, B, T, C0)), ONE
    pallas_call; per-window context indexed by the window block only
    (probe rows re-read it — see fused_energy._energy_and_grad)."""
    r, b, tt, c0 = h0_rt.shape
    fh, fw = full_hw
    sx = (fw - 1) / (2.0 * half_extent)
    sy = (fh - 1) / (2.0 * half_extent)
    blk = min(BLOCK, b)
    pad = (-b) % blk
    if pad:
        zf = lambda a, n, ax: jnp.concatenate(  # noqa: E731
            [a, jnp.zeros(a.shape[:ax] + (n,) + a.shape[ax + 1:],
                          a.dtype)], axis=ax)
        h0_rt = zf(h0_rt, pad, 1)
        anchor_t, crops = zf(anchor_t, pad, 0), zf(crops, pad, 0)
        ox, oy, bone = zf(ox, pad, 0), zf(oy, pad, 0), zf(bone, pad, 0)
    bp = b + pad
    nblk = bp // blk
    n_layers = len(layers)
    h0_flat = h0_rt.reshape(r * bp, tt, c0)
    amat = jnp.asarray(_difference_matrix(t, j))
    pperm = jnp.asarray(_pose_perm(j))

    layer_args = []
    layer_specs = []
    for kern, bias in layers:
        layer_args += [kern.astype(jnp.float32),
                       bias.astype(jnp.float32)[None]]
        ks = kern.shape
        layer_specs += [
            pl.BlockSpec(ks, lambda rr, i, n=len(ks): (0,) * n),
            pl.BlockSpec((1, bias.shape[0]), lambda rr, i: (0, 0)),
        ]

    kernel = _make_kernel(n_layers, t, j, k, sx, sy, crop_offset)
    e, gh0 = pl.pallas_call(
        kernel,
        grid=(r, nblk),
        in_specs=[
            pl.BlockSpec((blk, tt, c0),
                         lambda rr, i: (rr * nblk + i, 0, 0)),
            *layer_specs,
            pl.BlockSpec((blk, 3, t * j), lambda rr, i: (i, 0, 0)),
            pl.BlockSpec((blk, k * k, t * j), lambda rr, i: (i, 0, 0)),
            pl.BlockSpec((blk, t * j), lambda rr, i: (i, 0)),
            pl.BlockSpec((blk, t * j), lambda rr, i: (i, 0)),
            pl.BlockSpec((blk, t * j), lambda rr, i: (i, 0)),
            pl.BlockSpec((t * j, t * j), lambda rr, i: (0, 0)),
            pl.BlockSpec((3 * j, 3 * j), lambda rr, i: (0, 0)),
            pl.BlockSpec((1, 8), lambda rr, i: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, poly.shape[-1]), lambda rr, i: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=(
            pl.BlockSpec((blk, 1), lambda rr, i: (rr * nblk + i, 0)),
            pl.BlockSpec((blk, tt, c0),
                         lambda rr, i: (rr * nblk + i, 0, 0))),
        out_shape=(jax.ShapeDtypeStruct((r * bp, 1), jnp.float32),
                   jax.ShapeDtypeStruct((r * bp, tt, c0), jnp.float32)),
        interpret=_interpret(),
    )(h0_flat, *layer_args, anchor_t, crops, ox, oy, bone, amat, pperm,
      wvec, poly)
    e = e.reshape(r, bp)[:, :b]
    gh0 = gh0.reshape(r, bp, tt, c0)[:, :b]
    return e, gh0


@partial(jax.custom_vjp, nondiff_argnums=(8, 9, 10, 11, 12, 13))
def fused_decode_stage_energy(h0_rt, layers, anchor_t, crops, ox, oy,
                              bone, ctx, t, j, k, full_hw, crop_offset,
                              half_extent):
    """Per-window stage-1 energy (R, B) from the PRE-decoder activation
    h0 (R, B, T, C0), differentiable in h0_rt only (decoder weights and
    energy context are constants of the optimization)."""
    e, _ = _decode_energy_and_grad(h0_rt, layers, anchor_t, crops, ox,
                                   oy, bone, ctx[0], ctx[1], t, j, k,
                                   full_hw, crop_offset, half_extent)
    return e


def _fdse_fwd(h0_rt, layers, anchor_t, crops, ox, oy, bone, ctx,
              t, j, k, full_hw, crop_offset, half_extent):
    e, g = _decode_energy_and_grad(h0_rt, layers, anchor_t, crops, ox,
                                   oy, bone, ctx[0], ctx[1], t, j, k,
                                   full_hw, crop_offset, half_extent)
    return e, g


def _fdse_bwd(t, j, k, full_hw, crop_offset, half_extent, g, ct):
    return (ct[:, :, None, None] * g, None, None, None, None, None,
            None, None)


fused_decode_stage_energy.defvjp(_fdse_fwd, _fdse_bwd)
