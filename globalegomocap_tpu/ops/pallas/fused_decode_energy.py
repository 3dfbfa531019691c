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
energy core's coordinate-major (3, T*J) layout by constant selector
matmuls + masked sublane reductions (and their exact transposes on the
way back) — see `_coord_selectors` for why Mosaic forbids the direct
reshape/concat forms.
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


def _coord_selectors(t: int, j: int):
    """Selector constants for the channel→coordinate-major rearrangement.

    Mosaic cannot shape-cast the (T, 3j) minor dims of the decoded pose
    into one L=T*J lane dim ("unsupported shape cast"), and lane-slice
    concatenation trips its sublane-offset rule — so the flatten is
    expressed as pure matmul + masked sublane reduction instead:

        px[b, l] = sum_tt (h @ SX)[b, tt, l] * F[tt, l]

    SX/SY/SZ (3j, L):  SC[c, l] = 1 iff c == (l % j)*3 + coord — places
    joint jj's coord channel at EVERY frame's lane tt*j+jj; F (t, L):
    F[tt, l] = 1 iff tt == l // j — keeps only the right frame's row.
    The decoder channel permutation is folded into the selectors, and the
    backward is the exact transpose (broadcast over sublanes, contract
    lanes).  Cost: 6 tiny (blk*T, 3j)x(3j, L) MXU contractions/eval —
    noise next to the conv chain."""
    L = t * j
    sels = np.zeros((3, 3 * j, L), dtype=np.float32)
    fmask = np.zeros((t, L), dtype=np.float32)
    for l in range(L):
        jj = l % j
        for coord in range(3):
            sels[coord, jj * 3 + coord, l] = 1.0
        fmask[l // j, l] = 1.0
    return sels, fmask


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
         sel_ref, f_ref, w_ref, poly_ref, e_ref, gh0_ref) \
            = refs[1 + 2 * n_layers:]

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
        # selector matmul + masked sublane reduction (see _coord_selectors
        # for why Mosaic forbids the direct reshape/concat forms)
        fm = f_ref[...][None]                  # (1, T, L)
        px_ = jnp.sum(_dg(h, sel_ref[0]) * fm, axis=1)   # (blk, L)
        py_ = jnp.sum(_dg(h, sel_ref[1]) * fm, axis=1)
        pz_ = jnp.sum(_dg(h, sel_ref[2]) * fm, axis=1)

        # bf16 crops: one whole-block convert (see fused_energy._kernel)
        crops = crops_ref[...].astype(jnp.float32)
        e, gx, gy, gz = _energy_core(
            px_, py_, pz_,
            (anchor_ref[:, 0, :], anchor_ref[:, 1, :],
             anchor_ref[:, 2, :]),
            lambda cell: crops[:, cell, :],
            ox_ref[:, :], oy_ref[:, :], bone_ref[:, :], amat_ref[...],
            w_ref, poly_ref, t=t, j=j, k=k, sx=sx, sy=sy,
            crop_offset=crop_offset)
        e_ref[...] = e

        # ---- backward: energy grad -> channel order -> conv chain ------
        # exact transpose of the flatten: broadcast each (blk, L) grad
        # over sublanes, frame-mask, contract lanes with the selector
        g = (_dg_t(gx[:, None, :] * fm, sel_ref[0])
             + _dg_t(gy[:, None, :] * fm, sel_ref[1])
             + _dg_t(gz[:, None, :] * fm, sel_ref[2]))  # (blk, T, 3j)
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
    sels_np, fmask_np = _coord_selectors(t, j)
    sels = jnp.asarray(sels_np)
    fmask = jnp.asarray(fmask_np)

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
            pl.BlockSpec((3, 3 * j, t * j), lambda rr, i: (0, 0, 0)),
            pl.BlockSpec((t, t * j), lambda rr, i: (0, 0)),
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
    )(h0_flat, *layer_args, anchor_t, crops, ox, oy, bone, amat, sels,
      fmask, wvec, poly)
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
