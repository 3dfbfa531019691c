"""Fused stage-1 objective: decode-side energy value AND gradient in ONE
Pallas kernel (the round-3 "mega-kernel", VERDICT r2 #2).

The production objective eval (reference closure: optimizer.py:226-240,
the whole `total_loss` + autograd backward) lowers under XLA to a forest
of small kernels — fisheye Horner polynomials, atan, crop-coordinate
mapping, dense bilinear contractions, five reductions, and the transposes
of all of those in the backward pass.  At the production batch the eval is
kernel-LAUNCH-bound, not FLOP-bound (TODO.md round-3 notes: ~60-100
kernels/iteration, MFU 1.5%), so this kernel computes the COMPLETE
post-decode energy

    e = w3d*|p - anchor|^2 + smooth*|d2 p/dt2|^2
        + bone*|bl(p) - bl_mean|^2 + vae*|p|^2
        - reproj * sum sampled_crop_heat(project(p))

and its analytic gradient dE/dpose in a single VMEM pass per window
block: fisheye projection (Horner rho(theta) with hand-derived partials),
peak-crop bilinear sampling (dense cell loop, triangle-kernel a.e.
derivative — identical semantics to ops/sampling.bilinear_dense_pixels),
and all pose-space terms.  The decoder matmuls stay in XLA (their weights
exceed the 16 MB scoped VMEM and MXU matmuls are XLA's home turf); the
kernel replaces everything AFTER the decode in both the forward and the
backward direction (exposed as a custom_vjp whose backward is one
elementwise multiply).

Layout (chosen for the VPU, lanes = the point axis):
    pose/anchor  (B, 3, L)   L = T*J points, coordinate-major
    crops        (B, k*k, L) cell-major (loop-invariant: arranged once
                             per launch, outside the solver scan)
    ox/oy/bone   (B, L)
A static Python loop over the k*k cells keeps every op a full-lane
(BLOCK, L) VPU op — the layout lesson from the two lost direction-kernel
A/Bs (per-lane grids forfeit cross-lane vectorization).

Falls back to interpreter mode off-TPU so CPU tests exercise the same
code path.
"""

from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from globalegomocap_tpu.ops.skeleton import KINEMATIC_PARENTS

# Windows per kernel instance.  The scoped-VMEM budget is 16 MB and the
# lane dim L=150 pads to 256, so the double-buffered crop blocks
# (BLOCK, 64, 150->256) plus ~30 (BLOCK, 150->256) intermediates hit
# 34 MB at BLOCK=64 (measured compile OOM); 16 fits with headroom.
BLOCK = 16
_EPS = 1e-9         # fisheye ||xy|| guard (ops/fisheye.py world2camera)


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _atan_coeffs(degree: int = 12) -> np.ndarray:
    """Chebyshev-fit coefficients c_i of atan(t) ~ t * sum c_i (t^2)^i on
    t in [0, 1] (max abs error ~1e-8 at degree 12) — Mosaic has no atan
    lowering (NotImplementedError on TC kernels), so the kernel evaluates
    this range-reduced polynomial instead."""
    t = np.cos(np.pi * (np.arange(2000) + 0.5) / 2000) * 0.5 + 0.5
    y = np.arctan(t) / np.where(t > 0, t, 1.0)
    v = np.vander(t * t, degree + 1, increasing=True)
    c, *_ = np.linalg.lstsq(v, y, rcond=None)
    return c.astype(np.float32)


_ATAN_C = _atan_coeffs()


def _atan(u):
    """Elementwise arctan for Pallas TPU: range-reduce |u| to [0, 1] via
    atan(u) = pi/2 - atan(1/u), evaluate the minimax polynomial."""
    au = jnp.abs(u)
    big = au > 1.0
    t = jnp.where(big, 1.0 / jnp.maximum(au, 1.0), au)
    t2 = t * t
    p = jnp.full_like(t, float(_ATAN_C[-1]))
    for c in _ATAN_C[-2::-1]:
        p = p * t2 + float(c)
    r = t * p
    r = jnp.where(big, (np.pi / 2) - r, r)
    return jnp.sign(u) * r


def _difference_matrix(t: int, j: int) -> np.ndarray:
    """(L, L) matrix A with (A p)_i = p_i - p_parent(i) per frame."""
    parents = np.asarray(KINEMATIC_PARENTS)
    a = np.eye(t * j, dtype=np.float32)
    for f in range(t):
        for jj in range(j):
            a[f * j + jj, f * j + parents[jj]] -= 1.0
    return a


def _energy_core(px_, py_, pz_, anchor_xyz, get_cell, ox, oy, bone,
                 amat, w_ref, poly_ref, *, t, j, k, sx, sy, crop_offset,
                 with_reproj: bool = True):
    """Shared energy value + pose-gradient math on (B, L) arrays.

    Used by the post-decode kernel (`_kernel`), its no-reproj variant
    (`_kernel_noreproj`, the global stage), and the full decode+energy
    kernel (ops/pallas/fused_decode_energy.py).
    get_cell(cell) -> (B, L) crop values for one of the k*k cells.
    `with_reproj=False` (static) skips the fisheye projection and crop
    sampling entirely — get_cell/ox/oy/poly_ref may be None.
    Returns (e (B, 1), gx, gy, gz) each (B, L).
    """
    L = t * j
    w3d = w_ref[0, 0]
    w_sm = w_ref[0, 1]
    w_bone = w_ref[0, 2]
    w_vae = w_ref[0, 3]
    w_rep = w_ref[0, 4]
    cx = w_ref[0, 5]
    cy = w_ref[0, 6]
    ax_, ay_, az_ = anchor_xyz

    if with_reproj:
        # ---- fisheye projection with hand-derived partials --------------
        # (reference: FishEyeCalibrated.py:96-129; ops/fisheye.world2camera)
        z2 = -pz_
        n2 = px_ * px_ + py_ * py_
        n = jnp.sqrt(n2)
        ns = jnp.maximum(n, _EPS)
        inv_ns = 1.0 / ns
        u = z2 * inv_ns
        theta = _atan(u)   # Mosaic has no atan lowering; see _atan
        # Horner rho(theta) and rho'(theta), static unroll over coeffs
        npoly = poly_ref.shape[1]
        rho = jnp.zeros_like(theta)
        for i in range(npoly - 1, -1, -1):
            rho = rho * theta + poly_ref[0, i]
        drho = jnp.zeros_like(theta)
        for i in range(npoly - 1, 0, -1):
            drho = drho * theta + poly_ref[0, i] * float(i)
        inv = rho * inv_ns
        ix = ((px_ * inv + cx) - crop_offset) * sx - ox
        iy = (py_ * inv + cy) * sy - oy

        ok = n > _EPS                   # clamp region: ns constant there
        dns_dx = jnp.where(ok, px_ * inv_ns, 0.0)
        dns_dy = jnp.where(ok, py_ * inv_ns, 0.0)
        du_dx = -u * inv_ns * dns_dx
        du_dy = -u * inv_ns * dns_dy
        du_dz = -inv_ns                 # d z2/d pz = -1
        dtheta = 1.0 / (1.0 + u * u)
        common = drho * dtheta * inv_ns
        dinv_dx = common * du_dx - inv * inv_ns * dns_dx
        dinv_dy = common * du_dy - inv * inv_ns * dns_dy
        dinv_dz = common * du_dz
        dPx_dx = inv + px_ * dinv_dx
        dPx_dy = px_ * dinv_dy
        dPx_dz = px_ * dinv_dz
        dPy_dx = py_ * dinv_dx
        dPy_dy = inv + py_ * dinv_dy
        dPy_dz = py_ * dinv_dz

        # ---- dense bilinear crop sampling + derivative ------------------
        # s = sum_cells crop * tri(ix - cxc) * tri(iy - cyc) (align_corners
        # + zero-padding semantics of ops/sampling.bilinear_dense_pixels)
        s = jnp.zeros_like(ix)
        ds_dix = jnp.zeros_like(ix)
        ds_diy = jnp.zeros_like(ix)
        for cell in range(k * k):
            cyc = float(cell // k)
            cxc = float(cell % k)
            ax = ix - cxc
            ay = iy - cyc
            wx = jnp.maximum(0.0, 1.0 - jnp.abs(ax))
            wy = jnp.maximum(0.0, 1.0 - jnp.abs(ay))
            dwx = jnp.where(jnp.abs(ax) < 1.0, -jnp.sign(ax), 0.0)
            dwy = jnp.where(jnp.abs(ay) < 1.0, -jnp.sign(ay), 0.0)
            c = get_cell(cell)
            s = s + c * wx * wy
            ds_dix = ds_dix + c * dwx * wy
            ds_diy = ds_diy + c * wx * dwy
        e_rep = -jnp.sum(s, axis=-1, keepdims=True)          # (B, 1)

        gx_rep = -w_rep * (ds_dix * sx * dPx_dx + ds_diy * sy * dPy_dx)
        gy_rep = -w_rep * (ds_dix * sx * dPx_dy + ds_diy * sy * dPy_dy)
        gz_rep = -w_rep * (ds_dix * sx * dPx_dz + ds_diy * sy * dPy_dz)
    else:
        e_rep = jnp.zeros((px_.shape[0], 1), px_.dtype)
        gx_rep = gy_rep = gz_rep = 0.0

    # ---- pose-space terms ----------------------------------------------
    dx3 = px_ - ax_
    dy3 = py_ - ay_
    dz3 = pz_ - az_
    e_3d = jnp.sum(dx3 * dx3 + dy3 * dy3 + dz3 * dz3, axis=-1,
                   keepdims=True)

    # acceleration: acc[l] = p[l] - 2 p[l+J] + p[l+2J]  (lane offsets)
    def acc_of(c):
        return c[:, :L - 2 * j] - 2.0 * c[:, j:L - j] + c[:, 2 * j:]

    accx, accy, accz = acc_of(px_), acc_of(py_), acc_of(pz_)
    e_acc = jnp.sum(accx * accx + accy * accy + accz * accz, axis=-1,
                    keepdims=True)

    def acc_t(a):
        # transpose of the second-difference operator (zero-padded shifts)
        z = jnp.zeros((a.shape[0], j), a.dtype)
        z2_ = jnp.zeros((a.shape[0], 2 * j), a.dtype)
        return (jnp.concatenate([a, z2_], axis=-1)
                - 2.0 * jnp.concatenate([z, a, z], axis=-1)
                + jnp.concatenate([z2_, a], axis=-1))

    # bone lengths via the (L, L) difference matrix on the MXU
    dbx = jax.lax.dot_general(px_, amat, (((1,), (1,)), ((), ())),
                              preferred_element_type=jnp.float32)
    dby = jax.lax.dot_general(py_, amat, (((1,), (1,)), ((), ())),
                              preferred_element_type=jnp.float32)
    dbz = jax.lax.dot_general(pz_, amat, (((1,), (1,)), ((), ())),
                              preferred_element_type=jnp.float32)
    sq = dbx * dbx + dby * dby + dbz * dbz
    nz = sq > 0.0
    bl = jnp.sqrt(jnp.where(nz, sq, 1.0)) * nz  # zero-safe (ops/skeleton)
    diff_b = bl - bone
    e_bone = jnp.sum(diff_b * diff_b, axis=-1, keepdims=True)
    r = jnp.where(nz, 2.0 * diff_b / jnp.where(nz, bl, 1.0), 0.0)

    def bone_grad(dc):
        return jax.lax.dot_general(r * dc, amat, (((1,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32)

    e_vae = jnp.sum(px_ * px_ + py_ * py_ + pz_ * pz_, axis=-1,
                    keepdims=True)

    e = (w3d * e_3d + w_sm * e_acc + w_bone * e_bone
         + w_vae * e_vae + w_rep * e_rep)
    gx = (2.0 * w3d * dx3 + w_sm * acc_t(2.0 * accx)
          + w_bone * bone_grad(dbx) + 2.0 * w_vae * px_ + gx_rep)
    gy = (2.0 * w3d * dy3 + w_sm * acc_t(2.0 * accy)
          + w_bone * bone_grad(dby) + 2.0 * w_vae * py_ + gy_rep)
    gz = (2.0 * w3d * dz3 + w_sm * acc_t(2.0 * accz)
          + w_bone * bone_grad(dbz) + 2.0 * w_vae * pz_ + gz_rep)
    return e, gx, gy, gz


def _kernel(pose_ref, anchor_ref, crops_ref, ox_ref, oy_ref, bone_ref,
            amat_ref, w_ref, poly_ref, e_ref, g_ref, *, t, j, k, sx, sy,
            crop_offset):
    # bf16 crops (cfg.heatmap_dtype): HBM reads the half-width stream —
    # the crop blocks are the kernel's dominant input traffic — and ONE
    # whole-block convert restores f32 for the energy math.  Converting
    # per cell would slice single bf16 sublanes (packed 2-per-row on TPU);
    # the block convert keeps every slice an f32 sublane op.
    crops = crops_ref[...].astype(jnp.float32)
    e, gx, gy, gz = _energy_core(
        pose_ref[:, 0, :], pose_ref[:, 1, :], pose_ref[:, 2, :],
        (anchor_ref[:, 0, :], anchor_ref[:, 1, :], anchor_ref[:, 2, :]),
        lambda cell: crops[:, cell, :],
        ox_ref[:, :], oy_ref[:, :], bone_ref[:, :], amat_ref[...],
        w_ref, poly_ref, t=t, j=j, k=k, sx=sx, sy=sy,
        crop_offset=crop_offset)
    e_ref[...] = e
    g_ref[:, 0, :] = gx
    g_ref[:, 1, :] = gy
    g_ref[:, 2, :] = gz


def _energy_and_grad(pose_rt, anchor_t, crops, ox, oy, bone, wvec, poly,
                     t, j, k, full_hw, crop_offset, half_extent):
    """pose_rt (R, B, 3, L) -> (e (R, B), grad (R, B, 3, L)) in ONE
    pallas_call.

    R is the solver's line-search candidate axis: the grid is
    (R, B/BLOCK) and the per-window context (anchor/crops/origins/bones)
    is indexed by the window block ONLY — the R probes re-read the same
    loop-invariant context blocks instead of the caller materializing an
    R-times-tiled copy per evaluation.
    """
    r, b, _, L = pose_rt.shape
    fh, fw = full_hw
    sx = (fw - 1) / (2.0 * half_extent)
    sy = (fh - 1) / (2.0 * half_extent)
    # Mosaic requires the block's second-to-last dim (the window rows of
    # the (blk, 1) energy output) to be a multiple of 8 (or the full
    # array dim): round the block UP to a multiple of 8 and let the
    # padding absorb the remainder (headline-sized launches hit b=60)
    #
    # The double-buffered crop block (blk, k*k, L->256 lanes) dominates
    # scoped VMEM and scales with k^2: the guard-trip fast path
    # (OptimizeConfig.guard_crop) runs k=16/24 crops through this same
    # kernel, so shrink the window block until that stream fits the
    # 16 MB budget (floor 8 — the multiple-of-8 rule above).  k=8 f32
    # (the production point) keeps blk=16 unchanged.
    lanes = -(-L // 128) * 128        # lane padding (150 -> 256)
    cap = BLOCK
    while cap > 8 and 2 * cap * k * k * lanes * crops.dtype.itemsize \
            > 8 * 2**20:
        cap //= 2
    blk = min(cap, -(-b // 8) * 8)
    pad = (-b) % blk
    if pad:
        zf = lambda a, n, ax: jnp.concatenate(  # noqa: E731
            [a, jnp.zeros(a.shape[:ax] + (n,) + a.shape[ax + 1:],
                          a.dtype)], axis=ax)
        pose_rt = zf(pose_rt, pad, 1)
        anchor_t, crops = zf(anchor_t, pad, 0), zf(crops, pad, 0)
        ox, oy, bone = (zf(ox, pad, 0), zf(oy, pad, 0),
                        zf(bone, pad, 0))
    bp = b + pad
    nblk = bp // blk
    pose_flat = pose_rt.reshape(r * bp, 3, L)
    amat = jnp.asarray(_difference_matrix(t, j))
    kern = partial(_kernel, t=t, j=j, k=k, sx=sx, sy=sy,
                   crop_offset=crop_offset)
    e, g = pl.pallas_call(
        kern,
        grid=(r, nblk),
        in_specs=[
            pl.BlockSpec((blk, 3, L), lambda rr, i: (rr * nblk + i, 0, 0)),
            pl.BlockSpec((blk, 3, L), lambda rr, i: (i, 0, 0)),
            pl.BlockSpec((blk, k * k, L), lambda rr, i: (i, 0, 0)),
            pl.BlockSpec((blk, L), lambda rr, i: (i, 0)),
            pl.BlockSpec((blk, L), lambda rr, i: (i, 0)),
            pl.BlockSpec((blk, L), lambda rr, i: (i, 0)),
            pl.BlockSpec((L, L), lambda rr, i: (0, 0)),
            pl.BlockSpec((1, 8), lambda rr, i: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, poly.shape[-1]), lambda rr, i: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=(
            pl.BlockSpec((blk, 1), lambda rr, i: (rr * nblk + i, 0)),
            pl.BlockSpec((blk, 3, L),
                         lambda rr, i: (rr * nblk + i, 0, 0))),
        out_shape=(jax.ShapeDtypeStruct((r * bp, 1), jnp.float32),
                   jax.ShapeDtypeStruct((r * bp, 3, L), jnp.float32)),
        interpret=_interpret(),
    )(pose_flat, anchor_t, crops, ox, oy, bone, amat, wvec, poly)
    e = e.reshape(r, bp)[:, :b]
    g = g.reshape(r, bp, 3, L)[:, :b]
    return e, g


@partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9, 10, 11, 12))
def fused_stage_energy(pose_rt, anchor_t, crops, ox, oy, bone, ctx,
                       t, j, k, full_hw, crop_offset, half_extent):
    """Per-window total stage-1 energy (R, B), differentiable in pose_rt
    (R, B, 3, L).

    ctx = (wvec (1, 8): [w3d, smooth, bone, vae, reproj, cx, cy, 0],
           poly (1, P): ascending W2C polynomial).
    All non-pose inputs are treated as constants of the optimization
    (matching the XLA path: anchors/maps/bones do not receive gradients).
    """
    e, _ = _energy_and_grad(pose_rt, anchor_t, crops, ox, oy, bone,
                            ctx[0], ctx[1], t, j, k, full_hw, crop_offset,
                            half_extent)
    return e


def _fse_fwd(pose_rt, anchor_t, crops, ox, oy, bone, ctx,
             t, j, k, full_hw, crop_offset, half_extent):
    e, g = _energy_and_grad(pose_rt, anchor_t, crops, ox, oy, bone,
                            ctx[0], ctx[1], t, j, k, full_hw, crop_offset,
                            half_extent)
    return e, g


def _fse_bwd(t, j, k, full_hw, crop_offset, half_extent, g, ct):
    # ct: (R, B) cotangent of the per-window energies
    return (ct[:, :, None, None] * g, None, None, None, None, None, None)


fused_stage_energy.defvjp(_fse_fwd, _fse_bwd)


# ---------------------------------------------------------------------------
# No-reproj variant: the GLOBAL stage's energy (3d/accel/bone/vae only,
# reference weight split optimizer.py:352-353 sets reproj=0) in one kernel.
# No crop buffers in VMEM -> a 4x larger window block fits.
# ---------------------------------------------------------------------------

NR_BLOCK = 64


def _kernel_noreproj(pose_ref, anchor_ref, bone_ref, amat_ref, w_ref,
                     e_ref, g_ref, *, t, j):
    e, gx, gy, gz = _energy_core(
        pose_ref[:, 0, :], pose_ref[:, 1, :], pose_ref[:, 2, :],
        (anchor_ref[:, 0, :], anchor_ref[:, 1, :], anchor_ref[:, 2, :]),
        None, None, None, bone_ref[:, :], amat_ref[...],
        w_ref, None, t=t, j=j, k=0, sx=0.0, sy=0.0, crop_offset=0.0,
        with_reproj=False)
    e_ref[...] = e
    g_ref[:, 0, :] = gx
    g_ref[:, 1, :] = gy
    g_ref[:, 2, :] = gz


def _energy_and_grad_noreproj(pose_rt, anchor_t, bone, wvec, t, j):
    """pose_rt (R, B, 3, L) -> (e (R, B), grad (R, B, 3, L)) in ONE
    pallas_call; context indexed by the window block only (probe rows
    re-read it — see `_energy_and_grad`)."""
    r, b, _, L = pose_rt.shape
    # block rows must be a multiple of 8 (Mosaic last-two-dims rule on
    # the (blk, 1) energy output); see _energy_and_grad
    blk = min(NR_BLOCK, -(-b // 8) * 8)
    pad = (-b) % blk
    if pad:
        zf = lambda a, n, ax: jnp.concatenate(  # noqa: E731
            [a, jnp.zeros(a.shape[:ax] + (n,) + a.shape[ax + 1:],
                          a.dtype)], axis=ax)
        pose_rt = zf(pose_rt, pad, 1)
        anchor_t, bone = zf(anchor_t, pad, 0), zf(bone, pad, 0)
    bp = b + pad
    nblk = bp // blk
    pose_flat = pose_rt.reshape(r * bp, 3, L)
    amat = jnp.asarray(_difference_matrix(t, j))
    kern = partial(_kernel_noreproj, t=t, j=j)
    e, g = pl.pallas_call(
        kern,
        grid=(r, nblk),
        in_specs=[
            pl.BlockSpec((blk, 3, L), lambda rr, i: (rr * nblk + i, 0, 0)),
            pl.BlockSpec((blk, 3, L), lambda rr, i: (i, 0, 0)),
            pl.BlockSpec((blk, L), lambda rr, i: (i, 0)),
            pl.BlockSpec((L, L), lambda rr, i: (0, 0)),
            pl.BlockSpec((1, 8), lambda rr, i: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=(
            pl.BlockSpec((blk, 1), lambda rr, i: (rr * nblk + i, 0)),
            pl.BlockSpec((blk, 3, L),
                         lambda rr, i: (rr * nblk + i, 0, 0))),
        out_shape=(jax.ShapeDtypeStruct((r * bp, 1), jnp.float32),
                   jax.ShapeDtypeStruct((r * bp, 3, L), jnp.float32)),
        interpret=_interpret(),
    )(pose_flat, anchor_t, bone, amat, wvec)
    e = e.reshape(r, bp)[:, :b]
    g = g.reshape(r, bp, 3, L)[:, :b]
    return e, g


@partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def fused_stage_energy_noreproj(pose_rt, anchor_t, bone, wvec, t, j):
    """Per-window no-reproj stage energy (R, B), differentiable in
    pose_rt (R, B, 3, L).  wvec as in `fused_stage_energy` (its reproj
    weight is ignored — the sampling term does not exist here)."""
    e, _ = _energy_and_grad_noreproj(pose_rt, anchor_t, bone, wvec, t, j)
    return e


def _fsen_fwd(pose_rt, anchor_t, bone, wvec, t, j):
    e, g = _energy_and_grad_noreproj(pose_rt, anchor_t, bone, wvec, t, j)
    return e, g


def _fsen_bwd(t, j, g, ct):
    return (ct[:, :, None, None] * g, None, None, None)


fused_stage_energy_noreproj.defvjp(_fsen_fwd, _fsen_bwd)
