"""The two-stage latent optimization pipeline, vmapped over windows.

Reference control flow (optimizer.py:311-507): for each 10-frame window of
a sequence — serially — (1) optimize the LOCAL pose in VAE latent space
with the heatmap reprojection term, (2) lift the result to the
relative-global frame via the SLAM camera matrices, (3) optimize the GLOBAL
pose in the second VAE's latent space (no reprojection), then merge
overlapping windows and Gaussian-smooth.

TPU-first re-design: all windows are materialized as one (W, T, ...) batch;
both stages run as ONE `vmap`-ed batched L-BFGS launch each (JAX's
while-loop batching keeps converged windows frozen).  The encoder init, the
coordinate lifts and the merge are single batched ops.  The window axis is
the sharding axis for multi-chip execution (parallel/mesh.py).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from globalegomocap_tpu.config import OptimizeConfig
from globalegomocap_tpu.energy.terms import (
    EnergyWeights, total_energy_from_pose)
from globalegomocap_tpu.models.conv_vae import ConvVAE
from globalegomocap_tpu.ops import fisheye
from globalegomocap_tpu.ops.filtering import gaussian_filter1d
from globalegomocap_tpu.ops.skeleton import mean_bone_lengths
from globalegomocap_tpu.ops.transforms import (
    relative_global_pose, relative_to_global_pose, transform_pose)
from globalegomocap_tpu.optimize.lbfgs import (
    lbfgs_minimize, lbfgs_minimize_fixed, adam_minimize)
from globalegomocap_tpu.optimize.window import (
    slice_windows, merge_windows, merge_windows_matmul)


class ChunkResult(NamedTuple):
    """Merged per-chunk sequences (covered frames only, like the reference's
    merge): all in world frame except mid_local."""
    estimated: jnp.ndarray   # (N, 15, 3) raw input lifted to world
    mid: jnp.ndarray         # (N, 15, 3) after stage 1 (local), world frame
    mid_local: jnp.ndarray   # (N, 15, 3) after stage 1, camera frame
    optimized: jnp.ndarray   # (N, 15, 3) after stage 2, world frame
    gt: jnp.ndarray          # (N, 15, 3)


def stage_weights(cfg: OptimizeConfig):
    """Derive the two stages' energy weights from CLI-level weights
    (reference: optimizer.py:352-358)."""
    e = cfg.energy
    g3d = e.weight_3d if e.global_weight_3d is None else e.global_weight_3d
    gsm = e.smooth if e.global_smooth is None else e.global_smooth
    global_w = EnergyWeights.create(
        weight_3d=g3d, smooth=gsm, bone_length=0.01,
        vae=e.vae, reproj=0.0, gmm=e.gmm, soft_smooth=e.soft_smooth)
    local_w = EnergyWeights.create(
        weight_3d=e.weight_3d / 1e4, smooth=e.smooth / 100.0,
        bone_length=e.bone_length, vae=e.vae, reproj=e.reproj, gmm=e.gmm,
        soft_smooth=e.soft_smooth)
    return local_w, global_w


def _solve(cfg: OptimizeConfig, loss, z0):
    s = cfg.solver
    if s.method == "adam":
        return adam_minimize(loss, z0, steps=s.adam_steps, lr=s.adam_lr).x
    if s.method == "lbfgs_fixed":
        return lbfgs_minimize_fixed(
            loss, z0, max_iter=s.max_iter, history_size=s.history_size,
            lr=s.lr, step_candidates=tuple(s.step_candidates),
            fused_probes=s.fused_probes,
            compact_direction=s.compact_direction,
            circular_history=s.circular_history,
            pallas_direction=s.pallas_direction,
            unroll=s.unroll).x
    return lbfgs_minimize(
        loss, z0, max_iter=s.max_iter, history_size=s.history_size,
        lr=s.lr, tolerance_change=s.tolerance_change,
        tolerance_grad=s.tolerance_grad, max_ls_evals=s.max_ls_evals).x


def _stage2_cfg(cfg: OptimizeConfig) -> OptimizeConfig:
    """Apply the stage-2 solver overrides (solver.global_max_iter): the
    residual global stage converges from an exact init, so its iteration
    budget can be decoupled from the local stage's."""
    if cfg.solver.global_max_iter is None:
        return cfg
    from dataclasses import replace as _rp
    return _rp(cfg, solver=_rp(cfg.solver,
                               max_iter=cfg.solver.global_max_iter))


def optimize_stage(model: ConvVAE, variables, init_pose, heatmaps,
                   mean_bl, camera, weights: EnergyWeights,
                   use_reproj: bool, cfg: OptimizeConfig,
                   origins=None, full_hw=None,
                   residual: bool = False) -> jnp.ndarray:
    """One optimization stage over a batch of windows.

    init_pose: (W, T, 15, 3) the stage's anchor/init poses.
    heatmaps:  (W, T, 15, H, W) per-joint score maps (ignored when
               use_reproj is False).  May be pre-cropped peak windows —
               then `origins` (W, T, 15, 2) and `full_hw` carry the crop
               placement (the pipeline crops the raw per-frame maps BEFORE
               windowing; see crop_heatmaps_channels_last).
    mean_bl:   (W, 15) per-window mean bone lengths.
    Returns the decoded optimized poses (W, T, 15, 3).
    """
    w, t = init_pose.shape[0], init_pose.shape[1]
    flat = init_pose.reshape(w, t, 45)

    if use_reproj and cfg.heatmap_dtype == "bfloat16":
        # cast once per launch (loop-invariant, hoisted out of the solver
        # scan); sampling promotes back to f32 at the weight multiply and
        # the fused mega-kernel converts each crop block in-kernel — the
        # solver's per-eval crop reads move half the HBM bytes
        heatmaps = heatmaps.astype(jnp.bfloat16)

    if use_reproj and cfg.heatmap_crop > 0 and origins is None:
        # shrink the solver's sampling working set to peak-centered crops
        # (ONCE per launch; the sampling gather dominates the eval cost)
        from globalegomocap_tpu.energy.terms import (
            crop_heatmaps, crop_heatmaps_at_centers,
            projected_estimate_centers)
        if cfg.crop_center == "estimate":
            cen = projected_estimate_centers(
                init_pose, camera,
                heatmaps.shape[-2], heatmaps.shape[-1])
            heatmaps, origins, full_hw = crop_heatmaps_at_centers(
                heatmaps, cfg.heatmap_crop, cen)
        else:
            heatmaps, origins, full_hw = crop_heatmaps(heatmaps,
                                                       cfg.heatmap_crop)

    # latent init (one batched encode for all windows): the default is the
    # deterministic encoder mean; init='sample' reproduces the reference's
    # reparameterized-sample init (optimizer.py:257, SeqConvVAE.py:159-169)
    # keyed by cfg.solver.init_seed.
    # With compute_dtype=bfloat16 the ENCODE still runs f32 (once per
    # launch — cost noise): bf16 is an EVAL-precision knob for the
    # solver's ~30-70 decode evals per stage; a bf16-perturbed init mu
    # measurably shifts where 12 L-BFGS iterations land (the all-bf16
    # arm's +0.001 bone-aligned cost persisted with an f32 OUTPUT decode
    # — quality_iter_crop_bf16*.json — so the drift enters at init).
    # bf16 sub-tiers (cfg.compute_dtype) — "bfloat16" is the quality-gated
    # production MIXED tier (f32 encode + f32 output decode/offset);
    # "bfloat16_f32enc" keeps only the encode f32 (the quality evidence
    # localized the bone drift to the bf16-encoded init mu, NOT the output
    # decode — quality_iter_crop_bf16*.json); "bfloat16_f32head" narrows
    # that guard further to the fc_mu head alone (bf16 encoder convs, ONE
    # f32 5120x2048 matmul; fc_var stays bf16 — log_var only feeds
    # init='sample') — the full f32 encode costs ~12% of launch time
    # (bench_gap_probe.json) and the drift enters at the init mu, so an
    # f32 head may buy near-pure-bf16 speed at mixed-tier quality;
    # "bfloat16_pure" runs everything bf16 (the pre-mixed semantics, kept
    # as a speed reference); "bfloat16_delta" keeps the mixed tier's f32
    # encode/output but runs the SOLVER STATE in bf16 as a delta around
    # the f32 mu — dtype_tier_ab.json showed the pure tier's +9% comes
    # from the bf16 solver state (z/history/probe arrays are 2048-dim x
    # batch; halved HBM traffic across every iteration), NOT from the
    # encode: every f32-mu tier (mixed/f32enc/f32head) measured the same
    # speed because an f32 mu drags the whole state to f32.  Iterating
    # dz (init 0) in bf16 keeps the init EXACT and scales the bf16
    # rounding to ||dz|| << ||mu|| (the drift that cost pure +0.0007
    # bone was the bf16 accumulation of the iterate at mu's scale);
    # every energy eval sees bf16 inputs exactly as the mixed tier does
    # (the bf16 decoder casts its input), and the returned pose is the
    # f32 decode of mu + dz.  Batched-solver paths only; the vmapped
    # fallback runs mixed semantics.
    pure_bf16 = cfg.compute_dtype == "bfloat16_pure"
    f32_head = cfg.compute_dtype == "bfloat16_f32head"
    delta_bf16 = cfg.compute_dtype == "bfloat16_delta"
    f32_output = cfg.compute_dtype in ("bfloat16", "bfloat16_delta")
    f32_model = model
    if getattr(model, "dtype", jnp.float32) != jnp.float32:
        if f32_head:
            f32_model = model.clone(head_dtype=jnp.float32)
        elif not pure_bf16:
            f32_model = model.clone(dtype=jnp.float32)
    mu, log_var = f32_model.apply(variables, flat, False,
                                  method=ConvVAE.encode)
    if cfg.solver.init == "sample":
        from globalegomocap_tpu.models.conv_vae import reparameterize
        mu = reparameterize(mu, log_var,
                            jax.random.PRNGKey(cfg.solver.init_seed))

    smoothed = None
    if float(cfg.energy.soft_smooth) > 0.0:
        # pre-smoothed anchor for the soft-smooth term (reference:
        # optimizer.py:382-383 smooths each window's input over time)
        smoothed = gaussian_filter1d(init_pose, cfg.input_smooth_sigma,
                                     axis=1)

    impl = cfg.decoder_impl or ("dense" if cfg.dense_decoder else "conv")
    ddtype = jnp.bfloat16 if cfg.decoder_dtype == "bfloat16" else None

    def _make_decode_batch(mdl, dt):
        if impl == "dense":
            # decoder as a banded-matmul chain: fewer kernels per
            # objective eval, which is the binding constraint
            # (solver_floor.json)
            from globalegomocap_tpu.models.dense_decoder import (
                make_dense_decoder)
            return make_dense_decoder(mdl, variables, dt)
        if impl == "shift":
            # 3 shift-matmuls per layer: band-matmul kernel economy
            # without the band's FLOP/weight-traffic inflation
            from globalegomocap_tpu.models.dense_decoder import (
                make_shift_decoder)
            return make_shift_decoder(mdl, variables, dt)

        def decode_conv(z):
            return mdl.apply(variables, z, False,
                             method=ConvVAE.decode_to_bodypose)
        return decode_conv

    decode_batch = _make_decode_batch(model, ddtype)
    # Mixed-precision OUTPUT: with compute_dtype=bfloat16 the solver's
    # ~30-70 decode evals per stage run in bf16 (+24% at the 320-chunk
    # point, c320_dtype_rematch_ab.json), but the RETURNED pose — the
    # final point's decode, and the residual offset it composes with —
    # is decoded in f32.  All-bf16 measured its entire bone-aligned
    # quality cost (~+0.001, exactly bf16 output-rounding magnitude at
    # pose scale ~1) in the output decode, while raw-global IMPROVED
    # (quality_iter_crop_bf16*.json); two extra f32 decodes per stage
    # are launch noise.
    if f32_output and f32_model is not model:
        decode_out = _make_decode_batch(f32_model, jnp.float32)
    else:
        decode_out = decode_batch

    def decode(z):
        return decode_batch(z[None])[0]

    if cfg.solver.remat:
        decode = jax.checkpoint(decode)

    offset = None
    if residual:
        # residual stage (EnergyConfig.global_residual): the stage output
        # is p(z) = anchor + decode(z) - decode(z0) — exact at the init
        # (no decode floor), corrections confined to the prior's tangent
        # space.  The offset is a per-window constant of the solve.
        offset = (init_pose - decode_out(mu)).astype(jnp.float32)

    s = cfg.solver
    use_batched = (s.method == "lbfgs_fixed"
                   and (s.fused_energy or s.batched_solver)
                   and smoothed is None
                   and float(cfg.energy.overlap_consistency) == 0.0)

    # bf16 delta-state plumbing (see the tier comment above): the solver
    # iterates z_init = 0 in bf16; _z_eff recenters every probe batch at
    # the f32 mu before the decode, and _z_star recovers the f32 final
    # point.  No-ops for every other tier.
    z_init, delta_c = mu, None
    if delta_bf16 and use_batched:
        delta_c = mu.astype(jnp.float32)
        z_init = jnp.zeros_like(mu, dtype=jnp.bfloat16)

    def _z_eff(z3_):
        return (z3_ if delta_c is None
                else z3_.astype(jnp.float32) + delta_c[None])

    def _z_star(x):
        return x if delta_c is None else delta_c + x.astype(jnp.float32)
    if (use_batched and s.fused_energy and use_reproj
            and origins is not None):
        # MEGA-KERNEL PATH: the whole post-decode energy (value + analytic
        # grad) is ONE Pallas kernel per eval; the solver runs explicitly
        # batched so the kernel sees the full (K, W) probe batch and the
        # per-window context stays loop-invariant (no per-eval tiling).
        from globalegomocap_tpu.ops.pallas.fused_energy import (
            fused_stage_energy)
        from globalegomocap_tpu.optimize.lbfgs import (
            lbfgs_minimize_fixed_batched)
        kk = heatmaps.shape[-1]
        L = t * 15
        anchor_t = jnp.moveaxis(init_pose.reshape(w, L, 3), -1, 1)
        crops_cm = jnp.swapaxes(heatmaps.reshape(w, L, kk * kk), 1, 2)
        f_ox = origins[..., 1].reshape(w, L)
        f_oy = origins[..., 0].reshape(w, L)
        bone_t = jnp.tile(mean_bl, (1, t))                   # (W, L)
        wvec = jnp.stack([
            weights.weight_3d, weights.smooth, weights.bone_length,
            weights.vae, weights.reproj, camera.center[0],
            camera.center[1], jnp.asarray(0.0, jnp.float32),
        ])[None].astype(jnp.float32)
        poly = camera.poly_w2c[None].astype(jnp.float32)
        ctx = (wvec, poly)
        hg = cfg.heatmap
        latent = mu.shape[-1]

        if s.fused_decode and offset is None:
            # v2: the conv chain joins the kernel; only the first dense
            # stays in XLA (42 MB of weights > scoped VMEM) — the
            # in-kernel decode cannot take a residual offset, so residual
            # stages use the v1 (post-decode) kernel below
            from globalegomocap_tpu.models.fold_bn import fold_batchnorm
            from globalegomocap_tpu.ops.pallas.fused_decode_energy import (
                fused_decode_stage_energy)
            fv = (fold_batchnorm(variables)
                  if variables.get("batch_stats") else variables)
            prm = fv["params"]
            first_w = prm["decoder_input"]["kernel"].astype(jnp.float32)
            first_b = prm["decoder_input"]["bias"].astype(jnp.float32)
            n_dec = len(model.hidden_dims) - 1
            names = [f"dec_{i}" for i in range(n_dec)] + ["final_block",
                                                          "final_conv"]
            dec_layers = []
            for nme in names:
                node = (prm[nme]["conv"] if "conv" in prm.get(nme, {})
                        else prm[nme])
                dec_layers.append((node["kernel"], node["bias"]))
            c0 = model.hidden_dims[-1]

            def vg_batch(z3):
                def batch_energy(z3_):
                    rr, bb = z3_.shape[0], z3_.shape[1]
                    h0 = (_z_eff(z3_).reshape(rr * bb, latent) @ first_w
                          + first_b).reshape(rr, bb, t, c0)
                    return fused_decode_stage_energy(
                        h0, dec_layers, anchor_t, crops_cm, f_ox, f_oy,
                        bone_t, ctx, t, 15, kk, full_hw, hg.crop_offset,
                        hg.half_extent)
                vals, pull = jax.vjp(batch_energy, z3)
                (gz,) = pull(jnp.ones_like(vals))
                return vals, gz
        else:
            def vg_batch(z3):
                def batch_energy(z3_):
                    rr, bb = z3_.shape[0], z3_.shape[1]
                    pose = decode_batch(
                        _z_eff(z3_).reshape(rr * bb, latent)).astype(jnp.float32)
                    if offset is not None:
                        # residual offset: an XLA elementwise add that
                        # fuses into the decode epilogue
                        pose = (pose.reshape((rr, bb) + pose.shape[1:])
                                + offset[None]).reshape(pose.shape)
                    pose_rt = jnp.moveaxis(
                        pose.reshape(rr * bb, L, 3), -1, 1
                    ).reshape(rr, bb, 3, L)
                    return fused_stage_energy(
                        pose_rt, anchor_t, crops_cm, f_ox, f_oy, bone_t,
                        ctx, t, 15, kk, full_hw, hg.crop_offset,
                        hg.half_extent)
                vals, pull = jax.vjp(batch_energy, z3)
                (gz,) = pull(jnp.ones_like(vals))
                return vals, gz

        res = lbfgs_minimize_fixed_batched(
            vg_batch, z_init, max_iter=s.max_iter,
            history_size=s.history_size, lr=s.lr,
            step_candidates=tuple(s.step_candidates),
            unroll=s.unroll)
        out = decode_out(_z_star(res.x))
        return out if offset is None else out + offset

    if use_batched and s.fused_energy and not use_reproj:
        # NO-REPROJ KERNEL PATH (the global stage): the whole pose-space
        # energy (3d/accel/bone/vae, value + analytic grad) is ONE Pallas
        # kernel per eval — no crop buffers, so a 4x larger window block.
        # The residual offset (if any) is an XLA elementwise add that
        # fuses into the decode epilogue before the kernel.
        from globalegomocap_tpu.ops.pallas.fused_energy import (
            fused_stage_energy_noreproj)
        from globalegomocap_tpu.optimize.lbfgs import (
            lbfgs_minimize_fixed_batched)
        latent = mu.shape[-1]
        L = t * 15
        anchor_t = jnp.moveaxis(init_pose.reshape(w, L, 3), -1, 1)
        bone_t = jnp.tile(mean_bl, (1, t))                   # (W, L)
        wvec = jnp.stack([
            weights.weight_3d, weights.smooth, weights.bone_length,
            weights.vae, weights.reproj,
            jnp.asarray(0.0, jnp.float32), jnp.asarray(0.0, jnp.float32),
            jnp.asarray(0.0, jnp.float32),
        ])[None].astype(jnp.float32)

        def vg_batch(z3):
            def batch_energy(z3_):
                rr, bb = z3_.shape[0], z3_.shape[1]
                pose = decode_batch(
                    _z_eff(z3_).reshape(rr * bb, latent)).astype(jnp.float32)
                poses = pose.reshape(rr, bb, t, 15, 3)
                if offset is not None:
                    poses = poses + offset[None]
                pose_rt = jnp.moveaxis(
                    poses.reshape(rr * bb, L, 3), -1, 1
                ).reshape(rr, bb, 3, L)
                return fused_stage_energy_noreproj(
                    pose_rt, anchor_t, bone_t, wvec, t, 15)
            vals, pull = jax.vjp(batch_energy, z3)
            (gz,) = pull(jnp.ones_like(vals))
            return vals, gz

        res = lbfgs_minimize_fixed_batched(
            vg_batch, z_init, max_iter=s.max_iter,
            history_size=s.history_size, lr=s.lr,
            step_candidates=tuple(s.step_candidates),
            unroll=s.unroll)
        out = decode_out(_z_star(res.x))
        return out if offset is None else out + offset

    if use_batched:
        # explicitly-batched solver with the XLA energy: the solver-
        # restructuring share of the fused path, for stages the kernel
        # cannot serve (full maps, bf16 maps)
        from globalegomocap_tpu.optimize.lbfgs import (
            lbfgs_minimize_fixed_batched)
        latent = mu.shape[-1]
        ax_o = 0 if origins is not None else None

        def window_energy(pose, anchor, heat, bl, org):
            return total_energy_from_pose(
                pose, anchor, bl, heat, camera, weights, use_reproj,
                sampling_impl=cfg.sampling_impl, origins=org,
                full_hw=full_hw)

        def vg_batch(z3):
            def batch_energy(z3_):
                rr, bb = z3_.shape[0], z3_.shape[1]
                pose = decode_batch(_z_eff(z3_).reshape(rr * bb, latent)).astype(
                    jnp.float32)
                poses = pose.reshape(rr, bb, t, 15, 3)
                if offset is not None:
                    poses = poses + offset[None]
                return jax.vmap(
                    lambda pr: jax.vmap(
                        window_energy, in_axes=(0, 0, 0, 0, ax_o))(
                        pr, init_pose, heatmaps, mean_bl, origins))(poses)
            vals, pull = jax.vjp(batch_energy, z3)
            (gz,) = pull(jnp.ones_like(vals))
            return vals, gz

        res = lbfgs_minimize_fixed_batched(
            vg_batch, z_init, max_iter=s.max_iter,
            history_size=s.history_size, lr=s.lr,
            step_candidates=tuple(s.step_candidates),
            unroll=s.unroll)
        out = decode_out(_z_star(res.x))
        return out if offset is None else out + offset

    # vmap in_axes for the optional per-window context (None = absent)
    ax_org = 0 if origins is not None else None
    ax_sm = 0 if smoothed is not None else None
    ax_off = 0 if offset is not None else None

    def solve_one(z0, anchor, heat, bl, org, sm, off):
        def loss(z):
            pose = decode(z).astype(jnp.float32)
            if off is not None:
                pose = pose + off
            return total_energy_from_pose(
                pose, anchor, bl, heat, camera, weights, use_reproj,
                sampling_impl=cfg.sampling_impl, origins=org,
                full_hw=full_hw, smoothed_pose=sm)
        return _solve(cfg, loss, z0)

    coupling = float(cfg.energy.overlap_consistency)
    if coupling > 0.0:
        # JOINT whole-sequence solve: one optimization over the
        # concatenated window latents with the cross-window coupling term
        # (impossible in the reference's serial-window design).
        from globalegomocap_tpu.energy.terms import (
            overlap_consistency_energy)
        latent = mu.shape[-1]

        def decode_all(z_flat):
            z = z_flat.reshape(w, latent)
            return decode_batch(z).astype(jnp.float32)

        if cfg.solver.remat:
            decode_all = jax.checkpoint(decode_all)

        def joint_loss(z_flat):
            poses = decode_all(z_flat)              # (W, T, 15, 3)
            if offset is not None:
                poses = poses + offset
            per_window = jax.vmap(
                lambda p, a, h, b, o, s: total_energy_from_pose(
                    p, a, b, h, camera, weights, use_reproj,
                    sampling_impl=cfg.sampling_impl, origins=o,
                    full_hw=full_hw, smoothed_pose=s),
                in_axes=(0, 0, 0, 0, ax_org, ax_sm))(
                poses, init_pose, heatmaps, mean_bl, origins, smoothed)
            couple = overlap_consistency_energy(poses, cfg.window.stride)
            return jnp.sum(per_window) + coupling * couple

        z_star = _solve(cfg, joint_loss, mu.reshape(-1)).reshape(w, latent)
    else:
        z_star = jax.vmap(solve_one,
                          in_axes=(0, 0, 0, 0, ax_org, ax_sm, ax_off))(
            mu, init_pose, heatmaps, mean_bl, origins, smoothed, offset)

    out = decode_out(z_star)
    return out if offset is None else out + offset


def _unflatten_staged_crops(heatmap_seq, origins, cfg):
    """Undo the FLAT staged-crop layout (..., k*k*J) -> (..., k, k, J).

    driver.stage() emits pre-cropped heat flat: staging a 5-D
    (C, F, k, k, J) stack forces XLA's layout {0,3,4,2,1} on the per-chunk
    crop temps, padding 375 KB buffers to 46.9 MB (128x) and OOM-ing the
    16 GB HBM above ~112 chunks.  A flat (C, F, k*k*J) staged array keeps
    the minor dims 2-D (clean tiling); the reshape back happens HERE,
    inside the solve program, where XLA fuses it into the window gather
    instead of materializing the padded layout.  No-op for full maps or
    already-5-D crops (ndim disambiguates: crops are origins.ndim+1,
    flat crops origins.ndim-1)."""
    if origins is None or heatmap_seq.ndim != origins.ndim - 1:
        return heatmap_seq
    k = cfg.heatmap_crop
    j = heatmap_seq.shape[-1] // (k * k)
    return heatmap_seq.reshape(heatmap_seq.shape[:-1] + (k, k, j))


def window_chunk_inputs(estimated_local, camera_seq, heatmap_seq, gt_seq,
                        camera: fisheye.FisheyeParams, cfg: OptimizeConfig,
                        origins=None, full_hw=None):
    """Window (and crop-before-window) one chunk's inputs.

    Returns (win_local, win_cam, win_heat, win_gt, win_bl, win_org,
    full_hw) — everything solve_windows() consumes, all with a leading
    window axis.  Shared by the single-device pipeline (optimize_chunk)
    and the window-sharded multi-chip path
    (parallel.window_shard.optimize_chunk_window_sharded), so the two
    can never drift.

    Crop the raw per-frame maps BEFORE windowing (a frame's peak crop is
    window-independent): the full-size maps are read once and the
    windowing duplication + layout transpose touch only the 16x-smaller
    crops.  Window-then-crop order cost ~63 ms/launch of pure data motion
    on the full maps (fixed_cost_probe.json)."""
    seq_len, stride = cfg.window.seq_len, cfg.window.stride

    win_local = slice_windows(estimated_local, seq_len, stride)
    win_cam = slice_windows(camera_seq, seq_len, stride)
    win_gt = slice_windows(gt_seq, seq_len, stride)

    use_reproj = cfg.energy.reproj != 0.0
    win_org = None
    if origins is not None:
        # pre-cropped at staging — just window the crop origins
        heatmap_seq = _unflatten_staged_crops(heatmap_seq, origins, cfg)
        win_org = slice_windows(origins, seq_len, stride)  # (W,T,J,2)
    elif use_reproj and cfg.heatmap_crop > 0:
        from globalegomocap_tpu.energy.terms import (
            crop_heatmaps_at_centers_channels_last,
            crop_heatmaps_channels_last, projected_estimate_centers)
        if cfg.crop_center == "estimate":
            # guard-trip fast path (OptimizeConfig.guard_crop): center
            # at the projected estimate, not the (untrustworthy) argmax
            cen = projected_estimate_centers(
                estimated_local, camera,
                heatmap_seq.shape[-3], heatmap_seq.shape[-2])
            crops, origins, full_hw = \
                crop_heatmaps_at_centers_channels_last(
                    heatmap_seq, cfg.heatmap_crop, cen)
        else:
            crops, origins, full_hw = crop_heatmaps_channels_last(
                heatmap_seq, cfg.heatmap_crop)       # (N,k,k,J), (N,J,2)
        heatmap_seq = crops
        win_org = slice_windows(origins, seq_len, stride)  # (W,T,J,2)
    win_heat = slice_windows(heatmap_seq, seq_len, stride)
    win_heat = jnp.moveaxis(win_heat, -1, 2)  # (W, T, 15, h, w)

    n_win = win_local.shape[0]
    # per-window mean bone length — the chunk-wide mean of the raw estimate
    # (reference: optimizer.py:42-43 computes it over the whole chunk)
    chunk_bl = mean_bone_lengths(estimated_local)          # (15,)
    win_bl = jnp.broadcast_to(chunk_bl, (n_win, 15))
    return (win_local, win_cam, win_heat, win_gt, win_bl, win_org,
            full_hw)


class WindowFields(NamedTuple):
    """Per-window solved fields, pre-merge (all (W, T, 15, 3))."""
    est_world: jnp.ndarray
    mid_world: jnp.ndarray
    mid_local: jnp.ndarray
    opt_world: jnp.ndarray
    gt: jnp.ndarray


def solve_windows(model: ConvVAE, local_variables, global_variables,
                  win_local, win_cam, win_heat, win_gt, win_bl,
                  camera: fisheye.FisheyeParams, cfg: OptimizeConfig,
                  win_org=None, full_hw=None) -> WindowFields:
    """Both optimization stages + coordinate lifts over a window batch —
    the per-window core of the pipeline, with NO cross-window coupling
    when cfg.energy.overlap_consistency == 0 (the default).  That
    data-independence is what the window-sharded multi-chip path exploits
    (parallel.window_shard): each mesh device runs this on its window
    shard; only the overlap merge needs a collective."""
    local_w, global_w = stage_weights(cfg)
    use_reproj = cfg.energy.reproj != 0.0

    # ---- stage 1: local pose, heatmap term on --------------------------
    mid_local_win = optimize_stage(
        model, local_variables, win_local, win_heat, win_bl, camera,
        local_w, use_reproj, cfg, origins=win_org, full_hw=full_hw,
        residual=cfg.energy.local_residual)

    # ---- lift to relative-global and world frames ----------------------
    # world lifts go straight through the per-frame camera matrices:
    # cam0 . (inv(cam0) . C_i) == C_i, so the relative hop is only
    # materialized where stage 2 actually consumes it (mid_rel) — the
    # launch intercept is dispatch-bound (intercept_probe_r3.json)
    mid_rel = relative_global_pose(mid_local_win, win_cam)
    cam0 = win_cam[:, 0]
    est_world = transform_pose(win_local, win_cam)
    mid_world = transform_pose(mid_local_win, win_cam)

    # ---- stage 2: relative-global pose, reprojection off ---------------
    opt_rel = optimize_stage(
        model, global_variables, mid_rel, win_heat, win_bl, camera,
        global_w, False, _stage2_cfg(cfg),
        residual=cfg.energy.global_residual)
    opt_world = relative_to_global_pose(opt_rel, cam0)
    return WindowFields(est_world, mid_world, mid_local_win, opt_world,
                        win_gt)


def merge_window_fields(fields: WindowFields,
                        cfg: OptimizeConfig) -> ChunkResult:
    """Overlap-merge the solved window fields into per-frame sequences
    (+ the final smoothing), the reference's window-averaging step
    (optimizer.py:425-450)."""
    stride = cfg.window.stride
    # matmul_merge: each merge is ONE matmul against a static
    # (covered, W*T) matrix, with the final gaussian smoothing folded
    # into the optimized field's matrix (exact re-association)
    fold_sigma = (cfg.final_smooth_sigma
                  if (cfg.matmul_merge and cfg.final_smooth
                      and cfg.final_smooth_method == "gaussian") else 0.0)

    def mg(x, sigma=0.0):
        return (merge_windows_matmul(x, stride, sigma) if cfg.matmul_merge
                else merge_windows(x, stride))

    merged = ChunkResult(
        estimated=mg(fields.est_world),
        mid=mg(fields.mid_world),
        mid_local=mg(fields.mid_local),
        optimized=mg(fields.opt_world, fold_sigma),
        gt=mg(fields.gt),
    )

    if cfg.final_smooth and fold_sigma == 0.0:
        if cfg.final_smooth_method == "one_euro":
            from globalegomocap_tpu.ops.filtering import one_euro_filter
            n = merged.optimized.shape[0]
            ts = jnp.arange(1, n + 1, dtype=merged.optimized.dtype) / 25.0
            smoothed = one_euro_filter(ts, merged.optimized)
        else:
            smoothed = gaussian_filter1d(
                merged.optimized, cfg.final_smooth_sigma, axis=0)
        merged = merged._replace(optimized=smoothed)
    return merged


def optimize_chunk(model: ConvVAE, local_variables, global_variables,
                   estimated_local, camera_seq, heatmap_seq, gt_seq,
                   camera: fisheye.FisheyeParams,
                   cfg: OptimizeConfig, origins=None,
                   full_hw=None) -> ChunkResult:
    """Run the full two-stage pipeline over one sequence chunk.

    estimated_local: (N, 15, 3) per-frame camera-space pose estimates.
    camera_seq:      (N, 4, 4) cam->world matrices (SLAM).
    heatmap_seq:     (N, H, W, 15) raw per-frame heatmaps (storage layout of
                     test_data.pkl, reference: process_test_data.py:149-155)
                     — or (N, k, k, 15) pre-cropped peak windows when
                     `origins` (N, 15, 2) and `full_hw` are given (crop
                     extraction done at staging; driver.StagedBatch).
    gt_seq:          (N, 15, 3) ground truth world-frame poses.
    """
    (win_local, win_cam, win_heat, win_gt, win_bl, win_org,
     full_hw) = window_chunk_inputs(estimated_local, camera_seq,
                                    heatmap_seq, gt_seq, camera, cfg,
                                    origins, full_hw)
    fields = solve_windows(model, local_variables, global_variables,
                           win_local, win_cam, win_heat, win_gt, win_bl,
                           camera, cfg, win_org=win_org, full_hw=full_hw)
    return merge_window_fields(fields, cfg)


def optimize_chunks_flat(model: ConvVAE, local_variables,
                         global_variables, estimated_local, camera_seq,
                         heatmap_seq, gt_seq,
                         camera: fisheye.FisheyeParams,
                         cfg: OptimizeConfig, origins=None,
                         full_hw=None) -> ChunkResult:
    """Optimize many equal-length chunks with the window axes of ALL chunks
    CONCATENATED into one flat solver batch.

    The objective evaluation is latency-bound (solver_floor.json: a
    value-only eval costs nearly as much as value+grad), so fewer, larger
    solver launches amortize the per-iteration op latency better than
    per-chunk launches or a chunk-vmapped pipeline.  All arrays carry a
    leading chunk axis (C, N, ...); returns a ChunkResult with (C, covered,
    15, 3) arrays, identical semantics to the per-chunk path.
    """
    assert cfg.energy.overlap_consistency == 0.0, \
        "flat mode concatenates windows across chunks; the cross-window " \
        "coupling term would wrongly couple chunk boundaries — use " \
        "optimize_chunk/optimize_chunks_batched for joint solving"
    assert (origins is None) == (full_hw is None), \
        "origins and full_hw must be supplied together (pre-cropped maps " \
        "need both the crop origins and the full map extent for " \
        "reprojection sampling)"
    c = estimated_local.shape[0]
    seq_len, stride = cfg.window.seq_len, cfg.window.stride
    local_w, global_w = stage_weights(cfg)

    def windows_of(x):
        return jax.vmap(lambda s: slice_windows(s, seq_len, stride))(x)

    win_local = windows_of(estimated_local)          # (C, W, T, 15, 3)
    win_cam = windows_of(camera_seq)
    win_gt = windows_of(gt_seq)

    # crop BEFORE windowing (window-independent; see optimize_chunk) —
    # the full maps are read once, windowing touches only the crops.
    # When `origins` is given the crops were already extracted at staging
    # (driver.StagedBatch) and the program never sees the full maps.
    use_reproj = cfg.energy.reproj != 0.0
    f_org = None
    if origins is None and use_reproj and cfg.heatmap_crop > 0:
        from globalegomocap_tpu.energy.terms import (
            crop_heatmaps_at_centers_channels_last,
            crop_heatmaps_channels_last, projected_estimate_centers)
        if cfg.crop_center == "estimate":
            cen = projected_estimate_centers(
                estimated_local, camera,
                heatmap_seq.shape[-3], heatmap_seq.shape[-2])
            heatmap_seq, origins, full_hw = \
                crop_heatmaps_at_centers_channels_last(
                    heatmap_seq, cfg.heatmap_crop, cen)
        else:
            heatmap_seq, origins, full_hw = crop_heatmaps_channels_last(
                heatmap_seq, cfg.heatmap_crop)  # (C,N,k,k,J), (C,N,J,2)
    if origins is not None:
        heatmap_seq = _unflatten_staged_crops(heatmap_seq, origins, cfg)
        win_org = windows_of(origins)           # (C,W,T,J,2)
    win_heat = jnp.moveaxis(windows_of(heatmap_seq), -1, 3)
    w_per = win_local.shape[1]

    bl = jax.vmap(mean_bone_lengths)(estimated_local)     # (C, 15)
    bl_flat = jnp.repeat(bl, w_per, axis=0)               # (C*W, 15)

    def flat(x):
        return x.reshape((c * w_per,) + x.shape[2:])

    f_local, f_cam, f_heat = flat(win_local), flat(win_cam), flat(win_heat)
    if origins is not None:
        f_org = flat(win_org)

    mid_local = optimize_stage(model, local_variables, f_local, f_heat,
                               bl_flat, camera, local_w, use_reproj, cfg,
                               origins=f_org, full_hw=full_hw,
                               residual=cfg.energy.local_residual)

    # world lifts go straight through the per-frame camera matrices
    # (cam0 . (inv(cam0) . C_i) == C_i); only stage 2's anchor needs the
    # relative hop — see optimize_chunk
    mid_rel = relative_global_pose(mid_local, f_cam)
    cam0 = f_cam[:, 0]
    est_world = transform_pose(f_local, f_cam)
    mid_world = transform_pose(mid_local, f_cam)

    opt_rel = optimize_stage(model, global_variables, mid_rel, f_heat,
                             bl_flat, camera, global_w, False,
                             _stage2_cfg(cfg),
                             residual=cfg.energy.global_residual)
    opt_world = relative_to_global_pose(opt_rel, cam0)

    fold_sigma = (cfg.final_smooth_sigma
                  if (cfg.matmul_merge and cfg.final_smooth
                      and cfg.final_smooth_method == "gaussian") else 0.0)

    def unflat_merge(x, sigma=0.0):
        per_chunk = x.reshape((c, w_per) + x.shape[1:])
        if cfg.matmul_merge:
            # constant merge matrix under vmap -> ONE batched matmul
            return jax.vmap(
                lambda wnd: merge_windows_matmul(wnd, stride, sigma))(
                per_chunk)
        return jax.vmap(lambda wnd: merge_windows(wnd, stride))(per_chunk)

    merged = ChunkResult(
        estimated=unflat_merge(est_world),
        mid=unflat_merge(mid_world),
        mid_local=unflat_merge(mid_local),
        optimized=unflat_merge(opt_world, fold_sigma),
        gt=unflat_merge(win_gt.reshape((c * w_per,) + win_gt.shape[2:])),
    )
    if cfg.final_smooth and fold_sigma == 0.0:
        if cfg.final_smooth_method == "one_euro":
            from globalegomocap_tpu.ops.filtering import one_euro_filter
            n = merged.optimized.shape[1]
            ts = jnp.arange(1, n + 1,
                            dtype=merged.optimized.dtype) / 25.0
            smoothed = jax.vmap(lambda s: one_euro_filter(ts, s))(
                merged.optimized)
        else:
            smoothed = jax.vmap(
                lambda s: gaussian_filter1d(s, cfg.final_smooth_sigma,
                                            axis=0))(merged.optimized)
        merged = merged._replace(optimized=smoothed)
    return merged


def optimize_chunks_batched(model: ConvVAE, local_variables,
                            global_variables, estimated_local, camera_seq,
                            heatmap_seq, gt_seq,
                            camera: fisheye.FisheyeParams,
                            cfg: OptimizeConfig, origins=None,
                            full_hw=None) -> ChunkResult:
    """Optimize MANY equal-length chunks in one device launch.

    All arrays carry a leading chunk axis (C, N, ...); the whole two-stage
    pipeline (including per-chunk merge and final smoothing) is vmapped
    over it.  On a multi-chip mesh the chunk axis is the sharding axis
    (parallel.mesh.shard_batch) — the reference's entire 5-sequence
    evaluation becomes one call.  `origins`/`full_hw` carry staged-time
    crop placement (driver.StagedBatch).
    """
    def one(est, cams, heat, gt, org):
        return optimize_chunk(model, local_variables, global_variables,
                              est, cams, heat, gt, camera, cfg,
                              origins=org, full_hw=full_hw)

    return jax.vmap(one, in_axes=(0, 0, 0, 0,
                                  0 if origins is not None else None))(
        estimated_local, camera_seq, heatmap_seq, gt_seq, origins)


def make_chunk_optimizer(model: ConvVAE, cfg: OptimizeConfig,
                         camera: fisheye.FisheyeParams):
    """Build a jitted chunk optimizer with static config/camera/model.

    Returns fn(local_variables, global_variables, estimated_local,
    camera_seq, heatmap_seq, gt_seq) -> ChunkResult.  The compiled program
    is shape-specialized per chunk length (chunks are typically a uniform
    100 frames, so one compilation serves a whole dataset).
    """
    def run(local_variables, global_variables, estimated_local, camera_seq,
            heatmap_seq, gt_seq):
        return optimize_chunk(model, local_variables, global_variables,
                              estimated_local, camera_seq, heatmap_seq,
                              gt_seq, camera, cfg)

    return jax.jit(run)
