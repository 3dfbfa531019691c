"""Per-sequence optimization driver: the public entry point mirroring the
reference's `optimizer.main` contract (pickle-in / optimized-pose-out plus
the 17-metric dict; reference: optimizer.py:311-507).
"""

from __future__ import annotations

import time
from dataclasses import dataclass
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from globalegomocap_tpu.config import OptimizeConfig
from globalegomocap_tpu.data.test_data import (
    TestChunk, load_test_chunk, list_chunk_dirs)
from globalegomocap_tpu.evaluation.metrics import calculate_errors
from globalegomocap_tpu.models.conv_vae import ConvVAE
from globalegomocap_tpu.ops import fisheye
from globalegomocap_tpu.optimize.pipeline import (
    make_chunk_optimizer, ChunkResult)


def resolve_camera(cfg: OptimizeConfig) -> fisheye.FisheyeParams:
    """Camera from a built-in name or a calibration JSON path."""
    if cfg.camera in ("egosyn", "pose_fisheye"):
        return fisheye.default_camera(cfg.camera)
    return fisheye.load_calibration(cfg.camera)


def build_model(cfg: OptimizeConfig) -> ConvVAE:
    p = cfg.prior
    dtype = jnp.bfloat16 if cfg.compute_dtype.startswith("bfloat16") \
        else jnp.float32
    return ConvVAE(in_channels=p.in_channels, out_channels=p.in_channels,
                   latent_dim=p.latent_dim, seq_len=p.seq_len,
                   hidden_dims=tuple(p.hidden_dims), dtype=dtype)


@dataclass(frozen=True)
class StagedBatch:
    """A batch of equal-length chunks pre-staged for the hot solve path:
    inputs stacked ONCE into device-resident arrays (padded to the device
    count for sharding) and the crop-guard coverage already resolved to a
    host scalar.  Staging pays the stacking dispatches and the guard's
    blocking readback ONCE per dataset; every subsequent
    `optimize_chunks_batched(staged)` call is then a single program launch
    with no host-side stacks and no mid-run sync (fixed_cost_probe.json
    measured those at ~94 ms of a 237 ms launch — 40% of wall-clock)."""
    est: Any            # (C, F, 15, 3) stacked estimated_local
    cams: Any           # (C, F, 4, 4)
    heat: Any           # (C, F, H, W, J) raw maps — or FLAT (C, F, k*k*J)
                        # peak crops when pre-cropped at staging (flat so
                        # the staging program's temps keep a 2-D-minor
                        # layout; solve programs reshape back in-jit — see
                        # pipeline._unflatten_staged_crops)
    gt: Any             # (C, F, 15, 3)
    n_chunks: int       # pre-padding chunk count (slice results back)
    crop_coverage: float | None  # guard statistic, resolved at staging
    origins: Any = None          # (C, F, J, 2) crop origins if pre-cropped
    full_hw: tuple | None = None  # original (H, W) if pre-cropped
    accel_mean: float | None = None  # input motion statistic (mean
    # per-frame acceleration magnitude of the estimates) — resolved at
    # staging when the optimizer has a prior bank or reference stats to
    # compare against (optimize/prior_bank.py)


@dataclass
class SequenceOptimizer:
    """Holds the two priors (local + global VAE variables) and a jit cache,
    the rebuild of the reference's pair of `BodyPoseOptimizer`s
    (optimizer.py:332-350)."""
    model: ConvVAE
    local_variables: Any
    global_variables: Any
    cfg: OptimizeConfig
    # prior-regime matching (optimize/prior_bank.py, VERDICT r3 #7):
    # a PriorBank auto-selects the prior pair whose training-motion
    # statistic is nearest the staged batch's input statistic (analogous
    # to the crop-mass guard's map-statistics fallback); alternatively
    # prior_accel_mean (the held priors' training stat, recorded by
    # train_vae.Trainer.motion_stats) enables a mismatch WARNING without
    # switching.  Both default off — reference parity.
    prior_bank: Any = None
    prior_accel_mean: float | None = None
    # warn when the batch/prior accel ratio exceeds this (either way)
    mismatch_warn_ratio: float = 2.0

    def __post_init__(self):
        self._camera = resolve_camera(self.cfg)
        if self.cfg.fold_bn and getattr(self.model, "use_bn", True):
            from globalegomocap_tpu.models.fold_bn import fold_batchnorm
            self.local_variables = fold_batchnorm(self.local_variables)
            self.global_variables = fold_batchnorm(self.global_variables)
            self.model = self.model.clone(use_bn=False)
            if self.prior_bank is not None:
                from globalegomocap_tpu.models.fold_bn import (
                    fold_batchnorm as _fb)
                from globalegomocap_tpu.optimize.prior_bank import (
                    PriorBank, PriorEntry)
                self.prior_bank = PriorBank([
                    PriorEntry(e.name, _fb(e.local_variables),
                               _fb(e.global_variables), e.accel_mean)
                    for e in self.prior_bank.entries])
        self._jitted = {}
        self._jit_cache = {}
        self._warned_mismatch = False
        self.last_prior_name: str | None = None

    def _accel_stat(self, est) -> float | None:
        """Input-motion statistic of a staged est stack (C, F, 15, 3):
        one tiny device reduction + scalar readback, measured only when
        prior matching is configured."""
        if self.prior_bank is None and self.prior_accel_mean is None:
            return None
        from globalegomocap_tpu.optimize.prior_bank import (
            motion_accel_stat_jax)
        key = "accel_stat"
        if key not in self._jit_cache:
            # measured at the prior's seq_len spectral resolution so the
            # value is commensurable with the prior's training-window
            # statistic (prior_bank.motion_accel_stat docstring)
            win = self.cfg.prior.seq_len
            self._jit_cache[key] = jax.jit(
                lambda e: motion_accel_stat_jax(e, window=win))
        return float(self._jit_cache[key](est))

    def _select_priors(self, accel_mean: float | None):
        """(local_vars, global_vars) for a batch statistic: bank
        selection, or the held pair (with a one-time mismatch warning
        when prior_accel_mean is recorded)."""
        if accel_mean is None:
            return self.local_variables, self.global_variables
        if self.prior_bank is not None:
            e = self.prior_bank.select(accel_mean)
            self.last_prior_name = e.name
            return e.local_variables, e.global_variables
        if (self.prior_accel_mean and not self._warned_mismatch):
            r = accel_mean / self.prior_accel_mean
            if r > self.mismatch_warn_ratio or \
                    r < 1.0 / self.mismatch_warn_ratio:
                import warnings
                warnings.warn(
                    f"prior/input motion-regime mismatch: batch accel "
                    f"{accel_mean:.2e} vs prior training accel "
                    f"{self.prior_accel_mean:.2e} ({r:.1f}x) — the prior "
                    f"was trained on a different motion regime; consider "
                    f"a matched prior (optimize/prior_bank.py)",
                    stacklevel=3)
                self._warned_mismatch = True
        return self.local_variables, self.global_variables

    def _crop_coverage(self, heatmaps) -> float | None:
        """Measure the crop-guard statistic: mean probability mass held by
        peak-centered crops over the resident maps (a device reduction +
        ONE scalar readback).  None when the guard is inapplicable.  See
        energy.terms.crop_coverage_mean / crop_mass_coverage."""
        cfg = self.cfg
        if cfg.heatmap_crop <= 0 or cfg.heatmap_crop_min_mass <= 0 \
                or cfg.energy.reproj == 0.0:
            return None
        from globalegomocap_tpu.energy.terms import crop_coverage_mean
        key = ("crop_guard", cfg.heatmap_crop)
        if key not in self._jit_cache:
            self._jit_cache[key] = jax.jit(
                # storage layout (..., H, W, J) -> (..., J, H, W)
                lambda h: crop_coverage_mean(jnp.moveaxis(h, -1, -3),
                                             cfg.heatmap_crop))
        return float(self._jit_cache[key](jnp.asarray(heatmaps)))

    def _cfg_for_coverage(self, cov: float | None) -> OptimizeConfig:
        """Apply the heatmap-crop mass guard: fall back to full-map
        sampling when the peak-centered crops would discard real
        probability mass (multimodal / occlusion-flattened maps).

        When the guard trips and `robust_tier_on_guard` is set, the
        solver ALSO switches to the robust tier (>=15 stage-1 iterations,
        history 10, the 4 parity line-search candidates): on
        degraded/jerky corpora the deeper search buys accuracy —
        quality_iter_crop_v2_pv2: aligned 0.03896 (m10/K4) vs 0.04162
        (m5/K2); quality_iter_crop_s1iter_v2: bone-aligned degrades
        monotonically below 15 stage-1 iterations (0.04932 at 15 vs
        0.05073 at 8) — while clean corpora never trip the guard and keep
        the fast tier, where FEWER iterations measure better
        (quality_iter_crop_s1iter: iter12/m3 bone 0.02104 AND raw
        0.03085 both beat iter15/m5's 0.02111/0.03172)."""
        cfg = self.cfg
        if cov is not None and cov < cfg.heatmap_crop_min_mass:
            from dataclasses import replace as _rp
            from globalegomocap_tpu.config import with_overrides
            if cfg.guard_crop > 0:
                # guard-trip fast path: larger crops centered at the
                # PROJECTED ESTIMATE (the argmax is untrustworthy on the
                # maps that trip the guard, but the solver only samples
                # near the projection) — keeps the fused-kernel staged
                # contract instead of paying the full-map XLA fallback
                cfg = with_overrides(cfg, heatmap_crop=cfg.guard_crop,
                                     crop_center="estimate")
            else:
                cfg = with_overrides(cfg, heatmap_crop=0)
            if (cfg.robust_tier_on_guard
                    and cfg.solver.method == "lbfgs_fixed"):
                cfg = _rp(cfg, solver=_rp(
                    cfg.solver, history_size=max(cfg.solver.history_size,
                                                 10),
                    max_iter=max(cfg.solver.max_iter, 15),
                    step_candidates=(1.0, 0.5, 0.1, 0.02)))
        return cfg

    def _effective_cfg(self, heatmaps) -> OptimizeConfig:
        """Crop-mass guard on raw heatmaps (measure + apply in one step;
        costs one blocking readback — the staged path resolves this once
        at staging time instead, see stage())."""
        return self._cfg_for_coverage(self._crop_coverage(heatmaps))

    def optimize_chunk(self, chunk: TestChunk,
                       cfg: OptimizeConfig | None = None) -> ChunkResult:
        """Optimize one chunk.  `cfg` overrides the guard resolution —
        pass a previously resolved effective config to skip the crop
        guard's blocking readback (serving pipelines do this; the guard
        readback would otherwise stall the dispatch pipeline per chunk)."""
        heat = jnp.asarray(chunk.heatmaps)
        if cfg is None:
            cfg = self._effective_cfg(chunk.heatmaps)
        jkey = (cfg.heatmap_crop, cfg.crop_center)
        if jkey not in self._jitted:
            self._jitted[jkey] = make_chunk_optimizer(
                self.model, cfg, self._camera)
        lv, gv = self.local_variables, self.global_variables
        if self.prior_bank is not None or self.prior_accel_mean is not None:
            from globalegomocap_tpu.optimize.prior_bank import (
                motion_accel_stat)
            lv, gv = self._select_priors(
                motion_accel_stat(np.asarray(chunk.estimated_local),
                                  window=self.cfg.prior.seq_len))
        return self._jitted[jkey](
            lv, gv,
            jnp.asarray(chunk.estimated_local),
            jnp.asarray(chunk.camera_poses),
            heat,
            jnp.asarray(chunk.gt_global))

    def optimize_chunk_sharded(self, chunk: TestChunk,
                               cfg: OptimizeConfig | None = None,
                               mesh=None) -> ChunkResult:
        """Optimize ONE chunk with its WINDOW axis sharded over the mesh
        (parallel.window_shard): the single-long-sequence scaling path —
        chunk-axis sharding (optimize_chunks_batched) cannot give one
        sequence more than one chip.  The overlap merge runs on an
        all_gather of the per-shard solved windows (SURVEY §5's design;
        the reference merge being parallelized: optimizer.py:425-437).
        Single-device meshes fall through to the plain pipeline."""
        from globalegomocap_tpu.parallel.mesh import make_mesh
        from globalegomocap_tpu.parallel.window_shard import (
            optimize_chunk_window_sharded)
        heat = jnp.asarray(chunk.heatmaps)
        if cfg is None:
            cfg = self._effective_cfg(chunk.heatmaps)
        if mesh is None:
            mesh = make_mesh()
        # cfg is a frozen dataclass: hash the RESOLVED config so an
        # explicitly-passed cfg with different solver/energy fields
        # cannot collide with a cached program compiled for another
        # (code review r5: the shape-only key silently reused the first
        # call's closure-captured cfg)
        key = ("win_sharded", cfg, heat.shape, mesh.devices.size)
        if key not in self._jit_cache:
            def run(lv, gv, est, cams, heat, gt):
                return optimize_chunk_window_sharded(
                    self.model, lv, gv, est, cams, heat, gt,
                    self._camera, cfg, mesh=mesh)
            self._jit_cache[key] = jax.jit(run)
        lv, gv = self.local_variables, self.global_variables
        if self.prior_bank is not None or self.prior_accel_mean is not None:
            from globalegomocap_tpu.optimize.prior_bank import (
                motion_accel_stat)
            lv, gv = self._select_priors(
                motion_accel_stat(np.asarray(chunk.estimated_local),
                                  window=self.cfg.prior.seq_len))
        return self._jit_cache[key](
            lv, gv,
            jnp.asarray(chunk.estimated_local),
            jnp.asarray(chunk.camera_poses),
            heat,
            jnp.asarray(chunk.gt_global))

    def stage(self, chunks: list[TestChunk],
              coverage: float | None = None,
              on_host: bool = False) -> StagedBatch:
        """Pre-stage a batch of equal-length chunks for repeated hot
        solves: stack the four inputs into device arrays, pad the chunk
        axis to the device count (sharding never silently degrades;
        parallel.mesh.pad_to_multiple), and resolve the crop-guard
        coverage to a host scalar.  One-time cost per dataset; see
        StagedBatch.

        coverage: inject a known crop-guard coverage instead of measuring
        it on device.  The measurement's blocking readback executes
        BEHIND everything already queued on the device (programs run in
        dispatch order), so in a serving pipeline it head-of-line-blocks
        on earlier batches' solves — streams measure once and reuse
        (StreamingOptimizer guard='first').

        The staging compute itself is ONE fused program: each chunk's
        maps are cropped BEFORE stacking, so the full-size stacked maps
        (~1 GB at 40 chunks) are never materialized and the whole step
        is a single dispatch (serving_bench.json measured the unfused
        five-dispatch version as the sustained-throughput bottleneck).

        on_host=True crops in NUMPY before any device transfer — the
        host-ingest serving path.  Full maps are ~16-64x larger than
        their peak crops, and the host->device tunnel is the serving
        producer's bottleneck when chunks arrive host-resident (the
        reference loads test_data.pkl on the CPU: optimizer.py:384-390);
        cropping first means only (C, F, k*k*J) crops + origins cross.
        Bit-exact vs device staging (the crop is a pure gather); the
        crop-mass guard runs on host from the same pass."""
        from globalegomocap_tpu.parallel.mesh import pad_to_multiple
        if not chunks:
            raise ValueError("stage() needs at least one chunk")
        if len({c.estimated_local.shape[0] for c in chunks}) != 1:
            raise ValueError(
                "stage() requires equal-length chunks (got frame counts "
                f"{sorted({c.estimated_local.shape[0] for c in chunks})}); "
                "use optimize_chunk per chunk or optimize_sequence_dir's "
                "serial fallback for mixed lengths")
        if on_host:
            return self._stage_host(chunks, coverage)
        heat_l = [jnp.asarray(c.heatmaps) for c in chunks]

        # Segmenting: every chunk's FULL maps enter the staging (and
        # guard) program as a distinct argument, and the AOT compiler
        # accounts arguments without aliasing — 640 chunks = 18.75G of
        # "arguments" and a compile-time HBM OOM (heat_ceiling_probe.json
        # re-diagnosed unroll_chunks_flat2.json's "solve-temp OOM" as
        # this).  Run the identical program per segment and concatenate
        # the (64x smaller) staged outputs — bit-exact.  NOTE: the lift
        # applies only to the cropped (k>0) path — when the crop guard
        # trips (k=0) the segments stage FULL maps and the eager
        # concatenate transiently holds both the per-segment stacks and
        # the result (~2x full-map HBM), so segmentation buys no
        # headroom for large guard-tripped batches; those should lower
        # the chunk count instead.
        seg = self.cfg.stage_segment_chunks
        parts = ([list(range(i, min(i + seg, len(chunks))))
                  for i in range(0, len(chunks), seg)]
                 if seg and len(chunks) > seg else
                 [list(range(len(chunks)))])

        if coverage is None:
            covs = [self._crop_coverage_list([heat_l[i] for i in p])
                    for p in parts]
            # equal-length chunks -> mean of per-chunk means is exact,
            # so the segment means recombine by segment size
            cov = (None if covs[0] is None else
                   float(sum(c * len(p) for c, p in zip(covs, parts))
                         / len(chunks)))
        else:
            cov = coverage
        eff = self._cfg_for_coverage(cov)
        k = eff.heatmap_crop if eff.energy.reproj != 0.0 else 0

        staged_parts = [
            self._stage_arrays([chunks[i] for i in p],
                               [heat_l[i] for i in p], k,
                               center=eff.crop_center)
            for p in parts]
        if len(staged_parts) == 1:
            est, cams, heat, gt, origins = staged_parts[0]
        else:
            est, cams, heat, gt = (
                jnp.concatenate([sp[f] for sp in staged_parts])
                for f in range(4))
            origins = (jnp.concatenate([sp[4] for sp in staged_parts])
                       if staged_parts[0][4] is not None else None)
        full_hw = (heat_l[0].shape[-3], heat_l[0].shape[-2]) if k > 0 \
            else None

        n_chunks = est.shape[0]
        n_dev = len(jax.devices())
        if n_dev > 1:
            est, _ = pad_to_multiple(est, n_dev)
            cams, _ = pad_to_multiple(cams, n_dev)
            heat, _ = pad_to_multiple(heat, n_dev)
            gt, _ = pad_to_multiple(gt, n_dev)
            if origins is not None:
                origins, _ = pad_to_multiple(origins, n_dev)
        return StagedBatch(est, cams, heat, gt, n_chunks, cov,
                           origins, full_hw,
                           accel_mean=self._accel_stat(est))

    def _stage_arrays(self, chunks, heat_l, k: int,
                      center: str = "peak"):
        """One staging-program launch over <= stage_segment_chunks
        chunks; returns the UNPADDED stacked (est, cams, heat, gt,
        origins) device arrays (heat flat (C, F, k*k*J) when k > 0).
        center='estimate' centers each crop at the projected initial
        estimate instead of the map argmax (the guard-trip fast path)."""
        impl = getattr(self.cfg, "stage_crop_impl", "gather")
        # bf16 heat storage happens AT STAGING (round 5): the solve
        # program's once-per-launch cast (pipeline.py) becomes a no-op,
        # the staged write/read halves, and the onehot extraction runs
        # on exactly-representable bf16 inputs.  Bit-identical to the
        # old stage-f32-then-cast path: the argmax (origins) stays on
        # the f32 maps, and extraction is a pure selection, so
        # extract(cast(map)) == cast(extract(map)).
        hdt = (jnp.bfloat16
               if self.cfg.heatmap_dtype == "bfloat16" else None)
        key = ("stage_prog", len(chunks), heat_l[0].shape, k, center,
               impl, self.cfg.heatmap_dtype)
        if key not in self._jit_cache:
            from globalegomocap_tpu.energy.terms import (
                crop_heatmaps_at_centers_channels_last,
                crop_heatmaps_channels_last,
                projected_estimate_centers)
            cam = self._camera

            def prog(est_l, cams_l, heat_l, gt_l):
                est = jnp.stack(est_l)
                cams = jnp.stack(cams_l)
                gt = jnp.stack(gt_l)
                if k > 0:
                    if center == "estimate":
                        hh, ww = (heat_l[0].shape[-3],
                                  heat_l[0].shape[-2])
                        cr = [crop_heatmaps_at_centers_channels_last(
                                  h, k, projected_estimate_centers(
                                      e, cam, hh, ww), impl=impl,
                                  extract_dtype=hdt)[:2]
                              for h, e in zip(heat_l, est_l)]
                    else:
                        cr = [crop_heatmaps_channels_last(
                                  h, k, impl=impl,
                                  extract_dtype=hdt)[:2]
                              for h in heat_l]
                    # stage crops FLAT (C, F, k*k*J): a 5-D stacked output
                    # forces layout {0,3,4,2,1} on every per-chunk crop
                    # temp, padding 375 KB buffers 128x to 46.9 MB and
                    # OOM-ing staging above ~112 chunks; the flat 3-D
                    # output keeps temps 2-D-minor.  The solve programs
                    # reshape back in-jit (pipeline._unflatten_staged_crops)
                    heat = jnp.stack([c.reshape(c.shape[0], -1)
                                      for c, _ in cr])
                    org = jnp.stack([o for _, o in cr])
                else:
                    # full-map (guard-tripped) staging: same cast-at-
                    # staging contract — the solve's per-launch cast
                    # no-ops and the staged stack halves
                    heat = jnp.stack(heat_l)
                    if hdt is not None:
                        heat = heat.astype(hdt)
                    org = None
                return est, cams, heat, gt, org

            self._jit_cache[key] = jax.jit(prog)

        return self._jit_cache[key](
            [jnp.asarray(c.estimated_local) for c in chunks],
            [jnp.asarray(c.camera_poses) for c in chunks],
            heat_l,
            [jnp.asarray(c.gt_global) for c in chunks])

    def _stage_host(self, chunks: list[TestChunk],
                    coverage: float | None) -> StagedBatch:
        """stage(on_host=True) body: numpy crop + guard per chunk, ONE
        device_put per staged field.  See stage()'s docstring."""
        cfg = self.cfg
        kk = cfg.heatmap_crop
        guard_on = (kk > 0 and cfg.heatmap_crop_min_mass > 0
                    and cfg.energy.reproj != 0.0)
        want_crops = kk > 0 and cfg.energy.reproj != 0.0
        crops_l, orgs_l, ratios = [], [], []
        full_hw = None
        if want_crops:
            from globalegomocap_tpu.energy.terms import (
                crop_heatmaps_channels_last_np)
            from globalegomocap_tpu.native.hostcrop import crop_peak_native
            for c in chunks:  # per-chunk: bounds host temp memory
                heat = np.asarray(c.heatmaps)
                # native single-pass kernel (ingest hot path); bit-exact
                # numpy fallback when unavailable (hostcrop.py docstring)
                res = crop_peak_native(heat, kk)
                if res is not None:
                    flat_cr, org, full_hw, box, total = res
                else:
                    cr, org, full_hw, box, total = \
                        crop_heatmaps_channels_last_np(heat, kk)
                    flat_cr = cr.reshape(cr.shape[0], -1)  # flat contract
                crops_l.append(flat_cr)
                orgs_l.append(org)
                if guard_on and coverage is None:
                    ratios.append(np.where(total > 0,
                                           box / np.maximum(total, 1e-30),
                                           1.0).mean())
        if coverage is not None:
            cov = coverage
        elif guard_on:
            cov = float(np.mean(ratios))
        else:
            cov = None
        eff = self._cfg_for_coverage(cov)
        k = eff.heatmap_crop if eff.energy.reproj != 0.0 else 0

        if k > 0 and (k != kk or eff.crop_center != "peak"):
            # guard-trip fast path (OptimizeConfig.guard_crop): the
            # peak-centered kk pre-crops above are the wrong
            # size/centering — re-crop each chunk at the projected-
            # estimate centers.  Centers come from ONE tiny device
            # launch per chunk over the (F, 15, 3) estimates; the full
            # maps never cross the tunnel.
            from globalegomocap_tpu.energy.terms import (
                crop_heatmaps_at_centers_channels_last_np,
                projected_estimate_centers)
            hh, ww = (np.asarray(chunks[0].heatmaps).shape[-3],
                      np.asarray(chunks[0].heatmaps).shape[-2])
            cam = self._camera
            ckey = ("est_centers", hh, ww)
            if ckey not in self._jit_cache:
                self._jit_cache[ckey] = jax.jit(
                    lambda e: projected_estimate_centers(e, cam, hh, ww))
            crops_l, orgs_l = [], []
            for c in chunks:
                cen = np.asarray(self._jit_cache[ckey](
                    jnp.asarray(c.estimated_local)))
                cr, org, full_hw = \
                    crop_heatmaps_at_centers_channels_last_np(
                        np.asarray(c.heatmaps), k, cen)
                crops_l.append(cr.reshape(cr.shape[0], -1))
                orgs_l.append(org)

        if k > 0:
            heat = np.stack(crops_l)
            origins = np.stack(orgs_l)
        else:   # guard tripped (or cropping off): stage the full maps
            heat = np.stack([np.asarray(c.heatmaps) for c in chunks])
            origins, full_hw = None, None
        if cfg.heatmap_dtype == "bfloat16":
            # same cast-at-staging contract as the device path (crop
            # VALUES round to bf16 here instead of in the solve launch
            # — bit-identical downstream) and the host->device transfer
            # halves
            import ml_dtypes
            heat = heat.astype(ml_dtypes.bfloat16)
        est = np.stack([np.asarray(c.estimated_local) for c in chunks])
        cams = np.stack([np.asarray(c.camera_poses) for c in chunks])
        gt = np.stack([np.asarray(c.gt_global) for c in chunks])

        n_chunks = est.shape[0]
        n_dev = len(jax.devices())
        if n_dev > 1 and n_chunks % n_dev:   # pad on host (edge), pre-put
            rem = (-n_chunks) % n_dev

            def padn(a):
                return np.pad(a, [(0, rem)] + [(0, 0)] * (a.ndim - 1),
                              mode="edge")
            est, cams, gt, heat = map(padn, (est, cams, gt, heat))
            if origins is not None:
                origins = padn(origins)
        accel = None
        if self.prior_bank is not None or self.prior_accel_mean is not None:
            from globalegomocap_tpu.optimize.prior_bank import (
                motion_accel_stat)
            accel = motion_accel_stat(est,
                                      window=self.cfg.prior.seq_len)
        put = jax.device_put
        return StagedBatch(put(est), put(cams), put(heat), put(gt),
                           n_chunks, cov,
                           None if origins is None else put(origins),
                           full_hw, accel_mean=accel)

    def _crop_coverage_list(self, heat_l) -> float | None:
        """Crop-guard coverage over per-chunk map arrays WITHOUT stacking
        them (equal chunk sizes -> mean of per-chunk means is exact)."""
        cfg = self.cfg
        if cfg.heatmap_crop <= 0 or cfg.heatmap_crop_min_mass <= 0 \
                or cfg.energy.reproj == 0.0:
            return None
        from globalegomocap_tpu.energy.terms import crop_coverage_mean
        key = ("crop_guard_list", cfg.heatmap_crop, len(heat_l))
        if key not in self._jit_cache:
            kk = cfg.heatmap_crop
            self._jit_cache[key] = jax.jit(lambda hs: sum(
                crop_coverage_mean(jnp.moveaxis(h, -1, -3), kk)
                for h in hs) / len(hs))
        return float(self._jit_cache[key](heat_l))

    def optimize_chunks_batched(self,
                                chunks: "list[TestChunk] | StagedBatch",
                                mode: str = "vmap"):
        """Optimize a batch of equal-length chunks in ONE device launch.

        Accepts either a list of TestChunk (staged internally each call)
        or a StagedBatch from `stage()` — the production serving path:
        staging once per dataset removes ~40% of per-launch wall-clock
        (fixed_cost_probe.json).

        mode='vmap': the whole pipeline vmapped over the chunk axis.
        mode='flat': all chunks' windows concatenated into one flat solver
        batch — fastest single-chip mode (amortizes the latency-bound
        objective evals; see solver_floor.json).

        In BOTH modes the chunk axis is sharded across all available
        devices (multi-chip path); in flat mode the concatenated window
        axis inherits that sharding through the row-major reshape.  A chunk
        count that does not divide the device count is edge-padded to the
        next multiple and the padding is sliced off the result — sharding
        never silently degrades (parallel.mesh.pad_to_multiple).

        Returns a ChunkResult whose arrays have a leading chunk axis."""
        from globalegomocap_tpu.optimize.pipeline import (
            optimize_chunks_batched, optimize_chunks_flat)
        from globalegomocap_tpu.parallel.mesh import (
            make_mesh, replicate, shard_batch)

        staged = chunks if isinstance(chunks, StagedBatch) \
            else self.stage(chunks)
        est, cams, heat, gt = staged.est, staged.cams, staged.heat, staged.gt
        n_chunks = staged.n_chunks
        cfg = self._cfg_for_coverage(staged.crop_coverage)
        n_dev = len(jax.devices())
        use_shmap = (n_dev > 1 and (cfg.solver.fused_energy
                                    or cfg.solver.batched_solver))

        key = ("batched", mode, est.shape, n_dev, cfg.heatmap_crop,
               cfg.crop_center, staged.full_hw)
        if key not in self._jit_cache:
            pipeline_fn = (optimize_chunks_flat if mode == "flat"
                           else optimize_chunks_batched)
            full_hw = staged.full_hw

            def run(lv, gv, est, cams, heat, gt, org):
                return pipeline_fn(self.model, lv, gv, est, cams, heat,
                                   gt, self._camera, cfg, origins=org,
                                   full_hw=full_hw)

            if use_shmap:
                # The Pallas kernels are opaque custom calls the SPMD
                # partitioner cannot split along the sharded window axis.
                # Chunks are data-independent, so the whole pipeline runs
                # per-shard under shard_map (no collectives): each device
                # solves its chunk slice with the fused kernel locally.
                from jax.sharding import PartitionSpec as P
                mesh = make_mesh()
                org_spec = P("dp") if staged.origins is not None else P()
                self._jit_cache[key] = jax.jit(jax.shard_map(
                    run, mesh=mesh,
                    in_specs=(P(), P(), P("dp"), P("dp"), P("dp"),
                              P("dp"), org_spec),
                    out_specs=P("dp"), check_vma=False))
            elif n_dev > 1:
                mesh = make_mesh()
                repl = replicate(mesh)
                sh = shard_batch(mesh)
                org_sh = sh if staged.origins is not None else repl
                self._jit_cache[key] = jax.jit(
                    run, in_shardings=(repl, repl, sh, sh, sh, sh,
                                       org_sh))
            else:
                self._jit_cache[key] = jax.jit(run)
        lv, gv = self._select_priors(staged.accel_mean)
        res = self._jit_cache[key](lv, gv,
                                   est, cams, heat, gt, staged.origins)
        if res.estimated.shape[0] != n_chunks:
            res = jax.tree_util.tree_map(lambda x: x[:n_chunks], res)
        return res

    def run(self, chunk: TestChunk, with_metrics: bool = True):
        """Optimize one chunk and (optionally) evaluate.

        Returns (errors dict | None, estimated, mid_local, optimized, gt) —
        the tuple contract of the reference's `optimizer.main`
        (optimizer.py:507)."""
        res = self.optimize_chunk(chunk)
        errors = None
        if with_metrics:
            errors = {k: np.asarray(v) for k, v in calculate_errors(
                res.estimated, res.mid, res.optimized, res.gt).items()}
        return (errors, np.asarray(res.estimated), np.asarray(res.mid_local),
                np.asarray(res.optimized), np.asarray(res.gt))


def load_priors_from_torch(cfg: OptimizeConfig, local_ckpt: str,
                           global_ckpt: str):
    """Build a SequenceOptimizer from reference-format .pth.tar checkpoints
    (the released weights; reference: optimizer.py:334, 344)."""
    from globalegomocap_tpu.models.torch_convert import load_torch_checkpoint
    model = build_model(cfg)
    lv = load_torch_checkpoint(local_ckpt, cfg.prior.seq_len,
                               tuple(cfg.prior.hidden_dims))
    gv = load_torch_checkpoint(global_ckpt, cfg.prior.seq_len,
                               tuple(cfg.prior.hidden_dims))
    to_jnp = lambda tree: jax.tree_util.tree_map(jnp.asarray, tree)
    return SequenceOptimizer(model, to_jnp(lv), to_jnp(gv), cfg)


def optimize_sequence_dir(opt: SequenceOptimizer, data_dir: str,
                          verbose: bool = True, batched: bool = False):
    """Iterate all chunk dirs of a sequence, optimize each, aggregate the
    metric averages (reference: optimize_whole_sequence.py:48-117).

    batched=True solves all equal-length chunks of the sequence in ONE
    staged flat launch (the production fast path; falls back to the
    serial per-chunk loop when chunk lengths differ or loading fails).

    Returns (per_chunk_errors list, averages dict, timing dict)."""
    if batched:
        res = _optimize_sequence_dir_batched(opt, data_dir, verbose)
        if res is not None:
            return res
        if verbose:
            print("batched path unavailable (unequal chunk lengths); "
                  "falling back to per-chunk")
    all_errors = []
    timings = []
    failures = []
    for chunk_dir in list_chunk_dirs(data_dir):
        try:
            chunk = load_test_chunk(chunk_dir)
            t0 = time.perf_counter()
            errors, *_ = opt.run(chunk)
            dt = time.perf_counter() - t0
        except Exception as e:  # noqa: BLE001 — isolate corrupt chunks
            # fault isolation the reference lacks: one bad chunk must not
            # abort a whole-sequence evaluation
            failures.append((chunk_dir, repr(e)))
            if verbose:
                print(f"SKIPPED corrupt chunk {chunk_dir}: {e!r}")
            continue
        timings.append(dt)
        all_errors.append(errors)
        if verbose:
            print(f"running data: {chunk_dir}")
            if errors["bone_length_aligned_optimized_mpjpe"] > \
                    errors["bone_length_aligned_mid_optimized_mpjpe"]:
                # regression tripwire of the reference
                # (optimize_whole_sequence.py:87-88)
                print(errors)

    averages = {}
    if all_errors:
        for k in all_errors[0]:
            averages[k] = np.mean([e[k] for e in all_errors], axis=0)
    timing = {"total_s": float(np.sum(timings)),
              "per_chunk_s": float(np.mean(timings)) if timings else 0.0,
              "failed_chunks": failures}
    if verbose and averages:
        print_summary(averages)
        print(f"total optimization time: {timing['total_s']:.2f}s")
    return all_errors, averages, timing


def _optimize_sequence_dir_batched(opt: SequenceOptimizer, data_dir: str,
                                   verbose: bool = True):
    """One staged flat launch for a whole sequence directory.  Returns
    None when the chunks are not equal-length (caller falls back)."""
    dirs, chunks, failures = [], [], []
    for chunk_dir in list_chunk_dirs(data_dir):
        try:
            chunks.append(load_test_chunk(chunk_dir))
            dirs.append(chunk_dir)
        except Exception as e:  # noqa: BLE001 — isolate corrupt chunks
            failures.append((chunk_dir, repr(e)))
            if verbose:
                print(f"SKIPPED corrupt chunk {chunk_dir}: {e!r}")
    if not chunks:
        return [], {}, {"total_s": 0.0, "per_chunk_s": 0.0,
                        "failed_chunks": failures}
    if len({c.estimated_local.shape[0] for c in chunks}) != 1:
        return None

    t0 = time.perf_counter()
    staged = opt.stage(chunks)
    res = opt.optimize_chunks_batched(staged, mode="flat")
    jax.block_until_ready(res.optimized)
    total = time.perf_counter() - t0

    all_errors = []
    for i, chunk_dir in enumerate(dirs):
        errors = {k: np.asarray(v) for k, v in calculate_errors(
            res.estimated[i], res.mid[i], res.optimized[i],
            res.gt[i]).items()}
        all_errors.append(errors)
        if verbose:
            print(f"running data: {chunk_dir}")
            if errors["bone_length_aligned_optimized_mpjpe"] > \
                    errors["bone_length_aligned_mid_optimized_mpjpe"]:
                print(errors)  # reference's regression tripwire

    averages = {k: np.mean([e[k] for e in all_errors], axis=0)
                for k in all_errors[0]}
    timing = {"total_s": float(total),
              "per_chunk_s": float(total) / len(chunks),
              "failed_chunks": failures}
    if verbose:
        print_summary(averages)
        print(f"total optimization time: {timing['total_s']:.2f}s")
    return all_errors, averages, timing


def print_summary(avg: dict):
    """The reference driver's summary block
    (optimize_whole_sequence.py:90-117), same quantities."""
    sep = "-----------------------------------------"
    print(f"Average original global pose mpjpe: {avg['original_global_mpjpe']}")
    print(f"Average mid global pose mpjpe: {avg['mid_global_mpjpe']}")
    print(f"Average optimized global pose mpjpe: {avg['optimized_global_mpjpe']}")
    print(sep)
    print(f"Average original cam pose error: {avg['original_camera_pos_error']}")
    print(f"Average optimized cam pose error: {avg['optimized_camera_pos_error']}")
    print(sep)
    print(f"Average original aligned cam pose error: {avg['original_aligned_camera_pos_error']}")
    print(f"Average optimized aligned cam pose error: {avg['optimized_aligned_camera_pos_error']}")
    print(sep)
    print(f"Average original_aligned_global_mpjpe: {avg['original_aligned_global_mpjpe']}")
    print(f"Average aligned_mid_seq_mpjpe: {avg['aligned_mid_seq_mpjpe']}")
    print(f"Average optimized_aligned_global_mpjpe: {avg['optimized_aligned_global_mpjpe']}")
    print(sep)
    print(f"Average aligned original global pose mpjpe: {avg['aligned_original_mpjpe']}")
    print(f"Average aligned mid local pose mpjpe: {avg['aligned_mid_optimized_mpjpe']}")
    print(f"Average aligned optimized global pose mpjpe: {avg['aligned_optimized_mpjpe']}")
    print(sep)
    print(f"Average bone length aligned original global pose mpjpe: {avg['bone_length_aligned_original_mpjpe']}")
    print(f"Average bone length aligned mid local pose mpjpe: {avg['bone_length_aligned_mid_optimized_mpjpe']}")
    print(f"Average bone length aligned optimized global pose mpjpe: {avg['bone_length_aligned_optimized_mpjpe']}")
    print(sep)
    print(f"joints error is: {avg['joints_error']}")
