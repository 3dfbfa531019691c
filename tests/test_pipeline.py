"""End-to-end pipeline tests on synthetic chunks.

With an untrained prior the pipeline must still run, converge the energies
and keep all shape/layout contracts; the full quality e2e (trained prior
improves MPJPE) lives in test_e2e_quality.py.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from globalegomocap_tpu.config import (
    OptimizeConfig, SolverConfig, PriorConfig, with_overrides)
from globalegomocap_tpu.data.synthetic import synthetic_chunk
from globalegomocap_tpu.data.test_data import (
    save_test_chunk, load_test_chunk)
from globalegomocap_tpu.models.conv_vae import ConvVAE
from globalegomocap_tpu.optimize.driver import (
    SequenceOptimizer, build_model, resolve_camera)
from globalegomocap_tpu.optimize.pipeline import stage_weights
from globalegomocap_tpu.energy.terms import total_energy_from_pose


SMALL_PRIOR = PriorConfig(latent_dim=64, seq_len=10,
                          hidden_dims=(16, 16, 32, 32, 64))


def small_cfg(**kw):
    cfg = OptimizeConfig(
        prior=SMALL_PRIOR,
        solver=SolverConfig(max_iter=10, history_size=10, max_ls_evals=10))
    return with_overrides(cfg, **kw) if kw else cfg


@pytest.fixture(scope="module")
def chunk():
    return synthetic_chunk(n_frames=40, seed=0)


@pytest.fixture(scope="module")
def optimizer(chunk):
    cfg = small_cfg()
    model = build_model(cfg)
    x = jnp.zeros((1, cfg.prior.seq_len, 45))
    v1 = model.init(jax.random.PRNGKey(0), x, False)
    v2 = model.init(jax.random.PRNGKey(1), x, False)
    return SequenceOptimizer(model, v1, v2, cfg)


class TestChunkIO:
    def test_pkl_roundtrip(self, chunk, tmp_path):
        save_test_chunk(chunk, str(tmp_path / "c0"))
        loaded = load_test_chunk(str(tmp_path / "c0"))
        np.testing.assert_array_equal(loaded.estimated_local,
                                      chunk.estimated_local)
        np.testing.assert_array_equal(loaded.heatmaps, chunk.heatmaps)

    def test_synthetic_consistency(self, chunk):
        """GT global == cam ∘ true local; estimated differs by the noise."""
        from globalegomocap_tpu.ops.transforms import transform_pose
        est_g = transform_pose(jnp.asarray(chunk.estimated_local),
                               jnp.asarray(chunk.camera_poses))
        np.testing.assert_allclose(np.asarray(est_g),
                                   chunk.estimated_global, atol=1e-4)
        err = np.linalg.norm(chunk.estimated_global - chunk.gt_global,
                             axis=-1).mean()
        assert 0.01 < err < 0.15  # the injected noise level

    def test_heatmaps_peak_at_projection(self, chunk):
        """The rendered heatmap argmax should match the true projected
        joints to within a pixel."""
        from globalegomocap_tpu.ops import fisheye
        cam = fisheye.default_camera("egosyn")
        # recover true local pose = gt pushed back to camera frame
        from globalegomocap_tpu.ops.transforms import (
            invert_se3, transform_pose)
        local_true = transform_pose(
            jnp.asarray(chunk.gt_global),
            invert_se3(jnp.asarray(chunk.camera_poses)))
        p2d = np.asarray(fisheye.world2camera(
            cam, local_true.reshape(-1, 3))).reshape(-1, 15, 2)
        hx = (p2d[..., 0] - 128) / 16
        hy = p2d[..., 1] / 16
        hm = chunk.heatmaps.transpose(0, 3, 1, 2)  # (N, J, H, W)
        flat = hm.reshape(hm.shape[0], 15, -1)
        idx = flat.argmax(-1)
        px = idx % 64
        py = idx // 64
        assert np.abs(px - np.round(hx)).mean() < 1.0
        assert np.abs(py - np.round(hy)).mean() < 1.0


def test_total_energy_soft_smooth_term():
    """The optional smoothed_pose argument adds exactly
    soft_smooth * ||pose - smoothed||^2 to the total energy."""
    from globalegomocap_tpu.energy.terms import EnergyWeights
    from globalegomocap_tpu.ops import fisheye
    rng = np.random.default_rng(4)
    pose = jnp.asarray(rng.normal(size=(10, 15, 3)).astype(np.float32))
    anchor = jnp.asarray(rng.normal(size=(10, 15, 3)).astype(np.float32))
    sm = jnp.asarray(rng.normal(size=(10, 15, 3)).astype(np.float32))
    bl = jnp.ones((15,), jnp.float32)
    cam = fisheye.default_camera("egosyn")
    w = EnergyWeights.create(soft_smooth=2.0)
    e0 = float(total_energy_from_pose(pose, anchor, bl, None, cam, w,
                                      False))
    e1 = float(total_energy_from_pose(pose, anchor, bl, None, cam, w,
                                      False, smoothed_pose=sm))
    expect = 2.0 * float(jnp.sum(jnp.square(pose - sm)))
    np.testing.assert_allclose(e1 - e0, expect, rtol=1e-5)


class TestPipelineRuns:
    def test_shapes_and_finiteness(self, optimizer, chunk):
        errors, est, mid_local, opt, gt = optimizer.run(chunk)
        n_cov = 34  # covered_frames(40, 10, 8)
        for arr in (est, mid_local, opt, gt):
            assert arr.shape == (n_cov, 15, 3)
            assert np.all(np.isfinite(arr))
        assert errors is not None
        assert np.isfinite(errors["optimized_global_mpjpe"])

    def test_stage_energy_decreases(self, optimizer, chunk):
        """The solver must strictly decrease the stage-1 energy vs the
        encoder-mean init for the batch of windows."""
        from globalegomocap_tpu.optimize.window import slice_windows
        from globalegomocap_tpu.ops.skeleton import mean_bone_lengths

        cfg = optimizer.cfg
        cam = resolve_camera(cfg)
        local_w, _ = stage_weights(cfg)
        model = optimizer.model
        win = slice_windows(jnp.asarray(chunk.estimated_local), 10, 8)
        heat = jnp.moveaxis(
            slice_windows(jnp.asarray(chunk.heatmaps), 10, 8), -1, 2)
        bl = jnp.broadcast_to(
            mean_bone_lengths(jnp.asarray(chunk.estimated_local)),
            (win.shape[0], 15))

        mu, _ = model.apply(optimizer.local_variables,
                            win.reshape(win.shape[0], 10, 45), False,
                            method=ConvVAE.encode)

        def energy(z, anchor, h, b):
            pose = model.apply(optimizer.local_variables, z[None], False,
                               method=ConvVAE.decode_to_bodypose)[0]
            return total_energy_from_pose(pose, anchor, b, h, cam,
                                          local_w, True)

        from globalegomocap_tpu.optimize.pipeline import optimize_stage
        e0 = jax.vmap(energy)(mu, win, heat, bl)
        out = optimize_stage(model, optimizer.local_variables, win, heat,
                             bl, cam, local_w, True, cfg)
        # re-encode the optimized pose? No — evaluate the energy of the
        # decoded result directly against the same anchors.
        def pose_energy(pose, anchor, h, b):
            return total_energy_from_pose(pose, anchor, b, h, cam,
                                          local_w, True)
        e1 = jax.vmap(pose_energy)(out, win, heat, bl)
        assert float(jnp.mean(e1)) < float(jnp.mean(e0))

    def test_deterministic(self, optimizer, chunk):
        _, _, _, opt1, _ = optimizer.run(chunk, with_metrics=False)
        _, _, _, opt2, _ = optimizer.run(chunk, with_metrics=False)
        np.testing.assert_array_equal(opt1, opt2)

    def test_adam_method_runs(self, chunk):
        cfg = small_cfg(solver=SolverConfig(method="adam", adam_steps=30))
        model = build_model(cfg)
        x = jnp.zeros((1, 10, 45))
        v = model.init(jax.random.PRNGKey(0), x, False)
        opt = SequenceOptimizer(model, v, v, cfg)
        errors, *_ = opt.run(chunk)
        assert np.isfinite(errors["optimized_global_mpjpe"])

    def test_sample_init_matches_mu_init_quality(self, optimizer, chunk):
        """init='sample' reproduces the reference's stochastic
        reparameterized-sample init (optimizer.py:257): the trajectory
        genuinely differs from mu-init, is reproducible for a fixed seed,
        and lands at the same quality within noise."""
        cfg = small_cfg(solver=SolverConfig(
            max_iter=10, history_size=10, max_ls_evals=10,
            init="sample", init_seed=3))
        opt_s = SequenceOptimizer(optimizer.model,
                                  optimizer.local_variables,
                                  optimizer.global_variables, cfg)
        e_mu, *_ , opt_mu, _ = optimizer.run(chunk)
        e_s, *_ , opt_sam, _ = opt_s.run(chunk)
        assert np.all(np.isfinite(opt_sam))
        assert not np.array_equal(opt_mu, opt_sam)  # truly stochastic init
        # reproducible under the same seed
        _, _, _, opt_sam2, _ = opt_s.run(chunk, with_metrics=False)
        np.testing.assert_array_equal(opt_sam, opt_sam2)
        a = float(e_mu["optimized_global_mpjpe"])
        b = float(e_s["optimized_global_mpjpe"])
        assert abs(a - b) <= 0.25 * max(a, b) + 1e-3, (a, b)

    def test_soft_smooth_term_wired(self, optimizer, chunk):
        """energy.soft_smooth > 0 anchors each window to its pre-smoothed
        input (the reference's dead soft_smooth_energy + the
        gaussian_filter1d'ed input at optimizer.py:382-383): stage-1
        output moves toward the smoothed input sequence."""
        from globalegomocap_tpu.config import EnergyConfig
        from globalegomocap_tpu.ops.filtering import gaussian_filter1d

        cfg = small_cfg(energy=EnergyConfig(soft_smooth=50.0),
                        solver=SolverConfig(max_iter=10, history_size=10,
                                            max_ls_evals=10))
        opt_ss = SequenceOptimizer(optimizer.model,
                                   optimizer.local_variables,
                                   optimizer.global_variables, cfg)
        _, _, mid_off, _, _ = optimizer.run(chunk, with_metrics=False)
        _, _, mid_on, _, _ = opt_ss.run(chunk, with_metrics=False)
        assert np.all(np.isfinite(mid_on))
        assert not np.array_equal(mid_off, mid_on)
        target = np.asarray(gaussian_filter1d(
            jnp.asarray(chunk.estimated_local), cfg.input_smooth_sigma,
            axis=0))[:mid_on.shape[0]]
        d_on = np.linalg.norm(mid_on - target, axis=-1).mean()
        d_off = np.linalg.norm(mid_off - target, axis=-1).mean()
        assert d_on < d_off, (d_on, d_off)


class TestResidualGlobalStage:
    """EnergyConfig.global_residual: stage-2 output p(z) = anchor +
    decode(z) - decode(z0) — exact at init, so the global stage cannot
    regress the stage-1 result through its decode/recon floor (the
    reference's own stage-2 failure mode, its tripwire at
    optimize_whole_sequence.py:87-88)."""

    def _stage_inputs(self, chunk):
        from globalegomocap_tpu.optimize.window import slice_windows
        from globalegomocap_tpu.ops.skeleton import mean_bone_lengths
        win = slice_windows(jnp.asarray(chunk.estimated_local), 10, 8)
        heat = jnp.zeros((win.shape[0], 10, 15, 4, 4), jnp.float32)
        bl = jnp.broadcast_to(
            mean_bone_lengths(jnp.asarray(chunk.estimated_local)),
            (win.shape[0], 15))
        return win, heat, bl

    def test_exact_at_init(self, optimizer, chunk):
        """Zero solver iterations => the residual stage returns its
        anchor EXACTLY (no decode floor), unlike the plain stage."""
        from globalegomocap_tpu.optimize.pipeline import (
            optimize_stage, stage_weights)
        win, heat, bl = self._stage_inputs(chunk)
        cfg = small_cfg(solver=SolverConfig(method="lbfgs_fixed",
                                            max_iter=0, history_size=3))
        cam = resolve_camera(cfg)
        _, global_w = stage_weights(cfg)
        out = optimize_stage(optimizer.model, optimizer.global_variables,
                             win, heat, bl, cam, global_w, False, cfg,
                             residual=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(win),
                                   rtol=1e-5, atol=1e-6)
        plain = optimize_stage(optimizer.model,
                               optimizer.global_variables, win, heat, bl,
                               cam, global_w, False, cfg, residual=False)
        assert float(jnp.abs(plain - win).max()) > 1e-3  # decode floor

    def test_energy_monotone_vs_anchor(self, optimizer, chunk):
        """The residual solve starts AT the anchor, so its output's
        stage-2 energy can only be <= the anchor's energy."""
        from globalegomocap_tpu.optimize.pipeline import (
            optimize_stage, stage_weights)
        win, heat, bl = self._stage_inputs(chunk)
        cfg = small_cfg(solver=SolverConfig(
            method="lbfgs_fixed", max_iter=5, history_size=5,
            fused_probes=True, step_candidates=(1.0, 0.1)))
        cam = resolve_camera(cfg)
        _, global_w = stage_weights(cfg)
        out = optimize_stage(optimizer.model, optimizer.global_variables,
                             win, heat, bl, cam, global_w, False, cfg,
                             residual=True)

        def e_of(poses):
            return float(sum(
                total_energy_from_pose(poses[i], win[i], bl[i], None,
                                       cam, global_w, False)
                for i in range(win.shape[0])))

        assert e_of(out) <= e_of(win) * (1 + 1e-6) + 1e-6
        assert not np.array_equal(np.asarray(out), np.asarray(win))

    def test_batched_solver_matches_vmap(self, optimizer, chunk):
        """The explicitly-batched solver path must apply the same
        residual offset as the per-window vmapped path."""
        from globalegomocap_tpu.optimize.pipeline import (
            optimize_stage, stage_weights)
        win, heat, bl = self._stage_inputs(chunk)
        base = SolverConfig(method="lbfgs_fixed", max_iter=3,
                            history_size=3, fused_probes=True,
                            step_candidates=(1.0, 0.1))
        cam = resolve_camera(small_cfg())
        _, global_w = stage_weights(small_cfg())
        outs = []
        for batched in (False, True):
            cfg = small_cfg(solver=with_overrides(
                base, batched_solver=batched))
            outs.append(optimize_stage(
                optimizer.model, optimizer.global_variables, win, heat,
                bl, cam, global_w, False, cfg, residual=True))
        np.testing.assert_allclose(np.asarray(outs[0]),
                                   np.asarray(outs[1]),
                                   rtol=1e-4, atol=1e-5)

    def test_pipeline_runs_with_global_residual(self, optimizer, chunk):
        from globalegomocap_tpu.config import EnergyConfig
        cfg = small_cfg(energy=EnergyConfig(global_residual=True),
                        solver=SolverConfig(max_iter=10, history_size=10,
                                            max_ls_evals=10))
        opt_r = SequenceOptimizer(optimizer.model,
                                  optimizer.local_variables,
                                  optimizer.global_variables, cfg)
        errors, est, mid_local, opt, gt = opt_r.run(chunk)
        assert np.all(np.isfinite(opt))
        assert np.isfinite(errors["optimized_global_mpjpe"])


def test_global_max_iter_override():
    """solver.global_max_iter only changes stage 2: None == same value as
    max_iter (identical results), and a smaller budget changes only the
    optimized field (estimated/mid are stage-1 outputs)."""
    import jax
    import numpy as np
    from dataclasses import replace
    from globalegomocap_tpu.config import (
        OptimizeConfig, PriorConfig, SolverConfig)
    from globalegomocap_tpu.data.synthetic import synthetic_chunk
    from globalegomocap_tpu.data.test_data import TestChunk
    from globalegomocap_tpu.optimize.driver import (
        SequenceOptimizer, build_model)

    base = OptimizeConfig(
        prior=PriorConfig(latent_dim=16, seq_len=10,
                          hidden_dims=(8, 8, 16, 16, 32)),
        solver=SolverConfig(method="lbfgs_fixed", max_iter=4,
                            history_size=3, fused_probes=True),
        sampling_impl="dense", heatmap_crop=8, fold_bn=True,
        decoder_impl="shift")
    model = build_model(base)
    v = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 10, 45)), False)
    chunk = TestChunk(*synthetic_chunk(26, seed=1))

    outs = {}
    for label, s2 in (("none", None), ("same", 4), ("short", 1)):
        cfg = replace(base, solver=replace(base.solver,
                                           global_max_iter=s2))
        outs[label] = SequenceOptimizer(model, v, v, cfg).optimize_chunk(
            chunk)
    np.testing.assert_array_equal(np.asarray(outs["none"].optimized),
                                  np.asarray(outs["same"].optimized))
    for f in ("estimated", "mid", "mid_local", "gt"):
        np.testing.assert_array_equal(np.asarray(getattr(outs["none"], f)),
                                      np.asarray(getattr(outs["short"], f)))
    assert np.abs(np.asarray(outs["none"].optimized)
                  - np.asarray(outs["short"].optimized)).max() > 1e-6


class TestBf16Compute:
    """compute_dtype=bfloat16: the solver's decode/encode evals run in
    bf16 (+24% at c320, c320_dtype_rematch_ab.json) but the RETURNED
    pose is decoded in f32 (mixed-precision output — the all-bf16 arm's
    bone-aligned cost was pure output rounding)."""

    def _run(self, chunk, dtype, **kw):
        cfg = small_cfg(compute_dtype=dtype, heatmap_crop=8,
                        solver=SolverConfig(method="lbfgs_fixed",
                                            max_iter=4, history_size=3,
                                            step_candidates=(1.0, 0.1)),
                        **kw)
        model = build_model(cfg)
        x = jnp.zeros((1, cfg.prior.seq_len, 45))
        v1 = model.init(jax.random.PRNGKey(0), x, False)
        v2 = model.init(jax.random.PRNGKey(1), x, False)
        opt = SequenceOptimizer(model, v1, v2, cfg)
        return opt.optimize_chunk(chunk)

    def test_bf16_output_is_f32_and_tracks_f32_solve(self, chunk):
        a = self._run(chunk, "float32")
        b = self._run(chunk, "bfloat16")
        assert b.optimized.dtype == jnp.float32
        assert bool(jnp.all(jnp.isfinite(b.optimized)))
        # params are f32 either way; bf16 evals perturb the trajectory
        # but must land near the f32 solve (loose: untrained prior)
        diff = float(jnp.mean(jnp.abs(a.optimized - b.optimized)))
        assert diff < 0.05, diff

    def test_bf16_residual_stage_exact_at_init(self, chunk):
        """The residual stage's exact-at-init property must survive bf16
        compute: the offset and the final decode both run f32, so zero
        solver iterations return the anchor to f32 precision — NOT bf16
        precision (which would be ~3e-3 at pose scale)."""
        from globalegomocap_tpu.optimize.pipeline import (
            optimize_stage, stage_weights)
        from globalegomocap_tpu.optimize.window import slice_windows
        from globalegomocap_tpu.ops.skeleton import mean_bone_lengths
        cfg = small_cfg(compute_dtype="bfloat16",
                        solver=SolverConfig(method="lbfgs_fixed",
                                            max_iter=0, history_size=3))
        model = build_model(cfg)
        x = jnp.zeros((1, cfg.prior.seq_len, 45))
        v = model.init(jax.random.PRNGKey(1), x, False)
        win = slice_windows(jnp.asarray(chunk.estimated_local), 10, 8)
        heat = jnp.zeros((win.shape[0], 10, 15, 4, 4), jnp.float32)
        bl = jnp.broadcast_to(
            mean_bone_lengths(jnp.asarray(chunk.estimated_local)),
            (win.shape[0], 15))
        cam = resolve_camera(cfg)
        _, global_w = stage_weights(cfg)
        out = optimize_stage(model, v, win, heat, bl, cam, global_w,
                             False, cfg, residual=True)
        assert out.dtype == jnp.float32
        np.testing.assert_allclose(np.asarray(out), np.asarray(win),
                                   rtol=1e-5, atol=1e-6)

    def test_bf16_delta_tier(self, chunk):
        """bfloat16_delta: f32 encode/output, bf16 SOLVER STATE iterated
        as a delta around the f32 mu.  Needs the batched solver (the
        production path); must return f32, stay finite, and land near
        the f32 solve."""
        cfg = small_cfg(compute_dtype="bfloat16_delta", heatmap_crop=8,
                        solver=SolverConfig(method="lbfgs_fixed",
                                            max_iter=4, history_size=3,
                                            step_candidates=(1.0, 0.1),
                                            fused_probes=True,
                                            batched_solver=True))
        cfg_f32 = small_cfg(compute_dtype="float32", heatmap_crop=8,
                            solver=cfg.solver)
        outs = {}
        for c in (cfg, cfg_f32):
            model = build_model(c)
            x = jnp.zeros((1, c.prior.seq_len, 45))
            v1 = model.init(jax.random.PRNGKey(0), x, False)
            v2 = model.init(jax.random.PRNGKey(1), x, False)
            outs[c.compute_dtype] = SequenceOptimizer(
                model, v1, v2, c).optimize_chunk(chunk)
        b = outs["bfloat16_delta"]
        assert b.optimized.dtype == jnp.float32
        assert bool(jnp.all(jnp.isfinite(b.optimized)))
        diff = float(jnp.mean(jnp.abs(
            outs["float32"].optimized - b.optimized)))
        assert diff < 0.05, diff

    def test_bf16_delta_residual_exact_at_init(self, chunk):
        """Zero solver iterations at the delta tier must return the
        anchor to f32 precision: dz=0 makes the init exact BY
        CONSTRUCTION (the tier's reason to exist) even though the state
        is bf16."""
        from globalegomocap_tpu.optimize.pipeline import (
            optimize_stage, stage_weights)
        from globalegomocap_tpu.optimize.window import slice_windows
        from globalegomocap_tpu.ops.skeleton import mean_bone_lengths
        cfg = small_cfg(compute_dtype="bfloat16_delta",
                        solver=SolverConfig(method="lbfgs_fixed",
                                            max_iter=0, history_size=3,
                                            batched_solver=True,
                                            step_candidates=(1.0, 0.1)))
        model = build_model(cfg)
        x = jnp.zeros((1, cfg.prior.seq_len, 45))
        v = model.init(jax.random.PRNGKey(1), x, False)
        win = slice_windows(jnp.asarray(chunk.estimated_local), 10, 8)
        heat = jnp.zeros((win.shape[0], 10, 15, 4, 4), jnp.float32)
        bl = jnp.broadcast_to(
            mean_bone_lengths(jnp.asarray(chunk.estimated_local)),
            (win.shape[0], 15))
        cam = resolve_camera(cfg)
        _, global_w = stage_weights(cfg)
        out = optimize_stage(model, v, win, heat, bl, cam, global_w,
                             False, cfg, residual=True)
        assert out.dtype == jnp.float32
        np.testing.assert_allclose(np.asarray(out), np.asarray(win),
                                   rtol=1e-5, atol=1e-6)

    def test_bf16_f32head_tier(self, chunk):
        """bfloat16_f32head: bf16 encoder convs + an f32 fc_mu init head
        (fc_var stays bf16).  The pipeline must run end-to-end and land
        near the f32 solve; the encode under a head_dtype=f32 clone must
        return an f32 mu from a bf16 model (the tier's whole point —
        the init mu never gets bf16-rounded)."""
        a = self._run(chunk, "float32")
        b = self._run(chunk, "bfloat16_f32head")
        assert bool(jnp.all(jnp.isfinite(b.optimized)))
        diff = float(jnp.mean(jnp.abs(a.optimized - b.optimized)))
        assert diff < 0.05, diff

        from globalegomocap_tpu.models.conv_vae import ConvVAE
        cfg = small_cfg(compute_dtype="bfloat16_f32head")
        model = build_model(cfg)                       # dtype=bf16
        x = jnp.zeros((1, cfg.prior.seq_len, 45))
        v = model.init(jax.random.PRNGKey(0), x, False)
        mu_bf16, lv_bf16 = model.apply(v, x, False, method=ConvVAE.encode)
        headed = model.clone(head_dtype=jnp.float32)
        mu_f32, lv_f32 = headed.apply(v, x, False, method=ConvVAE.encode)
        assert mu_bf16.dtype == jnp.bfloat16
        assert mu_f32.dtype == jnp.float32
        assert lv_f32.dtype == jnp.bfloat16   # fc_var untouched
        # same params, same features: the f32 head must agree with the
        # bf16 head to bf16 rounding
        np.testing.assert_allclose(np.asarray(mu_bf16, np.float32),
                                   np.asarray(mu_f32), rtol=2e-2,
                                   atol=2e-2)
