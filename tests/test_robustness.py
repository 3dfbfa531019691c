"""Degraded-input robustness: the optimization must stay finite and
useful when heatmaps are partially missing or noisy — conditions real
Mo2Cap2 network output exhibits (occlusions, detector failures) that the
synthetic Gaussian blobs idealize away."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from globalegomocap_tpu.config import (
    OptimizeConfig, SolverConfig, PriorConfig)
from globalegomocap_tpu.data.synthetic import synthetic_chunk
from globalegomocap_tpu.optimize.driver import SequenceOptimizer, build_model


@pytest.fixture(scope="module")
def opt():
    cfg = OptimizeConfig(
        prior=PriorConfig(latent_dim=32, seq_len=10,
                          hidden_dims=(8, 8, 16, 16, 32)),
        solver=SolverConfig(method="lbfgs_fixed", max_iter=4,
                            history_size=4, fused_probes=True),
        heatmap_crop=8)
    model = build_model(cfg)
    v = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 10, 45)), False)
    return SequenceOptimizer(model, v, v, cfg)


def test_zeroed_joint_maps_stay_finite(opt):
    """Detector dropout: 30% of per-frame-per-joint maps all-zero.
    argmax of a zero map crops at (0,0) with zero mass — the term
    contributes nothing and the solve must stay finite."""
    chunk = synthetic_chunk(26, seed=5)
    maps = np.asarray(chunk.heatmaps).copy()
    rng = np.random.default_rng(0)
    drop = rng.random((maps.shape[0], maps.shape[-1])) < 0.3
    maps[drop[:, None, None, :].repeat(maps.shape[1], 1)
         .repeat(maps.shape[2], 2)] = 0.0
    res = opt.optimize_chunk(chunk._replace(heatmaps=maps))
    assert np.isfinite(np.asarray(res.optimized)).all()
    assert np.isfinite(np.asarray(res.mid)).all()


def test_noisy_maps_stay_finite_and_close(opt):
    """Background noise at 30% of peak amplitude: results stay finite
    and within a sane distance of the clean-map solution."""
    chunk = synthetic_chunk(26, seed=6)
    clean = opt.optimize_chunk(chunk)
    maps = np.asarray(chunk.heatmaps)
    rng = np.random.default_rng(1)
    noisy = maps + 0.3 * maps.max() * rng.random(maps.shape).astype(
        np.float32)
    res = opt.optimize_chunk(chunk._replace(heatmaps=noisy))
    o = np.asarray(res.optimized)
    assert np.isfinite(o).all()
    # same problem, perturbed evidence: solutions should be close
    assert float(np.abs(o - np.asarray(clean.optimized)).mean()) < 0.05


def test_all_zero_heatmaps_equal_no_reproj(opt):
    """Fully absent evidence: the solve must degrade EXACTLY to the
    no-reprojection problem (the term is a sum over sampled scores)."""
    from globalegomocap_tpu.config import (
        with_overrides, EnergyConfig)
    chunk = synthetic_chunk(26, seed=7)
    zero = chunk._replace(heatmaps=np.zeros_like(
        np.asarray(chunk.heatmaps)))
    res_zero = opt.optimize_chunk(zero)
    no_reproj = SequenceOptimizer(
        opt.model, opt.local_variables, opt.global_variables,
        with_overrides(opt.cfg, energy=EnergyConfig(reproj=0.0)))
    res_off = no_reproj.optimize_chunk(zero)
    np.testing.assert_allclose(np.asarray(res_zero.optimized),
                               np.asarray(res_off.optimized),
                               rtol=1e-4, atol=1e-5)


def test_corpus_v2_contract_and_noise_structure():
    """The second evaluation regime (VERDICT r2 #4): jerky motion, SLAM
    camera noise, occluded/multimodal heatmaps — contract-identical to
    v1 chunks, with strictly larger estimated-global error (the camera
    noise the GLOBAL stage exists to fix) and flattened-peak maps that
    exercise the crop-mass guard."""
    import numpy as np
    from globalegomocap_tpu.data.synthetic import (
        synthetic_chunk, synthetic_chunk_v2)

    v1 = synthetic_chunk(30, seed=4)
    v2 = synthetic_chunk_v2(30, seed=4)
    for a, b in zip(v1, v2):
        assert np.asarray(a).shape == np.asarray(b).shape
        assert np.isfinite(np.asarray(b)).all()

    def est_err(c):
        return float(np.linalg.norm(
            c.estimated_global - c.gt_global, axis=-1).mean())

    assert est_err(v2) > est_err(v1)
    # camera noise: v2 camera poses differ from the true (v1) trajectory
    assert not np.allclose(v1.camera_poses, v2.camera_poses)
    # occlusions: some maps lost their peak mass (crop-guard regime)
    peak1 = np.asarray(v1.heatmaps).max(axis=(1, 2))   # (N, J)
    peak2 = np.asarray(v2.heatmaps).max(axis=(1, 2))
    assert (peak2 < 0.5 * peak1.min()).mean() > 0.05


def test_corpus_v3_contract_contacts_and_dropout():
    """The third evaluation regime (VERDICT r3 #6): discontinuous-contact
    motion and occlusion DROPOUT.  Contract-identical to v1; the motion
    must carry velocity discontinuities the smooth corpora lack, and the
    dropped maps must have NO mode at all (uniform floor), pulling the
    crop-mass coverage into guard-trip range."""
    import numpy as np
    from globalegomocap_tpu.data.synthetic import (
        synthetic_chunk, synthetic_chunk_v3)
    from globalegomocap_tpu.energy.terms import crop_mass_coverage

    v1 = synthetic_chunk(60, seed=4)
    v3 = synthetic_chunk_v3(60, seed=4)
    for a, b in zip(v1, v3):
        assert np.asarray(a).shape == np.asarray(b).shape
        assert np.isfinite(np.asarray(b)).all()

    # contacts: acceleration spikes well beyond the smooth corpus's
    def max_accel(c):
        p = c.gt_global
        return float(np.abs(np.diff(p, n=2, axis=0)).max())

    assert max_accel(v3) > 2.0 * max_accel(v1)

    # dropout: some (frame, joint) maps are a uniform floor (max == min)
    maps = np.asarray(v3.heatmaps)                      # (N, H, W, J)
    spread = maps.max(axis=(1, 2)) - maps.min(axis=(1, 2))   # (N, J)
    frac_dropped = float((spread < 1e-6).mean())
    assert 0.05 < frac_dropped < 0.6

    # ... in contiguous runs (a dropped cell's neighbour is usually
    # dropped too), not iid speckle
    d = spread < 1e-6
    both = (d[1:] & d[:-1]).sum()
    assert both > 0.5 * d[1:].sum()

    # the dropout floor pulls the guard statistic into trip range
    cov = crop_mass_coverage(
        np.moveaxis(maps, -1, 1).reshape(-1, 64, 64), 8)
    assert cov.mean() < 0.90


def test_v3_solve_stays_finite_and_guard_trips(opt):
    """The production config solves a v3 chunk end-to-end, and the guard
    sees the dropout (robust tier engages)."""
    import numpy as np
    from globalegomocap_tpu.data.synthetic import synthetic_chunk_v3
    chunk = synthetic_chunk_v3(18, seed=9)
    eff = opt._effective_cfg(chunk.heatmaps)
    assert eff.solver.max_iter >= 15          # guard tripped -> robust
    res = opt.run(chunk, with_metrics=True)
    errors = res[0]
    assert np.isfinite(float(errors["optimized_global_mpjpe"]))


def test_degraded_v2_solve_stays_finite(opt):
    """The production config solves a v2 chunk end-to-end."""
    import numpy as np
    from globalegomocap_tpu.data.synthetic import synthetic_chunk_v2
    res = opt.run(synthetic_chunk_v2(18, seed=9), with_metrics=True)
    errors = res[0]
    assert np.isfinite(float(errors["optimized_global_mpjpe"]))


def test_crop_guard_switches_to_robust_tier():
    """When the crop-mass guard trips (degraded maps), the effective
    config falls back to full maps AND the robust solver tier (history
    >= 10, 4 parity candidates); clean maps keep the fast tier."""
    import jax
    import jax.numpy as jnp
    from dataclasses import replace
    from globalegomocap_tpu.config import (
        OptimizeConfig, PriorConfig, SolverConfig)
    from globalegomocap_tpu.data.synthetic import (
        synthetic_chunk, synthetic_chunk_v2)
    from globalegomocap_tpu.optimize.driver import (
        SequenceOptimizer, build_model)

    cfg = OptimizeConfig(
        prior=PriorConfig(latent_dim=16, seq_len=10,
                          hidden_dims=(8, 8, 16, 16, 32)),
        solver=SolverConfig(method="lbfgs_fixed", max_iter=2,
                            history_size=5,
                            step_candidates=(1.0, 0.1)),
        sampling_impl="dense", heatmap_crop=8)
    model = build_model(cfg)
    v = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 10, 45)), False)
    opt = SequenceOptimizer(model, v, v, cfg)

    clean = opt._effective_cfg(synthetic_chunk(18, seed=1).heatmaps)
    assert clean.heatmap_crop == 8
    assert clean.solver.history_size == 5
    assert len(clean.solver.step_candidates) == 2

    degraded = opt._effective_cfg(synthetic_chunk_v2(18, seed=1).heatmaps)
    assert degraded.heatmap_crop == 0
    assert degraded.solver.history_size == 10
    assert len(degraded.solver.step_candidates) == 4
    # the robust tier also restores a full stage-1 budget (bone-aligned
    # degrades monotonically below 15 iterations on guard-tripped
    # corpora — quality_iter_crop_s1iter_v2.json)
    assert degraded.solver.max_iter == 15

    # opt-out keeps the fast tier on guard
    opt2 = SequenceOptimizer(model, v, v,
                             replace(cfg, robust_tier_on_guard=False))
    deg2 = opt2._effective_cfg(synthetic_chunk_v2(18, seed=1).heatmaps)
    assert deg2.heatmap_crop == 0 and deg2.solver.history_size == 5 \
        and deg2.solver.max_iter == 2
