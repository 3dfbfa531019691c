"""Guard-trip fast path (OptimizeConfig.guard_crop): estimate-centered
crops keep the fused-kernel staged contract on corpora whose maps trip
the crop-mass guard (multimodal / occlusion-flattened), instead of the
full-map XLA fallback.

The reference's heatmap term has no crop assumption (reference:
optimizer.py:139-149 — it bilinearly samples 4 texels around the
projected joint), so ANY crop is valid as long as it contains the
neighbourhood the solver actually samples; the solver samples near the
projected initial estimate, which is exactly where these crops center.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest


def _small_cfg(**kw):
    from globalegomocap_tpu.config import (
        OptimizeConfig, PriorConfig, SolverConfig)
    return OptimizeConfig(
        prior=PriorConfig(latent_dim=16, seq_len=10,
                          hidden_dims=(8, 8, 16, 16, 32)),
        solver=SolverConfig(method="lbfgs_fixed", max_iter=2,
                            history_size=2),
        **kw)


def _bimodal(chunk):
    maps = np.asarray(chunk.heatmaps)
    return chunk._replace(heatmaps=maps + np.roll(maps, 32, axis=1))


def test_crop_at_centers_matches_peak_crop_at_peaks():
    """With centers = the argmax peaks, crop_heatmaps_at_centers must
    reproduce crop_heatmaps_channels_last exactly (same gather)."""
    from globalegomocap_tpu.energy.terms import (
        crop_heatmaps_at_centers_channels_last, crop_heatmaps_channels_last)
    rng = np.random.default_rng(11)
    maps = jnp.asarray(rng.random((4, 64, 64, 15), dtype=np.float32))
    flat = maps.reshape(4, 64 * 64, 15)
    am = jnp.argmax(flat, axis=-2)
    centers = jnp.stack([am // 64, am % 64], axis=-1).astype(jnp.float32)
    c1, o1, hw1 = crop_heatmaps_at_centers_channels_last(maps, 8, centers)
    c2, o2, hw2 = crop_heatmaps_channels_last(maps, 8)
    assert hw1 == hw2
    np.testing.assert_array_equal(np.asarray(c1), np.asarray(c2))
    np.testing.assert_array_equal(np.asarray(o1), np.asarray(o2))


def test_crop_at_centers_np_mirror_bit_exact():
    """The host-staging numpy mirror must be bit-exact vs the jax
    version, including centers outside the map (clip) and half-pixel
    centers (round)."""
    from globalegomocap_tpu.energy.terms import (
        crop_heatmaps_at_centers_channels_last,
        crop_heatmaps_at_centers_channels_last_np)
    rng = np.random.default_rng(3)
    maps = rng.random((3, 48, 40, 15), dtype=np.float32)
    centers = rng.uniform(-10, 60, size=(3, 15, 2)).astype(np.float32)
    centers[0, 0] = [7.5, 8.5]   # round-half-to-even on both sides
    cj, oj, hwj = crop_heatmaps_at_centers_channels_last(
        jnp.asarray(maps), 8, jnp.asarray(centers))
    cn, on, hwn = crop_heatmaps_at_centers_channels_last_np(maps, 8,
                                                            centers)
    assert hwj == hwn
    np.testing.assert_array_equal(np.asarray(cj), cn)
    np.testing.assert_array_equal(np.asarray(oj), on)


def test_estimate_centers_agree_with_energy_projection():
    """projected_estimate_centers must land on the same pixel coordinates
    the heatmap energy samples at (same projection + grid mapping), so a
    k-crop at those centers contains the init's sampling point."""
    from globalegomocap_tpu.energy.terms import (
        project_to_heatmap_grid, projected_estimate_centers)
    from globalegomocap_tpu.ops import fisheye
    from globalegomocap_tpu.data.synthetic import synthetic_chunk
    cam = fisheye.default_camera()
    chunk = synthetic_chunk(n_frames=6, seed=0)
    est = jnp.asarray(chunk.estimated_local)
    cen = projected_estimate_centers(est, cam, 64, 64)
    grid = project_to_heatmap_grid(est.reshape(-1, 3), cam)
    ix = (grid[:, 0] + 1.0) * 0.5 * 63
    iy = (grid[:, 1] + 1.0) * 0.5 * 63
    np.testing.assert_allclose(np.asarray(cen.reshape(-1, 2)),
                               np.stack([iy, ix], -1), rtol=0, atol=1e-5)


def test_guard_crop_fast_path_stages_estimate_centered_crops():
    """With guard_crop set, a guard-tripped corpus stages k=guard_crop
    crops (origins present, fused contract) instead of full maps, the
    robust solver tier still engages, and the solve completes finite."""
    from dataclasses import replace
    from globalegomocap_tpu.data.synthetic import synthetic_chunk
    from globalegomocap_tpu.optimize.driver import (
        SequenceOptimizer, build_model)

    cfg = _small_cfg(heatmap_crop=8, guard_crop=16)
    model = build_model(cfg)
    v = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 10, 45)), False)
    opt = SequenceOptimizer(model, v, v, cfg)

    chunks = [_bimodal(synthetic_chunk(n_frames=26, seed=s))
              for s in (71, 72)]
    staged = opt.stage(chunks)
    assert staged.crop_coverage is not None \
        and staged.crop_coverage < cfg.heatmap_crop_min_mass
    # the fast path stages crops, not full maps
    assert staged.origins is not None and staged.full_hw == (64, 64)
    assert staged.heat.shape[-1] == 16 * 16 * 15   # flat (C, F, k*k*J)

    eff = opt._cfg_for_coverage(staged.crop_coverage)
    assert eff.heatmap_crop == 16 and eff.crop_center == "estimate"
    assert eff.solver.max_iter >= 15     # robust tier still engages

    res = opt.optimize_chunks_batched(staged, mode="flat")
    assert np.isfinite(np.asarray(res.optimized)).all()

    # estimate-centered crops must out-sample peak-centered ones on the
    # bimodal maps: the energy at the init should see real mass
    from globalegomocap_tpu.energy.terms import (
        crop_heatmaps_at_centers_channels_last, projected_estimate_centers)
    maps = jnp.asarray(chunks[0].heatmaps)
    est = jnp.asarray(chunks[0].estimated_local)
    cen = projected_estimate_centers(est, opt._camera, 64, 64)
    crops, _, _ = crop_heatmaps_at_centers_channels_last(maps, 16, cen)
    # the init's projection is the crop center -> central 4x4 holds mass
    center_mass = float(jnp.clip(crops[:, 6:10, 6:10, :], 0, None).sum())
    assert center_mass > 0.0


def test_guard_crop_host_staging_matches_device():
    """stage(on_host=True) must produce the same staged crops/origins as
    device staging on the guard-crop path (bit-exact gather at identical
    origins)."""
    from globalegomocap_tpu.data.synthetic import synthetic_chunk
    from globalegomocap_tpu.optimize.driver import (
        SequenceOptimizer, build_model)

    cfg = _small_cfg(heatmap_crop=8, guard_crop=16)
    model = build_model(cfg)
    v = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 10, 45)), False)
    opt = SequenceOptimizer(model, v, v, cfg)

    chunks = [_bimodal(synthetic_chunk(n_frames=26, seed=s))
              for s in (81, 82)]
    dev = opt.stage(chunks)
    host = opt.stage(chunks, on_host=True)
    assert host.origins is not None
    np.testing.assert_array_equal(np.asarray(dev.origins),
                                  np.asarray(host.origins))
    np.testing.assert_allclose(np.asarray(dev.heat),
                               np.asarray(host.heat), rtol=0, atol=0)
    assert dev.full_hw == host.full_hw == (64, 64)


def test_guard_crop_fused_pipeline_matches_xla_path():
    """On a guard-tripped corpus with guard_crop, the mega-kernel path
    (fused_energy) must reproduce the XLA crop path's solve (same staged
    crops, same trajectory up to fp reassociation)."""
    from globalegomocap_tpu.config import (
        OptimizeConfig, PriorConfig, SolverConfig)
    from globalegomocap_tpu.data.synthetic import synthetic_chunk
    from globalegomocap_tpu.optimize.driver import (
        SequenceOptimizer, build_model)

    def cfg_for(fused):
        return OptimizeConfig(
            prior=PriorConfig(latent_dim=16, seq_len=10,
                              hidden_dims=(8, 8, 16, 16, 32)),
            solver=SolverConfig(method="lbfgs_fixed", max_iter=3,
                                history_size=2, fused_probes=True,
                                fused_energy=fused),
            heatmap_crop=8, guard_crop=16,
            robust_tier_on_guard=False)  # keep the tiny budget for speed

    model = build_model(cfg_for(True))
    v = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 10, 45)), False)
    chunks = [_bimodal(synthetic_chunk(n_frames=26, seed=91))]

    outs = {}
    for fused in (True, False):
        opt = SequenceOptimizer(model, v, v, cfg_for(fused))
        staged = opt.stage(chunks)
        assert staged.origins is not None          # fast path staged
        assert staged.heat.shape[-1] == 16 * 16 * 15
        outs[fused] = np.asarray(
            opt.optimize_chunks_batched(staged, mode="flat").optimized)
    assert np.isfinite(outs[True]).all()
    np.testing.assert_allclose(outs[True], outs[False],
                               rtol=1e-3, atol=2e-4)


def test_guard_crop_zero_keeps_full_map_fallback():
    """guard_crop=0 (the default) preserves the reference-parity
    full-map fallback exactly."""
    from globalegomocap_tpu.data.synthetic import synthetic_chunk
    from globalegomocap_tpu.optimize.driver import (
        SequenceOptimizer, build_model)

    cfg = _small_cfg(heatmap_crop=8)
    model = build_model(cfg)
    v = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 10, 45)), False)
    opt = SequenceOptimizer(model, v, v, cfg)
    staged = opt.stage([_bimodal(synthetic_chunk(n_frames=26, seed=71))])
    assert staged.origins is None and staged.full_hw is None
