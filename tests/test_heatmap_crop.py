"""Peak-centered heatmap cropping: exact at k = map size, mass-preserving
for Gaussian-blob maps, quality-preserving in the pipeline."""

import numpy as np
import jax
import jax.numpy as jnp

from globalegomocap_tpu.energy.terms import crop_heatmaps, heatmap_energy
from globalegomocap_tpu.ops import fisheye


def _blob_maps(rng, t=10, j=15, hw=64, sigma=1.5):
    """Gaussian-blob maps like the Mo2Cap2 network output."""
    cy = rng.uniform(8, hw - 8, size=(t, j))
    cx = rng.uniform(8, hw - 8, size=(t, j))
    ys, xs = np.mgrid[0:hw, 0:hw]
    m = np.exp(-(((ys[None, None] - cy[..., None, None]) ** 2
                  + (xs[None, None] - cx[..., None, None]) ** 2)
                 / (2 * sigma ** 2)))
    return m.astype(np.float32)


def test_crop_full_size_exact():
    """k = H means origins 0 and crops == maps."""
    rng = np.random.default_rng(0)
    maps = jnp.asarray(rng.random((4, 5, 16, 16), dtype=np.float32))
    crops, origins, (h, w) = crop_heatmaps(maps, 16)
    np.testing.assert_array_equal(np.asarray(crops), np.asarray(maps))
    np.testing.assert_array_equal(np.asarray(origins), 0.0)
    assert (h, w) == (16, 16)


def test_crop_centers_on_peak():
    rng = np.random.default_rng(1)
    maps = jnp.asarray(_blob_maps(rng, t=3, j=2))
    crops, origins, _ = crop_heatmaps(maps, 16)
    assert crops.shape == (3, 2, 16, 16)
    m = np.asarray(maps)
    o = np.asarray(origins).astype(int)
    for ti in range(3):
        for ji in range(2):
            py, px = np.unravel_index(m[ti, ji].argmax(), (64, 64))
            oy, ox = o[ti, ji]
            assert oy <= py < oy + 16 and ox <= px < ox + 16
            # the crop carries essentially all of the map's mass
            assert np.asarray(crops)[ti, ji].sum() > 0.999 * m[ti, ji].sum()


def test_cropped_energy_matches_full():
    """For blob maps the cropped heatmap energy equals the full-map energy
    wherever the solver actually samples (near the blobs)."""
    rng = np.random.default_rng(2)
    maps = jnp.asarray(_blob_maps(rng))
    cam = fisheye.default_camera("egosyn")
    pose = jnp.asarray(rng.normal(size=(10, 15, 3)).astype(np.float32)
                       * 0.3 + np.array([0, 0, 1.5], np.float32))

    e_full = float(heatmap_energy(pose, maps, cam))
    crops, origins, full_hw = crop_heatmaps(maps, 16)
    e_crop = float(heatmap_energy(pose, crops, cam, origins=origins,
                                  full_hw=full_hw))
    # energies only differ where a sample lands outside its crop, i.e.
    # > ~7 px from the peak — where the blob value is < 1e-5 anyway
    assert abs(e_full - e_crop) <= max(1e-4, 5e-3 * abs(e_full)), \
        (e_full, e_crop)

    # gradient parity too (drives the solver)
    g_full = jax.grad(lambda p: heatmap_energy(p, maps, cam))(pose)
    g_crop = jax.grad(lambda p: heatmap_energy(
        p, crops, cam, origins=origins, full_hw=full_hw))(pose)
    np.testing.assert_allclose(np.asarray(g_crop), np.asarray(g_full),
                               rtol=1e-3, atol=1e-5)


def test_crop_dense_impl_matches_gather():
    rng = np.random.default_rng(3)
    maps = jnp.asarray(_blob_maps(rng, t=4, j=3))
    cam = fisheye.default_camera("egosyn")
    pose = jnp.asarray(rng.normal(size=(4, 3, 3)).astype(np.float32)
                       * 0.3 + np.array([0, 0, 1.5], np.float32))
    crops, origins, full_hw = crop_heatmaps(maps, 16)
    a = float(heatmap_energy(pose, crops, cam, impl="gather",
                             origins=origins, full_hw=full_hw))
    b = float(heatmap_energy(pose, crops, cam, impl="dense",
                             origins=origins, full_hw=full_hw))
    np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-5)


def _bimodal_maps(rng, t=4, j=3, hw=64, sigma=1.5):
    """Two equal-mass Gaussian blobs per map, far apart — the multimodal
    shape real occluded Mo2Cap2 heatmaps can take."""
    a = _blob_maps(rng, t=t, j=j, hw=hw, sigma=sigma)
    b = _blob_maps(np.random.default_rng(rng.integers(1 << 30)),
                   t=t, j=j, hw=hw, sigma=sigma)
    return a + b


def test_crop_mass_coverage_metric():
    """crop_mass_coverage separates unimodal, multimodal and flattened
    maps (the guard's decision statistic)."""
    from globalegomocap_tpu.energy.terms import crop_mass_coverage
    rng = np.random.default_rng(7)
    blob = _blob_maps(rng, t=4, j=3)
    assert crop_mass_coverage(blob, 16).min() > 0.99
    # two equal blobs: the peak crop holds about half the mass
    bim = _bimodal_maps(np.random.default_rng(8))
    cov = crop_mass_coverage(bim, 16)
    assert cov.mean() < 0.75
    # flattened map: coverage ~ k^2 / (H*W)
    flat = np.ones((2, 2, 64, 64), np.float32)
    cov_f = crop_mass_coverage(flat, 16)
    np.testing.assert_allclose(cov_f, (16 * 16) / (64 * 64), rtol=1e-6)
    # k = map size is always full coverage
    assert crop_mass_coverage(bim, 64).min() == 1.0


def test_device_coverage_matches_numpy():
    """The driver's on-device guard statistic equals the numpy reference
    implementation."""
    from globalegomocap_tpu.energy.terms import (
        crop_coverage_mean, crop_mass_coverage)
    bim = _bimodal_maps(np.random.default_rng(11))
    for k in (8, 16):
        dev = float(crop_coverage_mean(jnp.asarray(bim), k))
        ref = float(crop_mass_coverage(bim, k).mean())
        np.testing.assert_allclose(dev, ref, rtol=1e-5)


def test_crop_misses_secondary_mode_drift():
    """Documents WHY the guard exists: when the argmax sits on a decoy
    mode away from where the solver samples, the peak crop silently
    discards the sampled mass — the cropped energy drifts far from the
    full-map energy at both k=8 and k=16."""
    rng = np.random.default_rng(9)
    t, j = 4, 3
    cam = fisheye.default_camera("egosyn")
    pose = jnp.asarray(rng.normal(size=(t, j, 3)).astype(np.float32)
                       * 0.3 + np.array([0, 0, 1.5], np.float32))
    # blob A at the projected joints (what the solver samples), decoy
    # blob B slightly taller in a far corner (wins the argmax)
    from globalegomocap_tpu.energy.terms import (
        crop_mass_coverage, project_to_heatmap_grid)
    grid = np.asarray(project_to_heatmap_grid(pose.reshape(-1, 3), cam))
    px = (grid[:, 0] + 1) * 0.5 * 63
    py = (grid[:, 1] + 1) * 0.5 * 63
    ys, xs = np.mgrid[0:64, 0:64]
    a = np.exp(-(((ys[None] - py[:, None, None]) ** 2
                  + (xs[None] - px[:, None, None]) ** 2) / (2 * 1.5 ** 2)))
    decoy_y, decoy_x = 5.0, 5.0
    b = 1.001 * np.exp(-(((ys - decoy_y) ** 2 + (xs - decoy_x) ** 2)
                         / (2 * 1.5 ** 2)))
    maps = jnp.asarray((a + b[None]).reshape(t, j, 64, 64)
                       .astype(np.float32))

    e_full = float(heatmap_energy(pose, maps, cam))
    for k in (8, 16):
        crops, origins, full_hw = crop_heatmaps(maps, k)
        e_crop = float(heatmap_energy(pose, crops, cam, origins=origins,
                                      full_hw=full_hw))
        # the crop lost most of the sampled signal
        assert abs(e_crop - e_full) > 0.3 * abs(e_full), (k, e_full, e_crop)
    # ... and the coverage guard catches exactly this situation
    assert crop_mass_coverage(np.asarray(maps), 16).mean() < 0.75


def test_crop_guard_falls_back_on_multimodal():
    """The driver's per-launch mass guard keeps the crop for blob maps and
    falls back to full-map sampling for multimodal chunks."""
    from globalegomocap_tpu.config import (
        OptimizeConfig, SolverConfig, PriorConfig)
    from globalegomocap_tpu.data.synthetic import synthetic_chunk
    from globalegomocap_tpu.optimize.driver import (
        SequenceOptimizer, build_model)

    cfg = OptimizeConfig(
        prior=PriorConfig(latent_dim=16, seq_len=10,
                          hidden_dims=(8, 8, 16, 16, 32)),
        solver=SolverConfig(max_iter=2, history_size=2),
        heatmap_crop=16)  # heatmap_crop_min_mass defaults to 0.90
    model = build_model(cfg)
    v = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 10, 45)), False)
    opt = SequenceOptimizer(model, v, v, cfg)

    chunk = synthetic_chunk(n_frames=26, seed=3)
    assert opt._effective_cfg(chunk.heatmaps).heatmap_crop == 16

    # graft a second mode onto every map -> fallback to full maps
    bim = chunk.heatmaps + np.roll(chunk.heatmaps, 32, axis=1)
    assert opt._effective_cfg(bim).heatmap_crop == 0

    # guard disabled -> crop kept regardless
    from globalegomocap_tpu.config import with_overrides
    opt2 = SequenceOptimizer(model, v, v,
                             with_overrides(cfg, heatmap_crop_min_mass=0.0))
    assert opt2._effective_cfg(bim).heatmap_crop == 16


def test_heatmap_crop_in_pipeline():
    """cfg.heatmap_crop preserves solution quality end-to-end."""
    from globalegomocap_tpu.config import (
        OptimizeConfig, SolverConfig, PriorConfig)
    from globalegomocap_tpu.data.synthetic import synthetic_chunk
    from globalegomocap_tpu.optimize.driver import (
        SequenceOptimizer, build_model)

    prior = PriorConfig(latent_dim=16, seq_len=10,
                        hidden_dims=(8, 8, 16, 16, 32))
    solver = SolverConfig(method="lbfgs_fixed", max_iter=3, history_size=3)
    cfg0 = OptimizeConfig(prior=prior, solver=solver)
    cfg1 = OptimizeConfig(prior=prior, solver=solver, heatmap_crop=16)

    model = build_model(cfg0)
    v = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 10, 45)), False)
    chunk = synthetic_chunk(n_frames=26, seed=3)
    r0 = SequenceOptimizer(model, v, v, cfg0).optimize_chunk(chunk)
    r1 = SequenceOptimizer(model, v, v, cfg1).optimize_chunk(chunk)

    def quality(r, field):
        return float(np.linalg.norm(
            np.asarray(getattr(r, field)) - np.asarray(r.gt),
            axis=-1).mean())
    assert quality(r1, "optimized") <= quality(r0, "optimized") * 1.05 + 1e-3
    assert quality(r1, "mid") <= quality(r0, "mid") * 1.05 + 1e-3


def test_channels_last_crop_matches_transposed():
    """crop_heatmaps_channels_last on (..., H, W, J) storage layout must
    produce exactly the crops/origins of crop_heatmaps on the transposed
    (..., J, H, W) maps — it exists so the pipeline can crop the raw
    per-frame maps BEFORE windowing (window-independent; kills the
    full-map windowing+transpose launch cost, fixed_cost_probe.json)."""
    import jax.numpy as jnp
    from globalegomocap_tpu.energy.terms import crop_heatmaps_channels_last
    rng = np.random.default_rng(7)
    maps_cl = jnp.asarray(rng.random((4, 64, 64, 15), dtype=np.float32))
    crops_cl, org_cl, hw_cl = crop_heatmaps_channels_last(maps_cl, 16)
    crops_t, org_t, hw_t = crop_heatmaps(jnp.moveaxis(maps_cl, -1, -3), 16)
    assert hw_cl == hw_t == (64, 64)
    np.testing.assert_array_equal(np.asarray(jnp.moveaxis(crops_cl, -1, -3)),
                                  np.asarray(crops_t))
    np.testing.assert_array_equal(np.asarray(org_cl), np.asarray(org_t))


def test_channels_last_crop_peak_at_border():
    """Border peaks: the clip keeps the k x k crop inside the map in the
    channels-last variant too."""
    import jax.numpy as jnp
    from globalegomocap_tpu.energy.terms import crop_heatmaps_channels_last
    maps = np.zeros((1, 32, 32, 2), dtype=np.float32)
    maps[0, 0, 0, 0] = 1.0     # corner peak, joint 0
    maps[0, 31, 31, 1] = 1.0   # opposite corner, joint 1
    crops, org, _ = crop_heatmaps_channels_last(jnp.asarray(maps), 8)
    assert crops.shape == (1, 8, 8, 2)
    np.testing.assert_array_equal(np.asarray(org[0, 0]), [0.0, 0.0])
    np.testing.assert_array_equal(np.asarray(org[0, 1]), [24.0, 24.0])
    assert float(crops[0, 0, 0, 0]) == 1.0
    assert float(crops[0, 7, 7, 1]) == 1.0


def test_staged_guard_fallback_stages_full_maps():
    """When the mass guard trips, stage() must NOT pre-crop: the staged
    batch carries the full maps (origins None) and the solve runs the
    exact full-map path — equal to an explicit crop=0 config."""
    from globalegomocap_tpu.config import (
        OptimizeConfig, SolverConfig, PriorConfig, with_overrides)
    from globalegomocap_tpu.data.synthetic import synthetic_chunk
    from globalegomocap_tpu.data.test_data import TestChunk
    from globalegomocap_tpu.optimize.driver import (
        SequenceOptimizer, build_model)

    cfg = OptimizeConfig(
        prior=PriorConfig(latent_dim=16, seq_len=10,
                          hidden_dims=(8, 8, 16, 16, 32)),
        solver=SolverConfig(method="lbfgs_fixed", max_iter=2,
                            history_size=2),
        # this test checks STAGING semantics (no pre-crop on guard), so
        # the guard's solver-tier switch (iter>=15/m>=10/K4, which would
        # make the fallback arm differ from the explicit crop=0 arm by
        # design) is opted out; the tier itself is covered by
        # test_robustness.test_crop_guard_switches_to_robust_tier
        robust_tier_on_guard=False,
        heatmap_crop=8)
    model = build_model(cfg)
    v = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 10, 45)), False)
    opt = SequenceOptimizer(model, v, v, cfg)

    def bimodal(chunk):
        maps = np.asarray(chunk.heatmaps)
        return chunk._replace(heatmaps=maps + np.roll(maps, 32, axis=1))

    chunks = [bimodal(synthetic_chunk(n_frames=26, seed=s))
              for s in (71, 72)]
    staged = opt.stage(chunks)
    assert staged.origins is None and staged.full_hw is None
    assert staged.heat.shape[-3:-1] == (64, 64)   # full maps staged
    assert staged.crop_coverage is not None \
        and staged.crop_coverage < cfg.heatmap_crop_min_mass

    res = opt.optimize_chunks_batched(staged, mode="flat")
    opt0 = SequenceOptimizer(model, v, v,
                             with_overrides(cfg, heatmap_crop=0))
    res0 = opt0.optimize_chunks_batched(opt0.stage(chunks), mode="flat")
    np.testing.assert_allclose(np.asarray(res.optimized),
                               np.asarray(res0.optimized),
                               rtol=1e-5, atol=1e-6)


def test_crop_impl_equivalence():
    """'flat' and 'onehot' extraction formulations are BIT-exact vs the
    chained-gather original, for both peak- and estimate-centered crops
    (they read the same values at the same indices; the one-hot products
    select exactly one element per output)."""
    from globalegomocap_tpu.energy.terms import (
        crop_heatmaps_at_centers_channels_last,
        crop_heatmaps_channels_last)
    rng = np.random.default_rng(7)
    maps = jnp.asarray(rng.random((6, 16, 16, 5), dtype=np.float32))
    ref_c, ref_o, _ = crop_heatmaps_channels_last(maps, 8, impl="gather")
    for impl in ("flat", "onehot"):
        c, o, _ = crop_heatmaps_channels_last(maps, 8, impl=impl)
        np.testing.assert_array_equal(np.asarray(c), np.asarray(ref_c))
        np.testing.assert_array_equal(np.asarray(o), np.asarray(ref_o))
    # estimate-centered variant, out-of-range centers clamp identically
    centers = jnp.asarray(rng.uniform(-3, 19, size=(6, 5, 2)),
                          dtype=jnp.float32)
    ref_c, ref_o, _ = crop_heatmaps_at_centers_channels_last(
        maps, 8, centers, impl="gather")
    for impl in ("flat", "onehot"):
        c, o, _ = crop_heatmaps_at_centers_channels_last(
            maps, 8, centers, impl=impl)
        np.testing.assert_array_equal(np.asarray(c), np.asarray(ref_c))
        np.testing.assert_array_equal(np.asarray(o), np.asarray(ref_o))


def test_stage_crop_impl_config_equivalence():
    """SequenceOptimizer.stage with stage_crop_impl='flat'/'onehot'
    stages bit-identical batches to the default gather path."""
    from globalegomocap_tpu.config import (OptimizeConfig, PriorConfig,
                                           with_overrides)
    from globalegomocap_tpu.data.synthetic import synthetic_chunk
    from globalegomocap_tpu.data.test_data import TestChunk
    from globalegomocap_tpu.models.conv_vae import ConvVAE
    from globalegomocap_tpu.optimize.driver import SequenceOptimizer

    cfg = OptimizeConfig(prior=PriorConfig(latent_dim=16, seq_len=10,
                                           hidden_dims=(8, 8, 16, 16, 32)),
                         heatmap_crop=8)
    model = ConvVAE(latent_dim=16, seq_len=10,
                    hidden_dims=(8, 8, 16, 16, 32))
    v = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 10, 45)), False)
    chunks = [TestChunk(*synthetic_chunk(26, seed=i)) for i in range(2)]
    ref = SequenceOptimizer(model, v, v, cfg).stage(chunks)
    for impl in ("flat", "onehot"):
        st = SequenceOptimizer(
            model, v, v,
            with_overrides(cfg, stage_crop_impl=impl)).stage(chunks)
        np.testing.assert_array_equal(np.asarray(st.heat),
                                      np.asarray(ref.heat))
        np.testing.assert_array_equal(np.asarray(st.origins),
                                      np.asarray(ref.origins))


def test_stage_bf16_cast_at_staging():
    """heatmap_dtype='bfloat16' stores staged heat in bf16 AT STAGING,
    bit-identical to casting the f32-staged crops (extraction is a pure
    selection, so extract(cast(map)) == cast(extract(map))); origins
    (argmax) stay those of the f32 maps.  Device and host staging paths
    agree."""
    import ml_dtypes
    from globalegomocap_tpu.config import (OptimizeConfig, PriorConfig,
                                           with_overrides)
    from globalegomocap_tpu.data.synthetic import synthetic_chunk
    from globalegomocap_tpu.data.test_data import TestChunk
    from globalegomocap_tpu.models.conv_vae import ConvVAE
    from globalegomocap_tpu.optimize.driver import SequenceOptimizer

    cfg = OptimizeConfig(prior=PriorConfig(latent_dim=16, seq_len=10,
                                           hidden_dims=(8, 8, 16, 16, 32)),
                         heatmap_crop=8)
    model = ConvVAE(latent_dim=16, seq_len=10,
                    hidden_dims=(8, 8, 16, 16, 32))
    v = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 10, 45)), False)
    chunks = [TestChunk(*synthetic_chunk(26, seed=i)) for i in range(2)]
    f32 = SequenceOptimizer(model, v, v, cfg).stage(chunks)
    cfg16 = with_overrides(cfg, heatmap_dtype="bfloat16")
    st = SequenceOptimizer(model, v, v, cfg16).stage(chunks)
    assert st.heat.dtype == jnp.bfloat16
    np.testing.assert_array_equal(
        np.asarray(st.heat).astype(np.float32),
        np.asarray(f32.heat).astype(ml_dtypes.bfloat16)
        .astype(np.float32))
    np.testing.assert_array_equal(np.asarray(st.origins),
                                  np.asarray(f32.origins))
    host = SequenceOptimizer(model, v, v, cfg16).stage(chunks,
                                                       on_host=True)
    assert host.heat.dtype == jnp.bfloat16
    np.testing.assert_array_equal(
        np.asarray(host.heat).astype(np.float32),
        np.asarray(st.heat).astype(np.float32))
    np.testing.assert_array_equal(np.asarray(host.origins),
                                  np.asarray(st.origins))
