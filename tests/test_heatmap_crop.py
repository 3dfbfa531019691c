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
                       * 0.3 + np.array([0, 0, -1.5], np.float32))

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
                       * 0.3 + np.array([0, 0, -1.5], np.float32))
    crops, origins, full_hw = crop_heatmaps(maps, 16)
    a = float(heatmap_energy(pose, crops, cam, impl="gather",
                             origins=origins, full_hw=full_hw))
    b = float(heatmap_energy(pose, crops, cam, impl="dense",
                             origins=origins, full_hw=full_hw))
    np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-5)


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
