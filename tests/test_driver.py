"""Sequence-directory driver tests: the reference's batch CLI behaviour
(natural-sorted chunk dirs, per-chunk metrics, averages)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from globalegomocap_tpu.config import (
    OptimizeConfig, SolverConfig, PriorConfig)
from globalegomocap_tpu.data.synthetic import synthetic_chunk
from globalegomocap_tpu.data.test_data import (
    save_test_chunk, list_chunk_dirs)
from globalegomocap_tpu.optimize.driver import (
    SequenceOptimizer, build_model, optimize_sequence_dir)


@pytest.fixture(scope="module")
def seq_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("seq")
    # deliberately unsorted names to exercise natural sorting
    for start in (200, 30, 100):
        chunk = synthetic_chunk(n_frames=30, seed=start)
        save_test_chunk(chunk, str(d / f"data_start_{start}_end_{start+30}"))
    return str(d)


@pytest.fixture(scope="module")
def optimizer():
    cfg = OptimizeConfig(
        prior=PriorConfig(latent_dim=32, seq_len=10,
                          hidden_dims=(8, 8, 16, 16, 32)),
        solver=SolverConfig(max_iter=4, history_size=4, max_ls_evals=4))
    model = build_model(cfg)
    x = jnp.zeros((1, 10, 45))
    v = model.init(jax.random.PRNGKey(0), x, False)
    return SequenceOptimizer(model, v, v, cfg)


def test_natural_sort(seq_dir):
    dirs = list_chunk_dirs(seq_dir)
    names = [d.split("data_start_")[1] for d in dirs]
    assert names == ["30_end_60", "100_end_130", "200_end_230"]


def test_batched_multi_chunk_sharded_nondivisible(optimizer):
    """One launch over SEVEN equal-length chunks on the 8-device CPU mesh:
    the chunk axis is edge-padded to the device multiple, sharded, and the
    padding sliced off — results must equal per-chunk calls (sharding never
    silently degrades on non-divisible chunk counts)."""
    from globalegomocap_tpu.data.synthetic import synthetic_chunk
    assert len(jax.devices()) == 8  # conftest forces the 8-device mesh
    chunks = [synthetic_chunk(n_frames=26, seed=s) for s in range(7)]
    batched = optimizer.optimize_chunks_batched(chunks)
    # 26 frames -> windows at 0/8/16, covered = 16 + 10 = 26
    assert batched.optimized.shape == (7, 26, 15, 3)
    for i, c in enumerate(chunks):
        single = optimizer.optimize_chunk(c)
        np.testing.assert_allclose(np.asarray(batched.optimized[i]),
                                   np.asarray(single.optimized),
                                   rtol=1e-4, atol=1e-5)


def test_flat_multi_chunk_matches_per_chunk(optimizer):
    """The flat (concatenated window batch) mode must produce the same
    results as per-chunk optimization — the window problems are identical,
    only the launch granularity differs (solver trajectories coincide
    because the fixed solver's control flow is per-lane).  C=3 on the
    8-device mesh also exercises the pad-to-multiple sharding of the
    fastest mode."""
    from globalegomocap_tpu.data.synthetic import synthetic_chunk
    chunks = [synthetic_chunk(n_frames=26, seed=s) for s in (21, 22, 23)]
    flat = optimizer.optimize_chunks_batched(chunks, mode="flat")
    assert flat.optimized.shape == (3, 26, 15, 3)
    for i, c in enumerate(chunks):
        single = optimizer.optimize_chunk(c)
        np.testing.assert_allclose(np.asarray(flat.optimized[i]),
                                   np.asarray(single.optimized),
                                   rtol=1e-4, atol=1e-5)


def test_optimize_sequence_dir(seq_dir, optimizer, capsys):
    errors, averages, timing = optimize_sequence_dir(optimizer, seq_dir)
    assert len(errors) == 3
    assert set(averages) == set(errors[0])
    assert timing["total_s"] > 0
    out = capsys.readouterr().out
    assert "Average optimized global pose mpjpe" in out
    assert "joints error" in out
    # averages really are means over chunks
    k = "original_global_mpjpe"
    np.testing.assert_allclose(averages[k],
                               np.mean([e[k] for e in errors]), rtol=1e-6)


def test_staged_batch_matches_list_path(optimizer):
    """stage() + optimize_chunks_batched(StagedBatch) — the zero-overhead
    serving path — must be bit-identical to passing the chunk list, at a
    non-divisible chunk count (C=3 on the 8-device mesh) in both modes.
    The staged object resolves the crop-guard coverage at staging time."""
    from globalegomocap_tpu.data.synthetic import synthetic_chunk
    chunks = [synthetic_chunk(n_frames=26, seed=s) for s in (31, 32, 33)]
    staged = optimizer.stage(chunks)
    assert staged.n_chunks == 3
    # guard inapplicable at crop=0 default config -> coverage None
    assert staged.crop_coverage is None or 0.0 <= staged.crop_coverage <= 1.0
    for mode in ("flat", "vmap"):
        via_list = optimizer.optimize_chunks_batched(chunks, mode=mode)
        via_staged = optimizer.optimize_chunks_batched(staged, mode=mode)
        assert via_staged.optimized.shape == (3, 26, 15, 3)
        np.testing.assert_array_equal(np.asarray(via_list.optimized),
                                      np.asarray(via_staged.optimized))


def test_staged_precrop_matches_in_program_crop():
    """With heatmap_crop on, stage() extracts the peak crops at staging
    time (the program never sees the full maps); results must match the
    list path, whose crops are extracted inside the program, in both
    modes — crop extraction is window- and solver-independent."""
    from globalegomocap_tpu.data.synthetic import synthetic_chunk
    cfg = OptimizeConfig(
        prior=PriorConfig(latent_dim=32, seq_len=10,
                          hidden_dims=(8, 8, 16, 16, 32)),
        solver=SolverConfig(method="lbfgs_fixed", max_iter=3,
                            history_size=3),
        heatmap_crop=8)
    model = build_model(cfg)
    x = jnp.zeros((1, 10, 45))
    v = model.init(jax.random.PRNGKey(0), x, False)
    opt = SequenceOptimizer(model, v, v, cfg)
    chunks = [synthetic_chunk(n_frames=26, seed=s) for s in (41, 42, 43)]
    staged = opt.stage(chunks)
    assert staged.origins is not None          # precrop actually happened
    # crops are staged FLAT (C, F, k*k*J) — the 5-D stacked layout padded
    # staging temps 128x (see StagedBatch/_unflatten_staged_crops)
    assert staged.heat.ndim == 3
    assert staged.heat.shape[-1] == 8 * 8 * chunks[0].heatmaps.shape[-1]
    assert staged.full_hw == chunks[0].heatmaps.shape[1:3]
    for mode in ("flat", "vmap"):
        via_list = opt.optimize_chunks_batched(chunks, mode=mode)
        via_staged = opt.optimize_chunks_batched(staged, mode=mode)
        np.testing.assert_allclose(np.asarray(via_list.optimized),
                                   np.asarray(via_staged.optimized),
                                   rtol=1e-5, atol=1e-6)


def test_host_staging_matches_device_staging():
    """stage(on_host=True) — numpy crop BEFORE the host->device transfer,
    the host-ingest serving path — must produce a StagedBatch bit-equal
    to device staging (the crop is a pure gather with matching argmax
    tie-breaking), including the flat crop contract, origins, the
    device-count padding, and the crop-guard coverage decision."""
    from globalegomocap_tpu.data.synthetic import synthetic_chunk
    cfg = OptimizeConfig(
        prior=PriorConfig(latent_dim=32, seq_len=10,
                          hidden_dims=(8, 8, 16, 16, 32)),
        solver=SolverConfig(method="lbfgs_fixed", max_iter=3,
                            history_size=3),
        heatmap_crop=8)
    model = build_model(cfg)
    v = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 10, 45)), False)
    opt = SequenceOptimizer(model, v, v, cfg)
    chunks = [synthetic_chunk(n_frames=26, seed=s) for s in (61, 62, 63)]
    dev = opt.stage(chunks)
    host = opt.stage(chunks, on_host=True)
    assert host.n_chunks == dev.n_chunks
    assert host.full_hw == dev.full_hw
    assert abs(host.crop_coverage - dev.crop_coverage) < 1e-5
    for f in ("est", "cams", "heat", "gt", "origins"):
        np.testing.assert_array_equal(np.asarray(getattr(host, f)),
                                      np.asarray(getattr(dev, f)),
                                      err_msg=f)
    # solves through the host-staged batch match the device-staged ones
    a = opt.optimize_chunks_batched(dev, mode="flat")
    b = opt.optimize_chunks_batched(host, mode="flat")
    np.testing.assert_array_equal(np.asarray(a.optimized),
                                  np.asarray(b.optimized))

    # injected coverage below the guard threshold -> full maps staged,
    # identically on both paths
    from dataclasses import replace
    g = SequenceOptimizer(model, v, v,
                          replace(cfg, heatmap_crop_min_mass=0.9))
    dev_g = g.stage(chunks, coverage=0.1)
    host_g = g.stage(chunks, coverage=0.1, on_host=True)
    assert host_g.origins is None and dev_g.origins is None
    np.testing.assert_array_equal(np.asarray(host_g.heat),
                                  np.asarray(dev_g.heat))


def test_segmented_staging_matches_single_program():
    """Above cfg.stage_segment_chunks, stage() runs the staging program
    per segment and concatenates the staged outputs — required because a
    single program takes one FULL-map argument per chunk and the AOT
    compiler accounts arguments without aliasing (640 chunks = 18.75G
    'arguments', heat_ceiling_probe.json).  Must be bit-exact vs the
    single-program path, including crop origins, the guard coverage, and
    the solve through it; exercised at a segment size that leaves a
    partial tail segment."""
    from dataclasses import replace
    cfg = OptimizeConfig(
        prior=PriorConfig(latent_dim=32, seq_len=10,
                          hidden_dims=(8, 8, 16, 16, 32)),
        solver=SolverConfig(method="lbfgs_fixed", max_iter=3,
                            history_size=3),
        heatmap_crop=8)
    model = build_model(cfg)
    x = jnp.zeros((1, 10, 45))
    v = model.init(jax.random.PRNGKey(0), x, False)
    chunks = [synthetic_chunk(n_frames=26, seed=s) for s in range(70, 75)]
    single = SequenceOptimizer(model, v, v, cfg).stage(chunks)
    seg = SequenceOptimizer(
        model, v, v, replace(cfg, stage_segment_chunks=2)).stage(chunks)
    assert seg.n_chunks == single.n_chunks == 5
    assert seg.full_hw == single.full_hw
    assert abs(seg.crop_coverage - single.crop_coverage) < 1e-6
    for f in ("est", "cams", "heat", "gt", "origins"):
        np.testing.assert_array_equal(np.asarray(getattr(seg, f)),
                                      np.asarray(getattr(single, f)),
                                      err_msg=f)
    opt = SequenceOptimizer(model, v, v, cfg)
    a = opt.optimize_chunks_batched(single, mode="flat")
    b = opt.optimize_chunks_batched(seg, mode="flat")
    np.testing.assert_array_equal(np.asarray(a.optimized),
                                  np.asarray(b.optimized))


def test_fused_shard_map_matches_per_chunk():
    """With fused_energy on and >1 device, optimize_chunks_batched keeps
    the Pallas mega-kernel by running the whole pipeline per-shard under
    shard_map (the SPMD partitioner cannot split the opaque custom call;
    chunks are data-independent so no collectives are needed).  Results
    must match per-chunk single-launch fused solves, at a non-divisible
    chunk count (C=3 padded to the 8-device mesh)."""
    from globalegomocap_tpu.data.synthetic import synthetic_chunk
    assert len(jax.devices()) == 8
    cfg = OptimizeConfig(
        prior=PriorConfig(latent_dim=16, seq_len=10,
                          hidden_dims=(8, 8, 16, 16, 32)),
        solver=SolverConfig(method="lbfgs_fixed", max_iter=3,
                            history_size=3, fused_probes=True,
                            step_candidates=(1.0, 0.1),
                            fused_energy=True),
        sampling_impl="dense", heatmap_crop=8, fold_bn=True,
        dense_decoder=True, decoder_impl="shift")
    model = build_model(cfg)
    v = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 10, 45)), False)
    opt = SequenceOptimizer(model, v, v, cfg)
    chunks = [synthetic_chunk(n_frames=26, seed=s) for s in (51, 52, 53)]
    staged = opt.stage(chunks)
    flat = opt.optimize_chunks_batched(staged, mode="flat")
    assert flat.optimized.shape == (3, 26, 15, 3)
    for i, c in enumerate(chunks):
        single = opt.optimize_chunk(c)
        np.testing.assert_allclose(np.asarray(flat.optimized[i]),
                                   np.asarray(single.optimized),
                                   rtol=1e-4, atol=1e-5)


def test_sequence_dir_batched_matches_serial(seq_dir, optimizer, capsys):
    """optimize_sequence_dir(batched=True) — one staged flat launch for
    the whole directory — must reproduce the serial per-chunk loop's
    metrics (equal-length chunks here, so no fallback)."""
    errors_s, avg_s, _ = optimize_sequence_dir(optimizer, seq_dir,
                                               verbose=False)
    errors_b, avg_b, timing_b = optimize_sequence_dir(
        optimizer, seq_dir, verbose=False, batched=True)
    assert len(errors_b) == len(errors_s) == 3
    assert timing_b["failed_chunks"] == []
    for k in avg_s:
        np.testing.assert_allclose(np.asarray(avg_b[k]),
                                   np.asarray(avg_s[k]),
                                   rtol=2e-3, atol=1e-5)


def test_stage_input_validation(optimizer):
    """stage() rejects empty and mixed-length chunk lists with clear
    errors instead of cryptic stack failures."""
    from globalegomocap_tpu.data.synthetic import synthetic_chunk
    with pytest.raises(ValueError, match="at least one"):
        optimizer.stage([])
    mixed = [synthetic_chunk(26, seed=1), synthetic_chunk(34, seed=2)]
    with pytest.raises(ValueError, match="equal-length"):
        optimizer.stage(mixed)
