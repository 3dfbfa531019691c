"""Fused post-decode energy mega-kernel (ops/pallas/fused_energy.py):
value and analytic gradient must match the XLA energy path exactly, and
the explicitly-batched solver must reproduce the vmapped fixed solver."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from globalegomocap_tpu.energy.terms import (
    EnergyWeights, total_energy_from_pose)
from globalegomocap_tpu.ops import fisheye
from globalegomocap_tpu.ops.pallas.fused_energy import fused_stage_energy

T, J, K = 10, 15, 8
L = T * J
FULL_HW = (64, 64)


def _random_inputs(b, seed=0):
    rng = np.random.default_rng(seed)
    # poses near the synthetic skeleton's depth range so projections land
    # on-map
    pose = rng.normal(scale=0.3, size=(b, T, J, 3)) + np.array([0, 0, 1.5])
    anchor = pose + rng.normal(scale=0.05, size=pose.shape)
    crops = rng.uniform(size=(b, T, J, K, K)).astype(np.float32)
    origins = rng.integers(0, 56, size=(b, T, J, 2)).astype(np.float32)
    bone = rng.uniform(0.1, 0.5, size=(b, J)).astype(np.float32)
    return (jnp.asarray(pose, jnp.float32),
            jnp.asarray(anchor, jnp.float32),
            jnp.asarray(crops), jnp.asarray(origins), jnp.asarray(bone))


def _to_kernel_layout(pose, anchor, crops, origins, bone):
    b = pose.shape[0]
    pose_rt = jnp.moveaxis(pose.reshape(b, L, 3), -1, 1)[None]
    anchor_t = jnp.moveaxis(anchor.reshape(b, L, 3), -1, 1)
    crops_cm = jnp.swapaxes(crops.reshape(b, L, K * K), 1, 2)
    ox = origins[..., 1].reshape(b, L)
    oy = origins[..., 0].reshape(b, L)
    bone_t = jnp.tile(bone, (1, T))
    return pose_rt, anchor_t, crops_cm, ox, oy, bone_t


def _ctx(camera, w):
    wvec = jnp.stack([w.weight_3d, w.smooth, w.bone_length, w.vae,
                      w.reproj, camera.center[0], camera.center[1],
                      jnp.asarray(0.0, jnp.float32)])[None]
    return (wvec.astype(jnp.float32),
            camera.poly_w2c[None].astype(jnp.float32))


def _xla_energies(pose, anchor, crops, origins, bone, camera, w):
    return jax.vmap(
        lambda p, a, h, b_, o: total_energy_from_pose(
            p, a, b_, h, camera, w, True, sampling_impl="dense",
            origins=o, full_hw=FULL_HW))(pose, anchor, crops, bone,
                                         origins)


@pytest.mark.parametrize("b", [4, 7])
def test_fused_energy_matches_xla(b):
    camera = fisheye.default_camera("egosyn")
    w = EnergyWeights.create(weight_3d=0.01, smooth=0.001,
                             bone_length=0.02, vae=0.003, reproj=0.01)
    pose, anchor, crops, origins, bone = _random_inputs(b, seed=1)
    layout = _to_kernel_layout(pose, anchor, crops, origins, bone)
    e_kernel = fused_stage_energy(*layout, _ctx(camera, w), T, J, K,
                                  FULL_HW, 128.0, 512.0)
    e_xla = _xla_energies(pose, anchor, crops, origins, bone, camera, w)
    np.testing.assert_allclose(np.asarray(e_kernel[0]), np.asarray(e_xla),
                               rtol=2e-5, atol=1e-5)


def test_fused_energy_matches_xla_guard_crop_k16():
    """The guard-trip fast path (OptimizeConfig.guard_crop) runs k=16
    estimate-centered crops through this same kernel (the window block
    adapts to the k^2 VMEM cost): value must still match XLA."""
    k, b = 16, 4
    rng = np.random.default_rng(5)
    pose = rng.normal(scale=0.3, size=(b, T, J, 3)) + np.array([0, 0, 1.5])
    anchor = pose + rng.normal(scale=0.05, size=pose.shape)
    crops = jnp.asarray(rng.uniform(size=(b, T, J, k, k)), jnp.float32)
    origins = jnp.asarray(rng.integers(0, 48, size=(b, T, J, 2)),
                          jnp.float32)
    bone = jnp.asarray(rng.uniform(0.1, 0.5, size=(b, J)), jnp.float32)
    pose = jnp.asarray(pose, jnp.float32)
    anchor = jnp.asarray(anchor, jnp.float32)
    pose_rt = jnp.moveaxis(pose.reshape(b, L, 3), -1, 1)[None]
    anchor_t = jnp.moveaxis(anchor.reshape(b, L, 3), -1, 1)
    crops_cm = jnp.swapaxes(crops.reshape(b, L, k * k), 1, 2)
    ox = origins[..., 1].reshape(b, L)
    oy = origins[..., 0].reshape(b, L)
    bone_t = jnp.tile(bone, (1, T))
    camera = fisheye.default_camera("egosyn")
    w = EnergyWeights.create(weight_3d=0.01, smooth=0.001,
                             bone_length=0.02, vae=0.003, reproj=0.01)
    e_kernel = fused_stage_energy(pose_rt, anchor_t, crops_cm, ox, oy,
                                  bone_t, _ctx(camera, w), T, J, k,
                                  FULL_HW, 128.0, 512.0)
    e_xla = _xla_energies(pose, anchor, crops, origins, bone, camera, w)
    np.testing.assert_allclose(np.asarray(e_kernel[0]), np.asarray(e_xla),
                               rtol=2e-5, atol=1e-5)


def test_fused_energy_bf16_crops():
    """bf16 crop blocks (cfg.heatmap_dtype='bfloat16'): the kernel
    converts each crop block to f32 in-kernel — value and gradient must
    match the f32-crop kernel to bf16 rounding of the crop VALUES only
    (the projection/pose math stays f32)."""
    camera = fisheye.default_camera("egosyn")
    w = EnergyWeights.create(weight_3d=0.01, smooth=0.001,
                             bone_length=0.02, vae=0.003, reproj=0.01)
    pose, anchor, crops, origins, bone = _random_inputs(6, seed=7)
    layout = _to_kernel_layout(pose, anchor, crops, origins, bone)
    lay16 = (layout[0], layout[1], layout[2].astype(jnp.bfloat16),
             *layout[3:])

    def vg(lay):
        def s(pose_rt):
            return jnp.sum(fused_stage_energy(
                pose_rt, *lay[1:], _ctx(camera, w), T, J, K, FULL_HW,
                128.0, 512.0))
        return jax.value_and_grad(s)(lay[0])

    e32, g32 = vg(layout)
    e16, g16 = vg(lay16)
    assert e16.dtype == jnp.float32 and g16.dtype == jnp.float32
    # reproj term reads ~L bf16-rounded heat values per window (each
    # |err| <= 2^-9 relative); pose-space terms are bitwise-unaffected
    np.testing.assert_allclose(np.asarray(e16), np.asarray(e32),
                               rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(np.asarray(g16), np.asarray(g32),
                               rtol=2e-2, atol=2e-4)


def test_pipeline_fused_bf16_heat_end_to_end():
    """The fused production path with heatmap_dtype='bfloat16' (staged
    crops stream at half width) reaches the same solution quality as the
    f32-heat fused path."""
    from dataclasses import replace
    from globalegomocap_tpu.config import (
        OptimizeConfig, PriorConfig, SolverConfig)
    from globalegomocap_tpu.data.synthetic import synthetic_chunk
    from globalegomocap_tpu.optimize.driver import (
        SequenceOptimizer, build_model)

    base = OptimizeConfig(
        prior=PriorConfig(latent_dim=16, seq_len=10,
                          hidden_dims=(8, 8, 16, 16, 32)),
        solver=SolverConfig(method="lbfgs_fixed", max_iter=6,
                            history_size=3, fused_probes=True,
                            step_candidates=(1.0, 0.1),
                            fused_energy=True),
        sampling_impl="dense", heatmap_crop=8, fold_bn=True,
        dense_decoder=True, decoder_impl="conv")
    bf16 = replace(base, heatmap_dtype="bfloat16")
    model = build_model(base)
    v = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 10, 45)), False)
    chunks = [synthetic_chunk(26, seed=21)]

    res = {}
    for name, cfg in (("f32", base), ("bf16", bf16)):
        opt = SequenceOptimizer(model, v, v, cfg)
        staged = opt.stage(chunks)
        res[name] = opt.optimize_chunks_batched(staged, mode="flat")
    b_opt = np.asarray(res["bf16"].optimized)
    assert np.isfinite(b_opt).all()
    gt = np.asarray(res["f32"].gt)

    def quality(r):
        return float(np.linalg.norm(
            np.asarray(r.optimized) - gt, axis=-1).mean())

    qa, qb = quality(res["f32"]), quality(res["bf16"])
    assert abs(qa - qb) < 0.05 * max(qa, 1e-6), (qa, qb)


def test_fused_energy_grad_matches_xla():
    camera = fisheye.default_camera("egosyn")
    w = EnergyWeights.create(weight_3d=0.01, smooth=0.001,
                             bone_length=0.02, vae=0.003, reproj=0.01)
    pose, anchor, crops, origins, bone = _random_inputs(5, seed=2)
    layout = _to_kernel_layout(pose, anchor, crops, origins, bone)

    def kernel_sum(pose_rt):
        return jnp.sum(fused_stage_energy(
            pose_rt, *layout[1:], _ctx(camera, w), T, J, K, FULL_HW,
            128.0, 512.0))

    g_kernel = jax.grad(kernel_sum)(layout[0])       # (1, B, 3, L)
    g_pose = jnp.moveaxis(g_kernel[0], 1, -1).reshape(pose.shape)

    def xla_sum(p):
        return jnp.sum(_xla_energies(p, anchor, crops, origins, bone,
                                     camera, w))

    g_xla = jax.grad(xla_sum)(pose)
    np.testing.assert_allclose(np.asarray(g_pose), np.asarray(g_xla),
                               rtol=2e-4, atol=2e-6)


def test_fused_energy_probe_axis_reuses_context():
    """R>1 (line-search candidates): each probe row must be evaluated
    against the SAME per-window context."""
    camera = fisheye.default_camera("egosyn")
    w = EnergyWeights.create()
    pose, anchor, crops, origins, bone = _random_inputs(3, seed=3)
    pose2 = pose + 0.01
    layout1 = _to_kernel_layout(pose, anchor, crops, origins, bone)
    layout2 = _to_kernel_layout(pose2, anchor, crops, origins, bone)
    pose_r2 = jnp.concatenate([layout1[0], layout2[0]], axis=0)
    e2 = fused_stage_energy(pose_r2, *layout1[1:], _ctx(camera, w),
                            T, J, K, FULL_HW, 128.0, 512.0)
    e_a = fused_stage_energy(*layout1, _ctx(camera, w), T, J, K, FULL_HW,
                             128.0, 512.0)
    e_b = fused_stage_energy(*layout2, _ctx(camera, w), T, J, K, FULL_HW,
                             128.0, 512.0)
    np.testing.assert_allclose(np.asarray(e2[0]), np.asarray(e_a[0]),
                               rtol=1e-6)
    np.testing.assert_allclose(np.asarray(e2[1]), np.asarray(e_b[0]),
                               rtol=1e-6)


def test_batched_solver_matches_vmapped_fixed():
    """lbfgs_minimize_fixed_batched == vmap(lbfgs_minimize_fixed) row by
    row on a batch of random PSD quadratics."""
    from globalegomocap_tpu.optimize.lbfgs import (
        lbfgs_minimize_fixed, lbfgs_minimize_fixed_batched)
    rng = np.random.default_rng(4)
    b, d = 6, 12
    mats = []
    for _ in range(b):
        m = rng.normal(size=(d, d))
        mats.append(m @ m.T + d * np.eye(d))
    A = jnp.asarray(np.stack(mats), jnp.float32)
    rhs = jnp.asarray(rng.normal(size=(b, d)), jnp.float32)
    x0 = jnp.zeros((b, d), jnp.float32)

    def loss_row(a, bb, x):
        return 0.5 * x @ a @ x - bb @ x

    def vg_batch(x3):
        def f(x3_):
            return jax.vmap(jax.vmap(loss_row, in_axes=(0, 0, 0)),
                            in_axes=(None, None, 0))(A, rhs, x3_)
        vals, pull = jax.vjp(f, x3)
        (g,) = pull(jnp.ones_like(vals))
        return vals, g

    res_b = lbfgs_minimize_fixed_batched(vg_batch, x0, max_iter=12,
                                         history_size=5, lr=1.0,
                                         step_candidates=(1.0, 0.1))
    res_v = jax.vmap(
        lambda a, bb, x: lbfgs_minimize_fixed(
            lambda xx: loss_row(a, bb, xx), x, max_iter=12,
            history_size=5, lr=1.0, step_candidates=(1.0, 0.1),
            fused_probes=True))(A, rhs, x0)
    # identical math; tiny fp differences from batched-vs-vmapped
    # reduction order can steer late iterations on ill-conditioned rows
    np.testing.assert_allclose(np.asarray(res_b.x), np.asarray(res_v.x),
                               rtol=1e-3, atol=2e-4)
    np.testing.assert_allclose(np.asarray(res_b.f), np.asarray(res_v.f),
                               rtol=1e-4, atol=1e-6)


def test_pipeline_fused_energy_end_to_end():
    """optimize_chunk with solver.fused_energy=True matches the XLA path's
    result on a small chunk (same trajectory up to fp reassociation)."""
    from globalegomocap_tpu.config import (
        OptimizeConfig, PriorConfig, SolverConfig)
    from globalegomocap_tpu.data.synthetic import synthetic_chunk
    from globalegomocap_tpu.models.conv_vae import ConvVAE
    from globalegomocap_tpu.optimize.driver import (
        SequenceOptimizer, build_model)

    base = OptimizeConfig(
        prior=PriorConfig(latent_dim=16, seq_len=10,
                          hidden_dims=(8, 8, 16, 16, 32)),
        solver=SolverConfig(method="lbfgs_fixed", max_iter=6,
                            history_size=5, fused_probes=True,
                            step_candidates=(1.0, 0.1)),
        sampling_impl="dense", heatmap_crop=8, fold_bn=True,
        dense_decoder=True, decoder_impl="shift")
    from dataclasses import replace
    fused = replace(base, solver=replace(base.solver, fused_energy=True))
    model = build_model(base)
    v = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 10, 45)), False)
    chunk = synthetic_chunk(26, seed=11)

    res_a = SequenceOptimizer(model, v, v, base).optimize_chunk(chunk)
    res_b = SequenceOptimizer(model, v, v, fused).optimize_chunk(chunk)
    a_mid = np.asarray(res_a.mid_local)
    b_mid = np.asarray(res_b.mid_local)
    assert np.isfinite(b_mid).all()
    assert np.isfinite(np.asarray(res_b.optimized)).all()
    # The two paths compute the same math with different fp reduction
    # order; after several Armijo selections trajectories can branch, so
    # pose-wise equality is not the right check — equal solution QUALITY
    # is: both must denoise the input toward the true local pose to the
    # same degree.
    true_local = np.asarray(
        jnp.asarray(chunk.estimated_local))  # noisy input
    err_a = np.linalg.norm(a_mid - true_local[:a_mid.shape[0]],
                           axis=-1).mean()
    err_b = np.linalg.norm(b_mid - true_local[:b_mid.shape[0]],
                           axis=-1).mean()
    assert abs(err_a - err_b) < 0.05 * max(err_a, 1e-6), (err_a, err_b)


def test_pipeline_batched_solver_end_to_end():
    """solver.batched_solver=True (explicitly-batched solver + XLA
    energy, BOTH stages) reaches the same solution quality as the vmapped
    path."""
    from dataclasses import replace
    from globalegomocap_tpu.config import (
        OptimizeConfig, PriorConfig, SolverConfig)
    from globalegomocap_tpu.data.synthetic import synthetic_chunk
    from globalegomocap_tpu.optimize.driver import (
        SequenceOptimizer, build_model)

    base = OptimizeConfig(
        prior=PriorConfig(latent_dim=16, seq_len=10,
                          hidden_dims=(8, 8, 16, 16, 32)),
        solver=SolverConfig(method="lbfgs_fixed", max_iter=6,
                            history_size=5, fused_probes=True,
                            step_candidates=(1.0, 0.1)),
        sampling_impl="dense", heatmap_crop=8, fold_bn=True,
        dense_decoder=True, decoder_impl="shift")
    batched = replace(base,
                      solver=replace(base.solver, batched_solver=True))
    model = build_model(base)
    v = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 10, 45)), False)
    chunk = synthetic_chunk(26, seed=13)

    res_a = SequenceOptimizer(model, v, v, base).optimize_chunk(chunk)
    res_b = SequenceOptimizer(model, v, v, batched).optimize_chunk(chunk)
    assert np.isfinite(np.asarray(res_b.optimized)).all()
    true_local = np.asarray(jnp.asarray(chunk.estimated_local))

    def err(r):
        m = np.asarray(r.mid_local)
        return np.linalg.norm(m - true_local[:m.shape[0]], axis=-1).mean()

    assert abs(err(res_a) - err(res_b)) < 0.05 * max(err(res_a), 1e-6)


def _tiny_model_and_layers():
    from globalegomocap_tpu.models.conv_vae import ConvVAE
    from globalegomocap_tpu.models.fold_bn import fold_batchnorm
    model = ConvVAE(latent_dim=16, seq_len=10,
                    hidden_dims=(8, 8, 16, 16, 32))
    v = model.init(jax.random.PRNGKey(5), jnp.zeros((1, 10, 45)), False)
    fv = fold_batchnorm(v)
    prm = fv["params"]
    first_w = prm["decoder_input"]["kernel"].astype(jnp.float32)
    first_b = prm["decoder_input"]["bias"].astype(jnp.float32)
    names = [f"dec_{i}" for i in range(4)] + ["final_block", "final_conv"]
    layers = []
    for nme in names:
        node = prm[nme]["conv"] if "conv" in prm.get(nme, {}) else prm[nme]
        layers.append((node["kernel"], node["bias"]))
    return model, v, first_w, first_b, layers


def test_fused_decode_energy_matches_xla():
    """The FULL kernel (conv chain + energy) matches shift-decoder +
    XLA energy in value and z-gradient."""
    from globalegomocap_tpu.models.dense_decoder import make_shift_decoder
    from globalegomocap_tpu.ops.pallas.fused_decode_energy import (
        fused_decode_stage_energy)

    camera = fisheye.default_camera("egosyn")
    w = EnergyWeights.create(weight_3d=0.01, smooth=0.001,
                             bone_length=0.02, vae=0.003, reproj=0.01)
    model, v, first_w, first_b, layers = _tiny_model_and_layers()
    b = 5
    rng = np.random.default_rng(6)
    z = jnp.asarray(rng.normal(size=(b, 16)), jnp.float32)
    _, anchor, crops, origins, bone = _random_inputs(b, seed=7)
    layout = _to_kernel_layout(anchor, anchor, crops, origins, bone)
    _, anchor_t, crops_cm, ox, oy, bone_t = layout
    ctx = _ctx(camera, w)
    c0 = 32

    def kernel_e(z_):
        h0 = (z_ @ first_w + first_b).reshape(1, b, 10, c0)
        return jnp.sum(fused_decode_stage_energy(
            h0, layers, anchor_t, crops_cm, ox, oy, bone_t, ctx,
            T, J, K, FULL_HW, 128.0, 512.0))

    decode = make_shift_decoder(model, v)

    def xla_e(z_):
        pose = decode(z_).astype(jnp.float32)
        return jnp.sum(_xla_energies(pose, anchor, crops, origins, bone,
                                     camera, w))

    np.testing.assert_allclose(float(kernel_e(z)), float(xla_e(z)),
                               rtol=2e-5)
    g_k = jax.grad(kernel_e)(z)
    g_x = jax.grad(xla_e)(z)
    np.testing.assert_allclose(np.asarray(g_k), np.asarray(g_x),
                               rtol=5e-4, atol=1e-6)


def test_pipeline_fused_decode_end_to_end():
    """solver.fused_energy + fused_decode solves a chunk to the same
    quality as the XLA path."""
    from dataclasses import replace
    from globalegomocap_tpu.config import (
        OptimizeConfig, PriorConfig, SolverConfig)
    from globalegomocap_tpu.data.synthetic import synthetic_chunk
    from globalegomocap_tpu.optimize.driver import (
        SequenceOptimizer, build_model)

    base = OptimizeConfig(
        prior=PriorConfig(latent_dim=16, seq_len=10,
                          hidden_dims=(8, 8, 16, 16, 32)),
        solver=SolverConfig(method="lbfgs_fixed", max_iter=6,
                            history_size=5, fused_probes=True,
                            step_candidates=(1.0, 0.1)),
        sampling_impl="dense", heatmap_crop=8, fold_bn=True,
        dense_decoder=True, decoder_impl="shift")
    fused2 = replace(base, solver=replace(base.solver, fused_energy=True,
                                          fused_decode=True))
    model = build_model(base)
    v = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 10, 45)), False)
    chunk = synthetic_chunk(26, seed=17)

    res_a = SequenceOptimizer(model, v, v, base).optimize_chunk(chunk)
    res_b = SequenceOptimizer(model, v, v, fused2).optimize_chunk(chunk)
    assert np.isfinite(np.asarray(res_b.optimized)).all()
    true_local = np.asarray(jnp.asarray(chunk.estimated_local))

    def err(r):
        m = np.asarray(r.mid_local)
        return np.linalg.norm(m - true_local[:m.shape[0]], axis=-1).mean()

    assert abs(err(res_a) - err(res_b)) < 0.05 * max(err(res_a), 1e-6)


def test_noreproj_energy_and_grad_match_xla():
    """The no-reproj kernel (the global stage's energy: 3d/accel/bone/vae
    only, reference split optimizer.py:352-353) must match the XLA energy
    path in value AND gradient."""
    from globalegomocap_tpu.ops.pallas.fused_energy import (
        fused_stage_energy_noreproj)
    camera = fisheye.default_camera("egosyn")
    w = EnergyWeights.create(weight_3d=1.0, smooth=0.001,
                             bone_length=0.01, vae=0.002, reproj=0.0)
    pose, anchor, _, _, bone = _random_inputs(7, seed=4)
    pose_rt, anchor_t, _, _, _, bone_t = _to_kernel_layout(
        pose, anchor, jnp.zeros((7, T, J, K, K)),
        jnp.zeros((7, T, J, 2)), bone)
    wvec = _ctx(camera, w)[0]

    def kernel_sum(pr):
        return jnp.sum(fused_stage_energy_noreproj(
            pr, anchor_t, bone_t, wvec, T, J))

    e_kernel = fused_stage_energy_noreproj(pose_rt, anchor_t, bone_t,
                                           wvec, T, J)
    g_kernel = jax.grad(kernel_sum)(pose_rt)
    g_pose = jnp.moveaxis(g_kernel[0], 1, -1).reshape(pose.shape)

    def xla_sum(p):
        return jnp.sum(jax.vmap(
            lambda pp, a, b_: total_energy_from_pose(
                pp, a, b_, None, camera, w, False))(p, anchor, bone))

    e_xla = jax.vmap(
        lambda pp, a, b_: total_energy_from_pose(
            pp, a, b_, None, camera, w, False))(pose, anchor, bone)
    g_xla = jax.grad(xla_sum)(pose)
    np.testing.assert_allclose(np.asarray(e_kernel[0]), np.asarray(e_xla),
                               rtol=2e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(g_pose), np.asarray(g_xla),
                               rtol=2e-4, atol=2e-6)


def test_stage2_fused_matches_xla_batched():
    """optimize_stage with use_reproj=False must give the same result
    through the no-reproj kernel (fused_energy) as through the batched
    XLA energy (batched_solver) — including the residual offset."""
    from globalegomocap_tpu.config import (
        OptimizeConfig, PriorConfig, SolverConfig, with_overrides)
    from globalegomocap_tpu.data.synthetic import synthetic_chunk
    from globalegomocap_tpu.optimize.driver import (
        build_model, resolve_camera)
    from globalegomocap_tpu.optimize.pipeline import (
        optimize_stage, stage_weights)
    from globalegomocap_tpu.optimize.window import slice_windows
    from globalegomocap_tpu.ops.skeleton import mean_bone_lengths

    cfg0 = OptimizeConfig(
        prior=PriorConfig(latent_dim=32, seq_len=10,
                          hidden_dims=(8, 8, 16, 16, 32)),
        solver=SolverConfig(method="lbfgs_fixed", max_iter=3,
                            history_size=3, fused_probes=True,
                            step_candidates=(1.0, 0.1)),
        fold_bn=True, dense_decoder=True, decoder_impl="shift")
    model = build_model(cfg0)
    v = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 10, 45)), False)
    chunk = synthetic_chunk(n_frames=26, seed=9)
    win = slice_windows(jnp.asarray(chunk.estimated_local), 10, 8)
    heat = jnp.zeros((win.shape[0], 10, 15, 4, 4), jnp.float32)
    bl = jnp.broadcast_to(
        mean_bone_lengths(jnp.asarray(chunk.estimated_local)),
        (win.shape[0], 15))
    cam = resolve_camera(cfg0)
    _, global_w = stage_weights(cfg0)
    for residual in (False, True):
        outs = []
        for arm in ({"fused_energy": True}, {"batched_solver": True}):
            cfg = with_overrides(cfg0, solver=with_overrides(
                cfg0.solver, **arm))
            outs.append(optimize_stage(model, v, win, heat, bl, cam,
                                       global_w, False, cfg,
                                       residual=residual))
        np.testing.assert_allclose(np.asarray(outs[0]),
                                   np.asarray(outs[1]),
                                   rtol=2e-4, atol=2e-5)


def test_stage1_residual_fused_matches_xla_batched():
    """The v1 mega-kernel path must apply the residual offset (an XLA
    add before the kernel) identically to the batched XLA energy path —
    a reproj stage with residual on."""
    from globalegomocap_tpu.config import (
        OptimizeConfig, PriorConfig, SolverConfig, with_overrides)
    from globalegomocap_tpu.data.synthetic import synthetic_chunk
    from globalegomocap_tpu.energy.terms import crop_heatmaps_channels_last
    from globalegomocap_tpu.optimize.driver import (
        build_model, resolve_camera)
    from globalegomocap_tpu.optimize.pipeline import (
        optimize_stage, stage_weights)
    from globalegomocap_tpu.optimize.window import slice_windows
    from globalegomocap_tpu.ops.skeleton import mean_bone_lengths

    cfg0 = OptimizeConfig(
        prior=PriorConfig(latent_dim=32, seq_len=10,
                          hidden_dims=(8, 8, 16, 16, 32)),
        solver=SolverConfig(method="lbfgs_fixed", max_iter=3,
                            history_size=3, fused_probes=True,
                            step_candidates=(1.0, 0.1)),
        sampling_impl="dense", heatmap_crop=8,
        fold_bn=True, dense_decoder=True, decoder_impl="shift")
    model = build_model(cfg0)
    v = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 10, 45)), False)
    chunk = synthetic_chunk(n_frames=26, seed=13)
    est = jnp.asarray(chunk.estimated_local)
    crops, origins, full_hw = crop_heatmaps_channels_last(
        jnp.asarray(chunk.heatmaps), 8)
    win = slice_windows(est, 10, 8)
    win_heat = jnp.moveaxis(slice_windows(crops, 10, 8), -1, 2)
    win_org = slice_windows(origins, 10, 8)
    bl = jnp.broadcast_to(mean_bone_lengths(est), (win.shape[0], 15))
    cam = resolve_camera(cfg0)
    local_w, _ = stage_weights(cfg0)
    outs = []
    for arm in ({"fused_energy": True}, {"batched_solver": True}):
        cfg = with_overrides(cfg0, solver=with_overrides(
            cfg0.solver, **arm))
        outs.append(optimize_stage(model, v, win, win_heat, bl, cam,
                                   local_w, True, cfg, origins=win_org,
                                   full_hw=full_hw, residual=True))
    np.testing.assert_allclose(np.asarray(outs[0]), np.asarray(outs[1]),
                               rtol=2e-4, atol=2e-5)


def test_noreproj_kernel_headline_batch_shape():
    """Regression: b=60 (the headline's 5-chunk staged batch) is NOT a
    multiple of 8 — the kernel block must round UP to a Mosaic-legal
    multiple of 8 and pad, not shrink to b (blk=60 failed TPU lowering:
    'last two dims divisible by 8/128').  Numerics of the rounded+padded
    path are verified against the XLA energy here (interpret mode); the
    TPU lowering itself is exercised by scripts/run_headline.py."""
    from globalegomocap_tpu.ops.pallas.fused_energy import (
        fused_stage_energy_noreproj)
    camera = fisheye.default_camera("egosyn")
    w = EnergyWeights.create(weight_3d=1.0, smooth=0.001,
                             bone_length=0.01, vae=0.002, reproj=0.0)
    for b in (60, 6):
        pose, anchor, _, _, bone = _random_inputs(b, seed=5)
        pose_rt, anchor_t, _, _, _, bone_t = _to_kernel_layout(
            pose, anchor, jnp.zeros((b, T, J, K, K)),
            jnp.zeros((b, T, J, 2)), bone)
        wvec = _ctx(camera, w)[0]
        # R=2 probe rows like the production line search
        pr2 = jnp.concatenate([pose_rt, pose_rt * 1.01], axis=0)
        e_kernel = fused_stage_energy_noreproj(pr2, anchor_t, bone_t,
                                               wvec, T, J)
        e_xla = jax.vmap(
            lambda pp, a, b_: total_energy_from_pose(
                pp, a, b_, None, camera, w, False))(pose, anchor, bone)
        np.testing.assert_allclose(np.asarray(e_kernel[0]),
                                   np.asarray(e_xla),
                                   rtol=2e-5, atol=1e-5)
        assert e_kernel.shape == (2, b)
