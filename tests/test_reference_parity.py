"""Whole-algorithm parity test vs a torch implementation of the reference.

Runs ONE window through stage-1 latent optimization twice — once with
torch (the reference's exact machinery: torch LBFGS lr=2/25 iters/strong
Wolfe, grid_sample heatmap energy, torch ConvVAE) and once with this
framework — using IDENTICAL weights via the checkpoint converter and the
same deterministic mu-init.  The achieved energies and decoded poses must
agree.  This is the deepest cross-check available without the reference's
unreleased evaluation data.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from globalegomocap_tpu.config import (
    OptimizeConfig, SolverConfig, PriorConfig)
from globalegomocap_tpu.data.synthetic import synthetic_chunk
from globalegomocap_tpu.energy.terms import (
    EnergyWeights, total_energy_from_pose)
from globalegomocap_tpu.models.conv_vae import ConvVAE
from globalegomocap_tpu.models.torch_convert import torch_state_dict_to_flax
from globalegomocap_tpu.ops import fisheye
from globalegomocap_tpu.ops.skeleton import (
    mean_bone_lengths, KINEMATIC_PARENTS)
from globalegomocap_tpu.optimize.lbfgs import lbfgs_minimize


LATENT = 64
HIDDEN = (16, 16, 32, 32, 64)
# the reference's stage-1 (local) weight split, optimizer.py:355-358
WEIGHTS = dict(w3d=0.01 / 1e4, smooth=0.001 / 100, bone=0.01, reproj=0.01)
# the reference's stage-2 (global) split: reprojection off, optimizer.py:352-353
WEIGHTS_GLOBAL = dict(w3d=0.01, smooth=0.001, bone=0.01, reproj=0.0)


def make_model_pair(latent, hidden, seed=3):
    """A torch reference model + its converter-loaded flax twin."""
    import torch
    from tests.torch_vae_harness import TorchConvVAE

    torch.manual_seed(seed)
    tmodel = TorchConvVAE(latent_dim=latent, seq_len=10,
                          hidden_dims=hidden).eval()
    sd = {k: v.detach().numpy() for k, v in tmodel.state_dict().items()}
    variables = jax.tree_util.tree_map(
        jnp.asarray, torch_state_dict_to_flax(sd, 10, hidden))
    return tmodel, variables


def make_window():
    chunk = synthetic_chunk(n_frames=12, seed=42, noise_std=0.03)
    anchor = chunk.estimated_local[:10]                   # (10, 15, 3)
    heat = chunk.heatmaps[:10].transpose(0, 3, 1, 2)      # (10, 15, H, W)
    mean_bl = np.asarray(mean_bone_lengths(
        jnp.asarray(chunk.estimated_local)))
    return anchor, heat, mean_bl


@pytest.fixture(scope="module")
def setup():
    tmodel, variables = make_model_pair(LATENT, HIDDEN)
    anchor, heat, mean_bl = make_window()
    return tmodel, variables, anchor, heat, mean_bl


def torch_stage(tmodel, anchor, heat, mean_bl, weights=WEIGHTS):
    """The reference's per-stage solve: torch LBFGS over the latent with the
    exact energies (deterministic mu init for comparability).  weights
    selects the stage: WEIGHTS = stage-1 local, WEIGHTS_GLOBAL = stage-2
    global (reprojection weight 0 skips the heatmap term, optimizer.py:352)."""
    import torch

    cam_center = np.asarray(fisheye.default_camera("egosyn").center)
    w2c = np.asarray(fisheye.default_camera("egosyn").poly_w2c)

    t_anchor = torch.tensor(anchor)
    t_heat = torch.tensor(heat.reshape(-1, 1, 64, 64))
    t_bl = torch.tensor(mean_bl)

    def project(p):  # (N, 3) -> (N, 2), full-image pixels
        x, y, z = p[:, 0], p[:, 1], -p[:, 2]
        norm = torch.sqrt(x * x + y * y).clamp_min(1e-9)
        theta = torch.atan(z / norm)
        rho = torch.zeros_like(theta)
        for c in reversed(w2c):
            rho = rho * theta + float(c)
        return torch.stack([x / norm * rho + cam_center[0],
                            y / norm * rho + cam_center[1]], 1)

    def loss_fn(z):
        pose = tmodel.decode(z).reshape(10, 15, 3)
        e3d = torch.sum((pose - t_anchor) ** 2)
        vel = pose[1:] - pose[:-1]
        acc = vel[1:] - vel[:-1]
        es = torch.sum(acc ** 2)
        bones = pose - pose[:, KINEMATIC_PARENTS, :]
        eb = torch.sum((torch.norm(bones, dim=-1) - t_bl) ** 2)
        if weights["reproj"] != 0.0:
            p2d = project(pose.reshape(-1, 3))
            p2d = torch.stack([p2d[:, 0] - 128.0, p2d[:, 1]], 1)
            grid = ((p2d - 512.0) / 512.0).view(-1, 1, 1, 2)
            heat_s = torch.nn.functional.grid_sample(t_heat, grid,
                                                     align_corners=True)
            er = -torch.sum(heat_s)
        else:
            er = torch.zeros(())
        return (weights["w3d"] * e3d + weights["smooth"] * es
                + weights["bone"] * eb + weights["reproj"] * er)

    with torch.no_grad():
        mu, _ = tmodel.encode(torch.tensor(anchor.reshape(1, 10, 45)))
    z = torch.nn.Parameter(mu.clone())
    opt = torch.optim.LBFGS([z], lr=2.0, max_iter=25,
                            tolerance_change=1e-6,
                            line_search_fn="strong_wolfe")

    def closure():
        opt.zero_grad()
        loss = loss_fn(z)
        loss.backward()
        return loss

    opt.step(closure)
    with torch.no_grad():
        return (float(loss_fn(z)),
                tmodel.decode(z).reshape(10, 15, 3).numpy())


def jax_stage(variables, anchor, heat, mean_bl, stage_weights=WEIGHTS,
              latent=LATENT, hidden=HIDDEN):
    model = ConvVAE(latent_dim=latent, seq_len=10, hidden_dims=hidden)
    cam = fisheye.default_camera("egosyn")
    use_reproj = stage_weights["reproj"] != 0.0
    weights = EnergyWeights.create(
        weight_3d=stage_weights["w3d"], smooth=stage_weights["smooth"],
        bone_length=stage_weights["bone"], vae=0.0,
        reproj=stage_weights["reproj"])

    j_anchor = jnp.asarray(anchor)
    j_heat = jnp.asarray(heat)
    j_bl = jnp.asarray(mean_bl)

    def loss(z):
        pose = model.apply(variables, z[None], False,
                           method=ConvVAE.decode_to_bodypose)[0]
        return total_energy_from_pose(pose, j_anchor, j_bl, j_heat, cam,
                                      weights, use_reproj)

    mu, _ = model.apply(variables, j_anchor.reshape(1, 10, 45), False,
                        method=ConvVAE.encode)
    res = lbfgs_minimize(loss, mu[0], max_iter=25, history_size=25)
    pose = model.apply(variables, res.x[None], False,
                       method=ConvVAE.decode_to_bodypose)[0]
    return float(res.f), np.asarray(pose)


def test_stage1_parity(setup):
    tmodel, variables, anchor, heat, mean_bl = setup

    f_torch, pose_torch = torch_stage(tmodel, anchor, heat, mean_bl)
    f_jax, pose_jax = jax_stage(variables, anchor, heat, mean_bl)

    # the initial (mu-init) energies are identical by the converter parity
    # test; both optimizers must reach essentially the same minimum
    assert f_jax <= f_torch * 1.02 + 1e-6, (f_jax, f_torch)
    assert f_torch <= f_jax * 1.02 + 1e-6, (f_jax, f_torch)
    # and essentially the same pose (mm-scale agreement)
    mpjpe = np.linalg.norm(pose_jax - pose_torch, axis=-1).mean()
    assert mpjpe < 5e-3, mpjpe


def test_stage2_parity(setup):
    """Stage-2 head-to-head: the GLOBAL weight split (reprojection off) on a
    relative-global anchor, the exact configuration of the reference's
    second solve (optimizer.py:352-353, 414-417)."""
    from globalegomocap_tpu.ops.transforms import relative_global_pose

    tmodel, variables, anchor, heat, mean_bl = setup

    # lift the local anchor to the relative-global frame with the synthetic
    # chunk's own camera trajectory (the lift itself is covered by
    # tests/test_ops_geometry.py)
    chunk = synthetic_chunk(n_frames=12, seed=42, noise_std=0.03)
    rel = np.asarray(relative_global_pose(
        jnp.asarray(chunk.estimated_local[:10])[None],
        jnp.asarray(chunk.camera_poses[:10])[None])[0]).astype(np.float32)
    rel_bl = np.asarray(mean_bone_lengths(jnp.asarray(rel)))

    f_torch, pose_torch = torch_stage(tmodel, rel, heat, rel_bl,
                                      weights=WEIGHTS_GLOBAL)
    f_jax, pose_jax = jax_stage(variables, rel, heat, rel_bl,
                                stage_weights=WEIGHTS_GLOBAL)

    # we must never be worse; torch's single LBFGS.step terminates at its
    # tolerance_change and lands measurably above our minimum on this
    # stage (observed ~2%), so the upper band is looser
    assert f_jax <= f_torch * 1.02 + 1e-6, (f_jax, f_torch)
    assert f_torch <= f_jax * 1.05 + 1e-6, (f_jax, f_torch)
    # without the reprojection term the energy valley is flat in latent
    # space, so the two solvers may stop at different equally-good latents;
    # parity is judged on solution QUALITY (SURVEY §7: final MPJPE within
    # noise, not trajectory): both must sit equally close to the anchor
    d_jax = np.linalg.norm(pose_jax - rel, axis=-1).mean()
    d_torch = np.linalg.norm(pose_torch - rel, axis=-1).mean()
    # 1% relative: the absolute distance is dominated by how well the
    # (random, untrained) test decoder can represent the anchor at all
    assert abs(d_jax - d_torch) < 0.01 * max(d_jax, d_torch), \
        (d_jax, d_torch)
    assert d_jax <= d_torch * 1.01, (d_jax, d_torch)  # never worse


@pytest.mark.slow
def test_full_size_parity():
    """The SAME two head-to-heads at the PRODUCTION architecture —
    latent 2048, hidden (64..512), converter-loaded torch weights
    (the shape of the reference's released checkpoints,
    optimizer.py:332-350).  Writes the measured energies/poses to
    tests/golden/full_size_parity.json as the committed evidence."""
    import json
    import os

    latent, hidden = 2048, (64, 64, 128, 256, 512)
    tmodel, variables = make_model_pair(latent, hidden)
    anchor, heat, mean_bl = make_window()

    record = {"latent": latent, "hidden": list(hidden)}

    # ---- stage 1 (local split, heatmap term on) ----
    f_t1, pose_t1 = torch_stage(tmodel, anchor, heat, mean_bl)
    f_j1, pose_j1 = jax_stage(variables, anchor, heat, mean_bl,
                              latent=latent, hidden=hidden)
    mpjpe1 = float(np.linalg.norm(pose_j1 - pose_t1, axis=-1).mean())
    record["stage1"] = {"f_torch": f_t1, "f_jax": f_j1, "mpjpe": mpjpe1}
    # sign-safe 2% bands: at full size the (negative) heatmap term
    # dominates, so multiplicative bands would flip direction
    assert f_j1 <= f_t1 + 0.02 * abs(f_t1) + 1e-6, (f_j1, f_t1)
    assert f_t1 <= f_j1 + 0.02 * abs(f_j1) + 1e-6, (f_j1, f_t1)
    assert mpjpe1 < 5e-3, mpjpe1

    # ---- stage 2 (global split, reprojection off) ----
    from globalegomocap_tpu.ops.transforms import relative_global_pose
    chunk = synthetic_chunk(n_frames=12, seed=42, noise_std=0.03)
    rel = np.asarray(relative_global_pose(
        jnp.asarray(chunk.estimated_local[:10])[None],
        jnp.asarray(chunk.camera_poses[:10])[None])[0]).astype(np.float32)
    rel_bl = np.asarray(mean_bone_lengths(jnp.asarray(rel)))
    f_t2, pose_t2 = torch_stage(tmodel, rel, heat, rel_bl,
                                weights=WEIGHTS_GLOBAL)
    f_j2, pose_j2 = jax_stage(variables, rel, heat, rel_bl,
                              stage_weights=WEIGHTS_GLOBAL,
                              latent=latent, hidden=hidden)
    d_jax = float(np.linalg.norm(pose_j2 - rel, axis=-1).mean())
    d_torch = float(np.linalg.norm(pose_t2 - rel, axis=-1).mean())
    record["stage2"] = {"f_torch": f_t2, "f_jax": f_j2,
                        "dist_to_anchor_jax": d_jax,
                        "dist_to_anchor_torch": d_torch}
    assert f_j2 <= f_t2 + 0.02 * abs(f_t2) + 1e-6, (f_j2, f_t2)
    assert f_t2 <= f_j2 + 0.05 * abs(f_j2) + 1e-6, (f_j2, f_t2)
    assert abs(d_jax - d_torch) < 0.01 * max(d_jax, d_torch), \
        (d_jax, d_torch)

    out = os.path.join(os.path.dirname(__file__), "golden",
                       "full_size_parity.json")
    with open(out, "w") as f:
        json.dump(record, f, indent=1)
