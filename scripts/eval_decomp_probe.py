"""Decompose the production objective eval (VERDICT r2 #2 groundwork).

At the round-2 operating point (480-window flat batch, K=2 fused probes,
shift decoder, crop8 dense sampling) one L-BFGS iteration is ~1.35 ms and
~60-100 kernels.  A decode+project+sample+energy mega-kernel can only pay
if the POST-DECODE energy forest (projection + sampling + reductions +
their backward) carries a meaningful share of that time — the decoder
matmuls would stay XLA either way (their weights exceed the 16 MB scoped
VMEM, and MXU matmuls are XLA's home turf).

Measures, at the production batch (960 = 480 windows x K=2):
  decode_vg      value_and_grad of sum(decode(z))        [matmul chain]
  energy_vg      value_and_grad of total_energy(pose)    [the forest]
  full_vg        value_and_grad of total_energy(decode(z))
  *_value        value-only variants
plus HLO fusion counts per compiled program (kernel-count proxy).

Run on TPU: python scripts/eval_decomp_probe.py  ->  eval_decomp.json
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from globalegomocap_tpu.config import OptimizeConfig, PriorConfig
    from globalegomocap_tpu.data.synthetic import synthetic_chunk
    from globalegomocap_tpu.energy.terms import (
        EnergyWeights, crop_heatmaps_channels_last, total_energy_from_pose)
    from globalegomocap_tpu.models.conv_vae import ConvVAE
    from globalegomocap_tpu.models.dense_decoder import make_shift_decoder
    from globalegomocap_tpu.optimize.driver import resolve_camera
    from globalegomocap_tpu.optimize.pipeline import stage_weights
    from globalegomocap_tpu.optimize.window import slice_windows
    from globalegomocap_tpu.ops.skeleton import mean_bone_lengths

    cfg = OptimizeConfig(prior=PriorConfig(latent_dim=2048, seq_len=10),
                         sampling_impl="dense", heatmap_crop=8,
                         fold_bn=True)
    camera = resolve_camera(cfg)
    model = ConvVAE(latent_dim=2048, seq_len=10)
    v = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 10, 45)), False)
    decode = make_shift_decoder(model, v, None)  # folds BN itself
    local_w, _ = stage_weights(cfg)

    n_chunks = int(os.environ.get("DECOMP_CHUNKS", "40"))
    k_probe = int(os.environ.get("DECOMP_K", "2"))
    chunks = [synthetic_chunk(100, seed=i) for i in range(n_chunks)]
    est = np.stack([c.estimated_local for c in chunks])
    heat = np.stack([c.heatmaps for c in chunks])

    win = jax.vmap(lambda s: slice_windows(jnp.asarray(s), 10, 8))(
        jnp.asarray(est))                       # (C, W, T, 15, 3)
    crops, origins, full_hw = crop_heatmaps_channels_last(
        jnp.asarray(heat), 8)
    w_org = jax.vmap(lambda s: slice_windows(s, 10, 8))(origins)
    w_crop = jnp.moveaxis(
        jax.vmap(lambda s: slice_windows(s, 10, 8))(crops), -1, 3)

    c, wper = win.shape[0], win.shape[1]
    B = c * wper

    def flat(x):
        return x.reshape((B,) + x.shape[2:])

    f_pose = flat(win)                           # (B, T, 15, 3)
    f_org = flat(w_org)
    f_crop = flat(w_crop)                        # (B, T, 15, k, k)
    bl = jnp.repeat(jax.vmap(mean_bone_lengths)(jnp.asarray(est)),
                    wper, axis=0)

    # replicate to the K-probe batch the fused solver evaluates
    K = k_probe
    poseK = jnp.tile(f_pose, (K, 1, 1, 1))
    orgK = jnp.tile(f_org, (K, 1, 1, 1))
    cropK = jnp.tile(f_crop, (K, 1, 1, 1, 1))
    blK = jnp.tile(bl, (K, 1))
    zK = jnp.asarray(np.random.default_rng(0).normal(
        size=(B * K, 2048)).astype(np.float32))

    def energy_of_pose(pose, anchor, h, b, org):
        return total_energy_from_pose(
            pose, anchor, b, h, camera, local_w, True,
            sampling_impl="dense", origins=org, full_hw=full_hw)

    def e_batch(poses, anchors, hs, bs, orgs):
        return jnp.sum(jax.vmap(energy_of_pose)(poses, anchors, hs, bs,
                                                orgs))

    def full_loss(z):
        poses = decode(z).astype(jnp.float32)
        return e_batch(poses, poseK, cropK, blK, orgK)

    def decode_loss(z):
        return jnp.sum(decode(z).astype(jnp.float32) ** 2)

    def energy_loss(pose):
        return e_batch(pose, poseK, cropK, blK, orgK)

    out = {"batch": int(B * K), "windows": int(B), "k_probe": K}
    n_scan = int(os.environ.get("DECOMP_SCAN", "100"))

    def measure(name, fn, arg):
        # ONE launch is tunnel-RTT-floored (~24 ms, fixed_cost_probe), so
        # time a lax.scan of n_scan evals, with the input perturbed by a
        # function of the previous output each iteration (the microbench
        # trap: an invariant body gets hoisted by XLA — CLAUDE.md).
        def body(c, _):
            r = fn(c)
            leaves = jax.tree_util.tree_leaves(r)
            bump = sum(jnp.sum(leaf.astype(jnp.float32) * 0.0)
                       for leaf in leaves) + 1e-30 * jnp.sum(
                leaves[0].astype(jnp.float32))
            return c * (1.0 + bump), None

        def scanned(c):
            c2, _ = jax.lax.scan(body, c, None, length=n_scan)
            return c2

        jfn = jax.jit(scanned)
        t0 = time.perf_counter()
        jax.block_until_ready(jfn(arg))
        compile_s = time.perf_counter() - t0
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            jax.block_until_ready(jfn(arg))
            ts.append(time.perf_counter() - t0)
        ms = 1e3 * min(ts) / n_scan
        try:
            txt = jax.jit(fn).lower(arg).compile().as_text()
            fusions = txt.count(" fusion(") + txt.count(" fusion.")
        except Exception:
            fusions = -1
        out[name] = {"ms_per_eval": round(ms, 4),
                     "scan_total_ms": round(1e3 * min(ts), 1),
                     "compile_s": round(compile_s, 1),
                     "hlo_fusions": fusions}
        print(name, out[name], flush=True)

    measure("full_value", full_loss, zK)
    measure("full_vg", jax.value_and_grad(full_loss), zK)
    measure("decode_value", decode_loss, zK)
    measure("decode_vg", jax.value_and_grad(decode_loss), zK)
    measure("energy_value", energy_loss, poseK)
    measure("energy_vg", jax.value_and_grad(energy_loss), poseK)

    # the fused mega-kernel's own eval at the same shapes (value+grad in
    # one pallas_call; ops/pallas/fused_energy.py)
    try:
        from globalegomocap_tpu.ops.pallas.fused_energy import (
            fused_stage_energy)
        anchor_t = jnp.moveaxis(poseK.reshape(B * K, 150, 3), -1, 1)
        crops_cm = jnp.swapaxes(cropK.reshape(B * K, 150, 64), 1, 2)
        f_ox = orgK[..., 1].reshape(B * K, 150)
        f_oy = orgK[..., 0].reshape(B * K, 150)
        bone_t = jnp.tile(blK, (1, 10))
        wvec = jnp.stack([
            local_w.weight_3d, local_w.smooth, local_w.bone_length,
            local_w.vae, local_w.reproj, camera.center[0],
            camera.center[1], jnp.asarray(0.0, jnp.float32)])[None]
        poly = camera.poly_w2c[None].astype(jnp.float32)

        def fused_vg(pose_t):
            def f(pt):
                return jnp.sum(fused_stage_energy(
                    pt[None], anchor_t, crops_cm, f_ox, f_oy, bone_t,
                    (wvec.astype(jnp.float32), poly), 10, 15, 8,
                    full_hw, 128.0, 512.0))
            return jax.value_and_grad(f)(pose_t)

        pose_t0 = jnp.moveaxis(poseK.reshape(B * K, 150, 3), -1, 1)
        measure("fused_energy_vg", fused_vg, pose_t0)
    except Exception as e:  # noqa: BLE001
        out["fused_energy_vg_error"] = repr(e)
        print("fused_energy_vg failed:", repr(e), flush=True)

    with open(os.path.join(REPO, "eval_decomp.json"), "w") as f:
        json.dump(out, f, indent=1)
    print("wrote eval_decomp.json")


if __name__ == "__main__":
    main()
