"""Decompose the ~9 ms in-program launch intercept at the round-3 point.

iter_decomp_r3.json isolates intercept = launch(iter1) - RTT - 2 iters
~ 9 ms but not its composition.  This probe scan-times each intercept
ingredient as its own device loop (perturbed carry so XLA cannot hoist
the body — CLAUDE.md microbench trap), at the production batch:

  * encode: ConvVAE encoder fwd (per stage, x2 per launch)
  * decode fwd: shift-decoder chain (offset + final decodes, x3-4)
  * init eval: one R=1 value_and_grad through the fused energy kernel
  * lift: relative_global_pose + relative_to_global_pose einsums
  * merge: scatter-mean window merge + final gaussian smooth

Informs whether a shift-encoder (conv stack as 3-shift matmuls, the
decoder's winning trick) or a z0=0 stage-2 init (drops one encode) can
move the pipelined floor.

Run on TPU: python scripts/intercept_probe_r3.py -> intercept_probe_r3.json
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from globalegomocap_tpu.config import (
        EnergyConfig, OptimizeConfig, PriorConfig, SolverConfig)
    from globalegomocap_tpu.models.conv_vae import ConvVAE
    from globalegomocap_tpu.models.dense_decoder import make_shift_decoder
    from globalegomocap_tpu.models.fold_bn import fold_batchnorm
    from globalegomocap_tpu.optimize.driver import build_model
    from globalegomocap_tpu.ops.transforms import (
        relative_global_pose, relative_to_global_pose)
    from globalegomocap_tpu.ops.filtering import gaussian_filter1d
    from globalegomocap_tpu.optimize.window import merge_windows

    w = int(os.environ.get("IP_WINDOWS", "672"))   # 56 chunks x 12
    latent = 2048
    reps = int(os.environ.get("IP_REPS", "50"))

    cfg = OptimizeConfig(
        prior=PriorConfig(latent_dim=latent, seq_len=10),
        energy=EnergyConfig(global_weight_3d=1.0, global_residual=True),
        solver=SolverConfig(method="lbfgs_fixed", fused_probes=True,
                            history_size=5, max_iter=15,
                            step_candidates=(1.0, 0.1), fused_energy=True),
        sampling_impl="dense", fold_bn=True, dense_decoder=True,
        decoder_impl="shift", heatmap_crop=8)
    model = build_model(cfg)
    x0 = jnp.zeros((1, 10, 45))
    variables = model.init(jax.random.PRNGKey(0), x0, False)
    fv = fold_batchnorm(variables)
    emodel = model.clone(use_bn=False)

    key = jax.random.PRNGKey(1)
    pose = jax.device_put(jax.random.normal(key, (w, 10, 45)) * 0.1)
    z = jax.device_put(jax.random.normal(key, (w, latent)) * 0.1)
    cams = jnp.tile(jnp.eye(4)[None, None], (w, 10, 1, 1))
    pose3 = pose.reshape(w, 10, 15, 3)

    decode = make_shift_decoder(model, variables)

    def timed_scan(fn, x, label, out):
        """Median per-eval ms of fn inside a device scan; the carry
        perturbs the input so XLA cannot hoist the body."""
        def body(c, _):
            y = fn(x + c * 1e-6)
            # fold output into the scalar carry (cheap full reduction)
            return jnp.sum(jax.tree_util.tree_leaves(y)[0]) * 1e-12, None
        def run(n):
            c, _ = jax.lax.scan(body, jnp.asarray(0.0, jnp.float32),
                                None, length=n)
            return c
        r = jax.jit(run, static_argnums=0)
        jax.block_until_ready(r(reps))
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            jax.block_until_ready(r(reps))
            ts.append(time.perf_counter() - t0)
        ms = 1e3 * min(ts) / reps
        out[label] = round(ms, 4)
        print(label, out[label], flush=True)

    out = {"windows": w, "reps": reps}

    timed_scan(lambda p: emodel.apply(fv, p, False,
                                      method=ConvVAE.encode)[0],
               pose, "encode_ms", out)
    timed_scan(decode, z, "decode_fwd_ms", out)
    timed_scan(lambda p: relative_to_global_pose(
        relative_global_pose(p, cams), cams[:, 0]),
        pose3, "lift_ms", out)
    timed_scan(lambda p: gaussian_filter1d(
        merge_windows(p, 5), 1.0, axis=0),
        pose3, "merge_smooth_ms", out)

    # init eval: R=1 value_and_grad through the no-reproj fused kernel
    from globalegomocap_tpu.ops.pallas.fused_energy import (
        fused_stage_energy_noreproj)
    anchor_t = jnp.moveaxis(pose3.reshape(w, 150, 3), -1, 1)
    bone_t = jnp.abs(jax.random.normal(key, (w, 150))) + 0.5
    wvec = jnp.asarray([[1.0, 0.001, 0.01, 0.0, 0.0, 0.0, 0.0, 0.0]],
                       jnp.float32)

    def init_eval(z_):
        def be(zz):
            p = decode(zz.reshape(-1, latent)).astype(jnp.float32)
            prt = jnp.moveaxis(p.reshape(1 * w, 150, 3), -1, 1
                               ).reshape(1, w, 3, 150)
            return fused_stage_energy_noreproj(prt, anchor_t, bone_t,
                                               wvec, 10, 15)
        vals, pull = jax.vjp(be, z_[None])
        (gz,) = pull(jnp.ones_like(vals))
        return vals

    timed_scan(init_eval, z, "init_eval_noreproj_vg_ms", out)

    per_launch = (2 * out["encode_ms"] + 4 * out["decode_fwd_ms"]
                  + 2 * out["lift_ms"] + 2 * out["merge_smooth_ms"]
                  + 2 * out["init_eval_noreproj_vg_ms"])
    out["accounted_intercept_ms"] = round(per_launch, 3)
    out["note"] = ("launch intercept uses 2x encode, ~4x decode fwd "
                   "(2 offsets + 2 finals), 2x lift, 2x merge+smooth, "
                   "2x init evals; stage-1 init eval (reproj kernel) "
                   "approximated by the no-reproj one")
    with open(os.path.join(REPO, "intercept_probe_r3.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
