"""Measure the objective-evaluation cost floor of the solver on TPU.

Times N back-to-back batched value_and_grad evaluations of the full
stage-1 energy (decoder + energies, batch = all windows) via lax.scan,
yielding evals/s.  The fixed solver does ~25*(1 vg + 4 v) evaluations per
stage; comparing its measured windows/s against this floor isolates the
overhead of the solver structure (two-loop recursion, line-search
bookkeeping) from the irreducible objective cost.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from globalegomocap_tpu.config import OptimizeConfig, PriorConfig
    from globalegomocap_tpu.data.synthetic import synthetic_chunk
    from globalegomocap_tpu.energy.terms import total_energy_from_pose
    from globalegomocap_tpu.models.conv_vae import ConvVAE
    from globalegomocap_tpu.optimize.driver import (
        build_model, resolve_camera)
    from globalegomocap_tpu.optimize.pipeline import stage_weights
    from globalegomocap_tpu.optimize.window import slice_windows
    from globalegomocap_tpu.ops.skeleton import mean_bone_lengths

    n_chunks = 20
    cfg = OptimizeConfig(prior=PriorConfig(latent_dim=2048, seq_len=10))
    model = build_model(cfg)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 10, 45)),
                           False)
    cam = resolve_camera(cfg)
    local_w, _ = stage_weights(cfg)

    chunks = [synthetic_chunk(100, seed=i) for i in range(n_chunks)]
    win = jnp.concatenate([
        slice_windows(jnp.asarray(c.estimated_local), 10, 8)
        for c in chunks])
    heat = jnp.concatenate([
        jnp.moveaxis(slice_windows(jnp.asarray(c.heatmaps), 10, 8), -1, 2)
        for c in chunks])
    bl = jnp.concatenate([
        jnp.broadcast_to(mean_bone_lengths(jnp.asarray(c.estimated_local)),
                         (12, 15)) for c in chunks])
    n_win = win.shape[0]
    print(f"windows: {n_win}", flush=True)

    dense = os.environ.get("SOLVER_FLOOR_DENSE", "0") == "1"
    if dense:
        from globalegomocap_tpu.models.dense_decoder import (
            make_dense_decoder)
        decode_batch = make_dense_decoder(model, variables)
    else:
        def decode_batch(z):
            return model.apply(variables, z, False,
                               method=ConvVAE.decode_to_bodypose)

    # SOLVER_FLOOR_REPROJ=0 drops the heatmap term (stage-2-like eval) to
    # isolate the projection+sampling path's share of the eval cost
    use_reproj = os.environ.get("SOLVER_FLOOR_REPROJ", "1") == "1"
    sampling = os.environ.get("SOLVER_FLOOR_SAMPLING", "gather")

    def loss_one(z, anchor, h, b):
        pose = decode_batch(z[None])[0]
        return total_energy_from_pose(pose, anchor, b, h, cam, local_w,
                                      use_reproj, sampling_impl=sampling)

    batched_vg = jax.vmap(jax.value_and_grad(loss_one),
                          in_axes=(0, 0, 0, 0))
    batched_v = jax.vmap(loss_one, in_axes=(0, 0, 0, 0))

    mu, _ = model.apply(variables, win.reshape(n_win, 10, 45), False,
                        method=ConvVAE.encode)

    n_evals = 125  # one stage's worth of vg evals

    # NOTE: data must be ARGUMENTS, not closures — closed-over arrays bake
    # into the HLO as constants (a ~600MB program the remote compiler
    # rejects with HTTP 413).

    @jax.jit
    def run_vg(z0, win, heat, bl):
        def body(z, _):
            f, g = batched_vg(z, win, heat, bl)
            return z - 1e-4 * g, f
        z, fs = jax.lax.scan(body, z0, None, length=n_evals)
        return fs

    @jax.jit
    def run_v(z0, win, heat, bl):
        def body(z, _):
            f = batched_v(z, win, heat, bl)
            return z + 1e-6, f
        z, fs = jax.lax.scan(body, z0, None, length=n_evals)
        return fs

    out = {}
    for name, fn in (("value_and_grad", run_vg), ("value_only", run_v)):
        fs = fn(mu, win, heat, bl)
        jax.block_until_ready(fs)
        t0 = time.perf_counter()
        fs = fn(mu, win, heat, bl)
        jax.block_until_ready(fs)
        dt = time.perf_counter() - t0
        out[name] = {"evals_per_sec": round(n_evals / dt, 2),
                     "sec_per_eval_ms": round(dt / n_evals * 1e3, 3)}
        print(name, out[name], flush=True)

    # floor: per stage = 25 vg + 100 v evals; two stages per window batch
    vg_ms = out["value_and_grad"]["sec_per_eval_ms"]
    v_ms = out["value_only"]["sec_per_eval_ms"]
    stage_ms = 25 * vg_ms + 25 * v_ms  # 4 probes batched into ~1 v-eval?
    # NOTE: the 4 probes run as ONE batched call (batch x4) — approximate
    # their cost as 2x a value eval
    stage_ms_probes = 25 * vg_ms + 25 * 2 * v_ms
    total_ms = 2 * stage_ms_probes
    out["floor_windows_per_sec"] = round(n_win / (total_ms / 1e3), 1)
    out["dense_decoder"] = dense
    out["use_reproj"] = use_reproj
    out["sampling"] = sampling
    print(json.dumps(out), flush=True)
    if not use_reproj:
        name = "solver_floor_noreproj.json"
    elif dense:
        name = "solver_floor_dense.json"
    else:
        name = "solver_floor.json"
    with open(os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), name), "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
