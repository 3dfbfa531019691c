"""Round-2 composite levers: stack the winners from perf_levers_r2.json.

Same-session singles (base = r1 winner at 869.9 w/s): shift decoder
1095.5, crop8 1091.2, history5 991.0, circular_history 896.1,
dense-bf16 1052.2 (bf16 does NOT help the shift decoder: 1021.2).
This script measures the stacked combinations plus the fixed fisheye
projection micro-profile.

Run on the TPU:  python scripts/perf_levers_r2b.py
Writes perf_levers_r2b.json at the repo root.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main():
    import jax
    import jax.numpy as jnp

    from globalegomocap_tpu.config import (
        OptimizeConfig, PriorConfig, SolverConfig, with_overrides)
    from globalegomocap_tpu.data.synthetic import synthetic_chunk
    from globalegomocap_tpu.data.test_data import TestChunk
    from globalegomocap_tpu.optimize.driver import (
        SequenceOptimizer, build_model)
    from globalegomocap_tpu.optimize.window import num_windows

    n_chunks = int(os.environ.get("LEVERS_CHUNKS", "20"))
    chunks = [synthetic_chunk(100, seed=i) for i in range(n_chunks)]
    wins = num_windows(100) * n_chunks
    chunks = [TestChunk(*(jax.device_put(jnp.asarray(a)) for a in c))
              for c in chunks]

    def solver(h, circ):
        return SolverConfig(method="lbfgs_fixed", fused_probes=True,
                            history_size=h, circular_history=circ)

    base = OptimizeConfig(
        prior=PriorConfig(latent_dim=2048, seq_len=10),
        solver=solver(10, False),
        sampling_impl="dense", fold_bn=True, dense_decoder=True,
        heatmap_crop=16)

    model = build_model(base)
    x0 = jnp.zeros((1, 10, 45))
    v1 = model.init(jax.random.PRNGKey(0), x0, False)
    v2 = model.init(jax.random.PRNGKey(1), x0, False)

    def measure(name, cfg):
        opt = SequenceOptimizer(model, v1, v2, cfg)

        def run_all():
            out = opt.optimize_chunks_batched(chunks, mode="flat")
            jax.block_until_ready(out.optimized)

        t0 = time.perf_counter()
        run_all()
        compile_s = time.perf_counter() - t0
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            run_all()
            times.append(time.perf_counter() - t0)
        best = min(times)
        rec = {"lever": name, "windows_per_sec": round(wins / best, 1),
               "best_s": round(best, 4), "compile_s": round(compile_s, 1)}
        try:
            jitted = next(v for k, v in opt._jit_cache.items()
                          if isinstance(k, tuple) and k[0] == "batched")
            est = jnp.stack([c.estimated_local for c in chunks])
            cams = jnp.stack([c.camera_poses for c in chunks])
            heat = jnp.stack([c.heatmaps for c in chunks])
            gt = jnp.stack([c.gt_global for c in chunks])
            ca = jitted.lower(v1, v2, est, cams, heat,
                              gt).compile().cost_analysis()
            if isinstance(ca, (list, tuple)):
                ca = ca[0]
            flops = float(ca.get("flops", 0.0))
            if flops:
                rec["tflops_per_s"] = round(flops / best / 1e12, 2)
                rec["mfu_vs_bf16_peak"] = round(flops / best / 197e12, 4)
        except Exception as e:
            rec["cost_analysis_error"] = repr(e)[:120]
        print(json.dumps(rec), flush=True)
        return rec

    shift = with_overrides(base, decoder_impl="shift")
    levers = [
        ("base_same_session", base),
        ("shift_crop8", with_overrides(shift, heatmap_crop=8)),
        ("shift_hist5", with_overrides(shift, solver=solver(5, False))),
        ("shift_circ", with_overrides(shift, solver=solver(10, True))),
        ("shift_crop8_circ", with_overrides(shift, heatmap_crop=8,
                                            solver=solver(10, True))),
        ("shift_crop8_hist5_circ", with_overrides(
            shift, heatmap_crop=8, solver=solver(5, True))),
    ]
    results = []
    for name, cfg in levers:
        try:
            results.append(measure(name, cfg))
        except Exception as e:
            results.append({"lever": name, "error": repr(e)[:200]})
            print(json.dumps(results[-1]), flush=True)

    # ---- fisheye projection micro-profile (round-1 anomaly) -------------
    from globalegomocap_tpu.energy.terms import project_to_heatmap_grid
    from globalegomocap_tpu.ops import fisheye
    cam = fisheye.default_camera("egosyn")
    pts = jnp.asarray(np.random.default_rng(0).normal(
        size=(36000, 3)).astype(np.float32) * 0.3 + np.asarray(
        [0, 0, 1.5], np.float32))
    n_iter = 200

    @jax.jit
    def proj_loop(p0):
        def body(carry, _):
            out = project_to_heatmap_grid(carry, cam)
            carry = carry + 1e-6 * jnp.pad(out, ((0, 0), (0, 1)))
            return carry, jnp.sum(out)
        c, s = jax.lax.scan(body, p0, None, length=n_iter)
        return jnp.sum(s) + jnp.sum(c)

    jax.block_until_ready(proj_loop(pts))
    t0 = time.perf_counter()
    jax.block_until_ready(proj_loop(pts))
    per_call_us = (time.perf_counter() - t0) / n_iter * 1e6
    fisheye_rec = {"lever": "fisheye_projection_micro", "points": 36000,
                   "us_per_projection_batch": round(per_call_us, 1)}
    print(json.dumps(fisheye_rec), flush=True)
    results.append(fisheye_rec)

    with open(os.path.join(REPO, "perf_levers_r2b.json"), "w") as f:
        json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
