"""A/B: matmul merges (+ folded smoothing + direct-camera world lifts)
vs the scatter-merge path, at the round-3 production point (u5/c56).

intercept_probe_r3.json put lift at 0.82 ms and merge+smooth at 0.81 ms
per probe call — the two LARGEST intercept items, both linear maps with
static coefficients.  This measures the launch-level effect of
  * est/mid world lifts through C_i directly (cam0 . inv(cam0) . C_i
    collapses; unconditional — in both arms),
  * every merge as one static-matrix matmul with the gaussian smoothing
    folded into the optimized field's matrix (cfg.matmul_merge, the
    A/B'd knob).

SANITY: the mm arm at u5/c56 should sit near 9639 w/s (unroll_chunks_ab2)
if the session is healthy.

Run on TPU: python scripts/postprocess_ab.py  ->  postprocess_ab.json
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
    from dataclasses import replace

    from globalegomocap_tpu.config import (
        EnergyConfig, OptimizeConfig, PriorConfig, SolverConfig)
    from globalegomocap_tpu.data.synthetic import synthetic_chunk
    from globalegomocap_tpu.data.test_data import TestChunk
    from globalegomocap_tpu.optimize.driver import (
        SequenceOptimizer, build_model)
    from globalegomocap_tpu.optimize.window import num_windows

    n_chunks = int(os.environ.get("AB_CHUNKS", "56"))
    base = OptimizeConfig(
        prior=PriorConfig(latent_dim=2048, seq_len=10),
        energy=EnergyConfig(global_weight_3d=1.0, global_residual=True),
        solver=SolverConfig(method="lbfgs_fixed", fused_probes=True,
                            history_size=5, max_iter=15,
                            step_candidates=(1.0, 0.1),
                            fused_energy=True, unroll=5),
        sampling_impl="dense", heatmap_crop=8,
        fold_bn=True, dense_decoder=True, decoder_impl="shift")
    model = build_model(base)
    x0 = jnp.zeros((1, 10, 45))
    v1 = model.init(jax.random.PRNGKey(0), x0, False)
    v2 = model.init(jax.random.PRNGKey(1), x0, False)

    chunks = [TestChunk(*(jax.device_put(jnp.asarray(a))
                          for a in synthetic_chunk(100, seed=i)))
              for i in range(n_chunks)]
    wins = num_windows(100) * n_chunks

    out = {"chunks": n_chunks, "windows": wins, "results": {}}
    means = {}
    for label, mm in (("matmul_merge", True), ("scatter_merge", False)):
        cfg = replace(base, matmul_merge=mm)
        opt = SequenceOptimizer(model, v1, v2, cfg)
        staged = opt.stage(chunks)
        t0 = time.perf_counter()
        res = opt.optimize_chunks_batched(staged, mode="flat")
        jax.block_until_ready(res.optimized)
        compile_s = time.perf_counter() - t0
        ts = []
        for _ in range(10):
            t0 = time.perf_counter()
            res = opt.optimize_chunks_batched(staged, mode="flat")
            jax.block_until_ready(res.optimized)
            ts.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        rs = [opt.optimize_chunks_batched(staged, mode="flat")
              for _ in range(4)]
        for r in rs:
            jax.block_until_ready(r.optimized)
        pipe = (time.perf_counter() - t0) / 4
        means[label] = np.asarray(res.optimized)
        out["results"][label] = {
            "windows_per_sec": round(wins / min(ts), 1),
            "best_s": round(min(ts), 4),
            "median_s": round(sorted(ts)[len(ts) // 2], 4),
            "pipelined_windows_per_sec": round(wins / pipe, 1),
            "compile_s": round(compile_s, 1),
            "optimized_mean": float(np.mean(means[label])),
        }
        print(label, out["results"][label], flush=True)

    diff = float(np.max(np.abs(means["matmul_merge"]
                               - means["scatter_merge"])))
    out["max_abs_diff"] = diff
    a, b = (out["results"]["matmul_merge"]["windows_per_sec"],
            out["results"]["scatter_merge"]["windows_per_sec"])
    out["speedup_matmul"] = round(a / b, 3)
    dest = os.environ.get("AB_OUT", os.path.join(REPO,
                                                 "postprocess_ab.json"))
    with open(dest, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({k: v for k, v in out.items() if k != "results"}))


if __name__ == "__main__":
    main()
