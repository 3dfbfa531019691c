"""Speed A/B of the stage-2 iteration budget (solver.global_max_iter) at
the round-3 production point (conv decoder, fused kernels, residual
stage 2, unroll 5, 56 chunks).

Quality evidence lives in quality_iter_crop_s2iter.json (trained priors:
metrics identical to 5 decimals for s2 in {3..15} on the headline
corpus) and its v2-corpus variant; this measures what the budget buys in
launch time (each stage-2 iteration ~0.9 ms, iter_decomp_r3.json).

Run on TPU: python scripts/s2iter_speed_ab.py -> s2iter_speed_ab.json
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
    s2_list = [None if x == "none" else int(x) for x in
               os.environ.get("AB_S2", "none,8,5,3").split(",")]
    base = OptimizeConfig(
        prior=PriorConfig(latent_dim=2048, seq_len=10),
        energy=EnergyConfig(global_weight_3d=1.0, global_residual=True),
        solver=SolverConfig(method="lbfgs_fixed", fused_probes=True,
                            history_size=5, max_iter=15,
                            step_candidates=(1.0, 0.1),
                            fused_energy=True, unroll=5),
        sampling_impl="dense", heatmap_crop=8,
        fold_bn=True, dense_decoder=True, decoder_impl="conv")
    model = build_model(base)
    x0 = jnp.zeros((1, 10, 45))
    v1 = model.init(jax.random.PRNGKey(0), x0, False)
    v2 = model.init(jax.random.PRNGKey(1), x0, False)

    chunks = [TestChunk(*(jax.device_put(jnp.asarray(a))
                          for a in synthetic_chunk(100, seed=i)))
              for i in range(n_chunks)]
    wins = num_windows(100) * n_chunks

    out = {"chunks": n_chunks, "windows": wins, "results": {}}
    for s2 in s2_list:
        label = f"s2_{'same' if s2 is None else s2}"
        cfg = replace(base, solver=replace(base.solver,
                                           global_max_iter=s2))
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
        out["results"][label] = {
            "windows_per_sec": round(wins / min(ts), 1),
            "best_s": round(min(ts), 4),
            "median_s": round(sorted(ts)[len(ts) // 2], 4),
            "pipelined_windows_per_sec": round(wins / pipe, 1),
            "compile_s": round(compile_s, 1),
            "optimized_mean": float(np.mean(np.asarray(res.optimized))),
        }
        print(label, out["results"][label], flush=True)

    dest = os.environ.get("AB_OUT", os.path.join(REPO,
                                                 "s2iter_speed_ab.json"))
    with open(dest, "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
