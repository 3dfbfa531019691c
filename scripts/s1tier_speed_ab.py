"""Speed A/B of the stage-1 tier (max_iter x history) at the round-3
production point (conv decoder, fused kernels, residual s2=3, unroll5).

Quality evidence: quality_iter_crop_s1iter.json (clean corpus: iter12/m3
beats iter15/m5 on BOTH bone-aligned and raw-global) and _s1iter_v2.json
(guard-tripped corpora need >=15 iterations - the robust tier now
restores them).  This measures what the fast tier buys in launch time.

Run on TPU: python scripts/s1tier_speed_ab.py -> s1tier_speed_ab.json
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
    tiers = [tuple(int(v) for v in x.split("x")) for x in
             os.environ.get("AB_TIERS", "15x5,12x5,12x3,10x3").split(",")]
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
    for it, m in tiers:
        label = f"iter{it}_m{m}"
        cfg = replace(base, solver=replace(base.solver, max_iter=it,
                                           history_size=m,
                                           global_max_iter=3))
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
                                                 "s1tier_speed_ab.json"))
    with open(dest, "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
