"""Round-3 launch decomposition at the fused production point.

fused_ab_s2.json puts a synced 480-window launch at ~55 ms.  This probe
splits that into intercept (staging-side is already amortized; this is
the IN-PROGRAM fixed cost: encodes, lifts, merge, init evals) and the
per-iteration slope, then splits the slope into objective-eval vs
L-BFGS bookkeeping (direction two-loop + history updates) by crossing
max_iter with history size:

    launch(iter) ~ intercept + iter * (eval + direction(m))
    direction share ~ slope(m=10) - slope(m=1)

Informs whether a direction-kernel rematch (two previous A/Bs lost at
the PRE-fused operating point) is worth a third attempt now that the
eval itself is one kernel.

Run on TPU: python scripts/iter_decomp_r3.py -> iter_decomp_r3.json
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
    from dataclasses import replace

    from globalegomocap_tpu.config import (
        EnergyConfig, OptimizeConfig, PriorConfig, SolverConfig)
    from globalegomocap_tpu.data.synthetic import synthetic_chunk
    from globalegomocap_tpu.data.test_data import TestChunk
    from globalegomocap_tpu.optimize.driver import (
        SequenceOptimizer, build_model)

    base = OptimizeConfig(
        prior=PriorConfig(latent_dim=2048, seq_len=10),
        energy=EnergyConfig(global_weight_3d=1.0, global_residual=True),
        solver=SolverConfig(method="lbfgs_fixed", fused_probes=True,
                            history_size=5, max_iter=15,
                            step_candidates=(1.0, 0.1),
                            fused_energy=True),
        sampling_impl="dense", fold_bn=True, dense_decoder=True,
        decoder_impl="shift", heatmap_crop=8)
    model = build_model(base)
    x0 = jnp.zeros((1, 10, 45))
    v1 = model.init(jax.random.PRNGKey(0), x0, False)
    v2 = model.init(jax.random.PRNGKey(1), x0, False)

    n_chunks = int(os.environ.get("ID_CHUNKS", "40"))
    chunks = [TestChunk(*(jax.device_put(jnp.asarray(a))
                          for a in synthetic_chunk(100, seed=i)))
              for i in range(n_chunks)]

    out = {"chunks": n_chunks, "windows": 12 * n_chunks}
    results = {}
    for label, it, m in (("iter1_m5", 1, 5), ("iter5_m5", 5, 5),
                         ("iter15_m5", 15, 5), ("iter15_m1", 15, 1),
                         ("iter15_m10", 15, 10), ("iter1_m1", 1, 1)):
        cfg = replace(base, solver=replace(base.solver, max_iter=it,
                                           history_size=m))
        opt = SequenceOptimizer(model, v1, v2, cfg)
        staged = opt.stage(chunks)
        t0 = time.perf_counter()
        jax.block_until_ready(
            opt.optimize_chunks_batched(staged, mode="flat").optimized)
        compile_s = time.perf_counter() - t0
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            jax.block_until_ready(
                opt.optimize_chunks_batched(staged, mode="flat").optimized)
            ts.append(time.perf_counter() - t0)
        results[label] = {"launch_ms": round(1e3 * min(ts), 2),
                          "compile_s": round(compile_s, 1)}
        print(label, results[label], flush=True)

    r = results
    # two stages x max_iter iterations each
    slope_m5 = (r["iter15_m5"]["launch_ms"]
                - r["iter1_m5"]["launch_ms"]) / (2 * 14)
    slope_m1 = (r["iter15_m1"]["launch_ms"]
                - r["iter1_m1"]["launch_ms"]) / (2 * 14)
    slope_m10 = (r["iter15_m10"]["launch_ms"]
                 - r["iter1_m5"]["launch_ms"]) / (2 * 14)  # approx
    out["results"] = results
    out["per_stage_iter_ms_m5"] = round(slope_m5, 3)
    out["per_stage_iter_ms_m1"] = round(slope_m1, 3)
    out["per_stage_iter_ms_m10_approx"] = round(slope_m10, 3)
    out["direction_ms_per_iter_m5_vs_m1"] = round(slope_m5 - slope_m1, 3)
    out["intercept_ms_at_iter1"] = r["iter1_m5"]["launch_ms"]
    with open(os.path.join(REPO, "iter_decomp_r3.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
