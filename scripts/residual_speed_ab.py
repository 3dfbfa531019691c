"""Speed A/B: residual vs plain stage-2 parametrization at the fused
production point (40 staged chunks / 480 windows, iter15/m5/K2/crop8).
Measured 2026-08-17: residual is speed-NEUTRAL (8777 vs 8334 w/s).

Run on TPU: python scripts/residual_speed_ab.py -> residual_speed_ab.json
"""
import json, os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np

def main():
    import jax, jax.numpy as jnp
    from dataclasses import replace
    from globalegomocap_tpu.config import (EnergyConfig, OptimizeConfig, PriorConfig, SolverConfig)
    from globalegomocap_tpu.data.synthetic import synthetic_chunk
    from globalegomocap_tpu.data.test_data import TestChunk
    from globalegomocap_tpu.optimize.driver import SequenceOptimizer, build_model

    base = OptimizeConfig(
        prior=PriorConfig(latent_dim=2048, seq_len=10),
        energy=EnergyConfig(global_weight_3d=1.0),
        solver=SolverConfig(method="lbfgs_fixed", fused_probes=True,
                            history_size=5, max_iter=15,
                            step_candidates=(1.0, 0.1), fused_energy=True),
        sampling_impl="dense", heatmap_crop=8,
        fold_bn=True, dense_decoder=True, decoder_impl="shift")
    model = build_model(base)
    x0 = jnp.zeros((1, 10, 45))
    v1 = model.init(jax.random.PRNGKey(0), x0, False)
    v2 = model.init(jax.random.PRNGKey(1), x0, False)
    chunks = [TestChunk(*(jax.device_put(jnp.asarray(a))
                          for a in synthetic_chunk(100, seed=i))) for i in range(40)]
    out = {}
    for label, res_flag in (("plain", False), ("residual", True)):
        cfg = replace(base, energy=replace(base.energy, global_residual=res_flag))
        opt = SequenceOptimizer(model, v1, v2, cfg)
        staged = opt.stage(chunks)
        t0 = time.perf_counter()
        jax.block_until_ready(opt.optimize_chunks_batched(staged, mode="flat").optimized)
        comp = time.perf_counter() - t0
        ts = []
        for _ in range(6):
            t0 = time.perf_counter()
            jax.block_until_ready(opt.optimize_chunks_batched(staged, mode="flat").optimized)
            ts.append(time.perf_counter() - t0)
        out[label] = {"best_ms": round(1e3*min(ts),1), "median_ms": round(1e3*sorted(ts)[3],1),
                      "wps": round(480/min(ts),1), "compile_s": round(comp,1)}
        print(label, out[label], flush=True)
    json.dump(out, open(os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "residual_speed_ab.json"), "w"), indent=1)

main()
