"""A/B: the fused post-decode energy mega-kernel vs the XLA path, at the
production operating point (VERDICT r2 #2's 'Done' criterion).

Config: headline defaults — 40 staged chunks x 100 frames (480 windows),
iter15 / m5 / K2 / crop8 / shift decoder / dense sampling / fold_bn,
global_weight_3d=1.0.  Measures synced windows/s over repeated staged
launches for fused_energy in {off, on}, plus a 4-deep pipelined figure.

Run on TPU: python scripts/fused_ab.py  ->  fused_ab.json
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

    n_chunks = int(os.environ.get("AB_CHUNKS", "40"))
    base = OptimizeConfig(
        prior=PriorConfig(latent_dim=2048, seq_len=10),
        energy=EnergyConfig(global_weight_3d=1.0),
        solver=SolverConfig(method="lbfgs_fixed", fused_probes=True,
                            history_size=5, max_iter=15,
                            step_candidates=(1.0, 0.1)),
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

    out = {"chunks": n_chunks, "windows": wins}
    results = {}
    arms = (("xla", {}),
            ("batched_solver", {"batched_solver": True}),
            ("fused_kernel", {"fused_energy": True}),
            ("fused_decode", {"fused_energy": True,
                              "fused_decode": True}))
    sel = os.environ.get("AB_ARMS")       # e.g. "fused_kernel,fused_decode"
    if sel:
        want = set(sel.split(","))
        arms = tuple(a for a in arms if a[0] in want)
    for label, overrides in arms:
        cfg = replace(base, solver=replace(base.solver, **overrides))
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
        # pipelined: 4 launches in flight
        t0 = time.perf_counter()
        rs = [opt.optimize_chunks_batched(staged, mode="flat")
              for _ in range(4)]
        for r in rs:
            jax.block_until_ready(r.optimized)
        pipe = (time.perf_counter() - t0) / 4
        results[label] = {
            "windows_per_sec": round(wins / min(ts), 1),
            "best_s": round(min(ts), 4),
            "median_s": round(sorted(ts)[len(ts) // 2], 4),
            "pipelined_windows_per_sec": round(wins / pipe, 1),
            "compile_s": round(compile_s, 1),
            "optimized_mean": float(np.mean(np.asarray(res.optimized))),
        }
        print(label, results[label], flush=True)
    out["results"] = results
    if "xla" in results:
        a = results["xla"]["windows_per_sec"]
        for lbl in ("batched_solver", "fused_kernel", "fused_decode"):
            if lbl in results:
                out[f"speedup_{lbl}"] = round(
                    results[lbl]["windows_per_sec"] / a, 3)
    dest = os.environ.get("AB_OUT", os.path.join(REPO, "fused_ab.json"))
    with open(dest, "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
