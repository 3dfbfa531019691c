"""Decoder-implementation rematch at the round-3 production point.

The shift-vs-dense(-vs-conv) decoder verdicts were measured in round 2
PRE-mega-kernel (perf_levers_r2.json: shift 1095 vs dense 870), when the
eval also carried XLA sampling + energy kernels.  With the fused energy
kernel + unroll-5 solver the decode chain is ~80% of every eval
(eval_decomp.json), so the kernel-count-vs-HBM-traffic tradeoff between
the three exact decoder formulations (and their bf16-weight variants)
may land differently.  One session, same staged batch, all arms.

Run on TPU: python scripts/decoder_rematch_ab.py -> decoder_rematch_ab.json
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

    arms = (("shift", {"decoder_impl": "shift"}),
            ("dense", {"decoder_impl": "dense"}),
            ("conv", {"decoder_impl": "conv"}),
            ("shift_bf16", {"decoder_impl": "shift",
                            "decoder_dtype": "bfloat16"}),
            ("dense_bf16", {"decoder_impl": "dense",
                            "decoder_dtype": "bfloat16"}))
    sel = os.environ.get("AB_ARMS")
    if sel:
        want = set(sel.split(","))
        arms = tuple(a for a in arms if a[0] in want)

    out = {"chunks": n_chunks, "windows": wins, "results": {}}
    for label, overrides in arms:
        cfg = replace(base, **overrides)
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
                                                 "decoder_rematch_ab.json"))
    with open(dest, "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
