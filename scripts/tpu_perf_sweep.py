"""TPU performance sweep over solver / sampling / batching configurations.

Times the full two-stage optimization of N synthetic chunks for each
configuration and prints a table, so optimization decisions are measured,
not guessed.  Run on the TPU:  python scripts/tpu_perf_sweep.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from globalegomocap_tpu.config import (
        OptimizeConfig, PriorConfig, SolverConfig)
    from globalegomocap_tpu.data.synthetic import synthetic_chunk
    from globalegomocap_tpu.optimize.driver import (
        SequenceOptimizer, build_model)
    from globalegomocap_tpu.optimize.window import num_windows

    n_chunks = int(os.environ.get("SWEEP_CHUNKS", "5"))
    chunks = [synthetic_chunk(100, seed=i) for i in range(n_chunks)]
    wins = num_windows(100) * n_chunks

    # pre-stage on device: measure optimization, not tunnel transfers
    from globalegomocap_tpu.data.test_data import TestChunk
    chunks = [TestChunk(*(jax.device_put(jnp.asarray(a)) for a in c))
              for c in chunks]

    prior = PriorConfig(latent_dim=2048, seq_len=10)
    model_cache = {}

    def measure(solver: str, sampling: str, mode: str):
        cfg = OptimizeConfig(prior=prior,
                             solver=SolverConfig(method=solver),
                             sampling_impl=sampling)
        key = "model"
        if key not in model_cache:
            m = build_model(cfg)
            x0 = jnp.zeros((1, 10, 45))
            model_cache[key] = (
                m,
                m.init(jax.random.PRNGKey(0), x0, False),
                m.init(jax.random.PRNGKey(1), x0, False))
        model, v1, v2 = model_cache[key]
        opt = SequenceOptimizer(model, v1, v2, cfg)

        def run_all():
            if mode == "batched":
                out = opt.optimize_chunks_batched(chunks)
                jax.block_until_ready(out.optimized)
                return out
            outs = [opt.optimize_chunk(c) for c in chunks]
            for o in outs:
                jax.block_until_ready(o.optimized)
            return outs[0]

        t0 = time.perf_counter()
        run_all()
        compile_s = time.perf_counter() - t0
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            run_all()
            times.append(time.perf_counter() - t0)
        best = min(times)
        # quality proxy: quick per-config MPJPE on chunk 0
        errors, *_ = opt.run(chunks[0])
        return {
            "solver": solver, "sampling": sampling, "mode": mode,
            "windows_per_sec": round(wins / best, 2),
            "best_s": round(best, 3), "compile_s": round(compile_s, 1),
            "opt_mpjpe": round(float(errors["optimized_global_mpjpe"]), 4),
            "orig_mpjpe": round(float(errors["original_global_mpjpe"]), 4),
        }

    import json as _json
    default_configs = [
        ("lbfgs", "dense", "serial"),
        ("lbfgs_fixed", "dense", "serial"),
        ("lbfgs_fixed", "dense", "batched"),
        ("lbfgs_fixed", "pallas", "serial"),
        ("lbfgs_fixed", "gather", "serial"),
        ("lbfgs", "gather", "serial"),
        ("adam", "dense", "serial"),
    ]
    env_cfg = os.environ.get("SWEEP_CONFIGS")
    configs = _json.loads(env_cfg) if env_cfg else default_configs
    results = []
    for solver, sampling, mode in configs:
        try:
            r = measure(solver, sampling, mode)
        except Exception as e:  # keep sweeping past a broken config
            r = {"solver": solver, "sampling": sampling, "mode": mode,
                 "error": repr(e)[:200]}
        results.append(r)
        print(json.dumps(r), flush=True)

    with open(os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "perf_sweep.json"), "w") as f:
        json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
