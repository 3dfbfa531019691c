"""Round-2g: the LANE-BLOCKED Pallas two-loop direction (custom_vmap
rule, 8 lanes/instance) vs the XLA loop at the current default operating
point (staged, iter15, m5, K2, crop8, batch 40) and at m10 (where the
two-loop share is larger).

The per-lane variant was 30% SLOWER (perf_levers_r2d.json: one lane per
grid instance forfeits cross-lane VPU vectorization); the blocked rule
restores (LB, d) reduction shapes.

Run on the TPU:  python scripts/perf_levers_r2g.py
Writes perf_levers_r2g.json at the repo root.
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

    from globalegomocap_tpu.config import (
        OptimizeConfig, PriorConfig, SolverConfig, with_overrides)
    from globalegomocap_tpu.data.synthetic import synthetic_chunk
    from globalegomocap_tpu.data.test_data import TestChunk
    from globalegomocap_tpu.optimize.driver import (
        SequenceOptimizer, build_model)
    from globalegomocap_tpu.optimize.window import num_windows

    n_chunks = int(os.environ.get("LEVERS_CHUNKS", "40"))
    chunks = [synthetic_chunk(100, seed=i) for i in range(n_chunks)]
    wins = num_windows(100) * n_chunks
    chunks = [TestChunk(*(jax.device_put(jnp.asarray(a)) for a in c))
              for c in chunks]

    def solver(**kw):
        kw.setdefault("history_size", 5)
        kw.setdefault("max_iter", 15)
        kw.setdefault("step_candidates", (1.0, 0.1))
        return SolverConfig(method="lbfgs_fixed", fused_probes=True, **kw)

    base = OptimizeConfig(
        prior=PriorConfig(latent_dim=2048, seq_len=10),
        solver=solver(), sampling_impl="dense", fold_bn=True,
        dense_decoder=True, decoder_impl="shift", heatmap_crop=8)

    model = build_model(base)
    x0 = jnp.zeros((1, 10, 45))
    v1 = model.init(jax.random.PRNGKey(0), x0, False)
    v2 = model.init(jax.random.PRNGKey(1), x0, False)

    results = []

    def measure(name, cfg):
        opt = SequenceOptimizer(model, v1, v2, cfg)
        staged = opt.stage(chunks)

        def run_all():
            out = opt.optimize_chunks_batched(staged, mode="flat")
            jax.block_until_ready(out.optimized)

        t0 = time.perf_counter()
        run_all()
        compile_s = time.perf_counter() - t0
        times = []
        for _ in range(5):
            t0 = time.perf_counter()
            run_all()
            times.append(time.perf_counter() - t0)
        best = min(times)
        rec = {"lever": name, "windows_per_sec": round(wins / best, 1),
               "best_s": round(best, 4), "compile_s": round(compile_s, 1)}
        print(json.dumps(rec), flush=True)
        results.append(rec)
        with open(os.path.join(REPO, "perf_levers_r2g.json"), "w") as f:
            json.dump(results, f, indent=1)

    measure("m5_K2_base", base)
    measure("m5_K2_pallas_blocked", with_overrides(
        base, solver=solver(pallas_direction=True)))
    measure("m10_K2_base", with_overrides(
        base, solver=solver(history_size=10)))
    measure("m10_K2_pallas_blocked", with_overrides(
        base, solver=solver(history_size=10, pallas_direction=True)))


if __name__ == "__main__":
    main()
