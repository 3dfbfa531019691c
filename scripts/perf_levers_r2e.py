"""Round-2e levers: batch-size sweep + history size on the staged path.

After staged batches + stage-time crops (perf_levers_r2d.json base:
iter15_crop16 3035 / iter15_crop8 3312 w/s at 240 windows), a launch is
~31 ms fixed (24 RTT + 7 in-program) + ~1.4 ms/stage-iteration — so
larger flat batches amortize the fixed part, and history m=5 halves the
two-loop/roll share (0.614 ms/iter at m=10, intercept_probe.json).
Round-1 measured m=5 == m=10 throughput, but that was when launch fixed
costs masked the difference.

Run on the TPU:  python scripts/perf_levers_r2e.py
Writes perf_levers_r2e.json at the repo root.
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

    def make_chunks(n):
        cs = [synthetic_chunk(100, seed=i) for i in range(n)]
        return [TestChunk(*(jax.device_put(jnp.asarray(a)) for a in c))
                for c in cs], num_windows(100) * n

    def solver(**kw):
        kw.setdefault("history_size", 10)
        kw.setdefault("max_iter", 15)
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
    chunk_cache = {}

    def measure(name, cfg, n_chunks):
        if n_chunks not in chunk_cache:
            chunk_cache[n_chunks] = make_chunks(n_chunks)
        chunks, wins = chunk_cache[n_chunks]
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
        # pipelined (4 deep): steady-state serving throughput
        t0 = time.perf_counter()
        outs = [opt.optimize_chunks_batched(staged, mode="flat")
                for _ in range(4)]
        for o in outs:
            jax.block_until_ready(o.optimized)
        rec["pipelined_wps"] = round(4 * wins / (time.perf_counter() - t0),
                                     1)
        print(json.dumps(rec), flush=True)
        results.append(rec)
        with open(os.path.join(REPO, "perf_levers_r2e.json"), "w") as f:
            json.dump(results, f, indent=1)

    measure("crop8_b20", base, 20)
    measure("crop8_b40", base, 40)
    measure("crop8_b80", base, 80)
    measure("crop8_b20_m5", with_overrides(
        base, solver=solver(history_size=5)), 20)
    measure("crop8_b40_m5", with_overrides(
        base, solver=solver(history_size=5)), 40)
    measure("crop16_b40", with_overrides(base, heatmap_crop=16), 40)


if __name__ == "__main__":
    main()
