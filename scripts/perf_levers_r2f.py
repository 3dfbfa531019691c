"""Round-2f levers at the new operating point (staged, iter15, m=5,
crop8, batch 40): decoder impl re-test (the shift-vs-dense ranking was
measured at batch 240/m10/iter25 — kernel-count economics shift with
4x the batch), batch fine-tune between 40 and 80, and the K-candidate
winner from quality_iter_crop_k3.json.

Run on the TPU:  python scripts/perf_levers_r2f.py
Writes perf_levers_r2f.json at the repo root.
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
        kw.setdefault("history_size", 5)
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

    def measure(name, cfg, n_chunks=40):
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
        t0 = time.perf_counter()
        outs = [opt.optimize_chunks_batched(staged, mode="flat")
                for _ in range(4)]
        for o in outs:
            jax.block_until_ready(o.optimized)
        rec["pipelined_wps"] = round(4 * wins / (time.perf_counter() - t0),
                                     1)
        print(json.dumps(rec), flush=True)
        results.append(rec)
        with open(os.path.join(REPO, "perf_levers_r2f.json"), "w") as f:
            json.dump(results, f, indent=1)

    measure("b40_shift", base)
    measure("b40_dense", with_overrides(base, decoder_impl="dense"))
    measure("b40_conv", with_overrides(base, decoder_impl="conv"))
    measure("b56_shift", base, n_chunks=56)
    measure("b40_shift_K2", with_overrides(
        base, solver=solver(step_candidates=(1.0, 0.1))))
    measure("b40_shift_K3", with_overrides(
        base, solver=solver(step_candidates=(1.0, 0.5, 0.1))))


if __name__ == "__main__":
    main()
