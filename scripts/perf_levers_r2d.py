"""Round-2d levers on the staged fast path (stage-time crops, iter15
default): the Pallas fused two-loop direction kernel vs the XLA loop, at
iter15 and iter25, crop16 and crop8.

intercept_probe.json attributes 0.614 of 1.73 ms/stage-iteration to the
two-loop + history rolls (m10-vs-m1 slope); the fused kernel
(ops/pallas/lbfgs_direction.py) replaces ~2m sequential launches with one.

Run on the TPU:  python scripts/perf_levers_r2d.py
Writes perf_levers_r2d.json at the repo root.
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

    n_chunks = int(os.environ.get("LEVERS_CHUNKS", "20"))
    chunks = [synthetic_chunk(100, seed=i) for i in range(n_chunks)]
    wins = num_windows(100) * n_chunks
    chunks = [TestChunk(*(jax.device_put(jnp.asarray(a)) for a in c))
              for c in chunks]

    def solver(**kw):
        kw.setdefault("history_size", 10)
        kw.setdefault("max_iter", 15)
        return SolverConfig(method="lbfgs_fixed", fused_probes=True, **kw)

    base = OptimizeConfig(
        prior=PriorConfig(latent_dim=2048, seq_len=10),
        solver=solver(), sampling_impl="dense", fold_bn=True,
        dense_decoder=True, decoder_impl="shift", heatmap_crop=16)

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
        with open(os.path.join(REPO, "perf_levers_r2d.json"), "w") as f:
            json.dump(results, f, indent=1)

    measure("iter15_crop16_base", base)
    measure("iter15_crop16_pallas_dir", with_overrides(
        base, solver=solver(pallas_direction=True)))
    measure("iter25_crop16_pallas_dir", with_overrides(
        base, solver=solver(max_iter=25, pallas_direction=True)))
    measure("iter15_crop8_pallas_dir", with_overrides(
        base, heatmap_crop=8, solver=solver(pallas_direction=True)))
    measure("iter15_crop8_base", with_overrides(base, heatmap_crop=8))


if __name__ == "__main__":
    main()
