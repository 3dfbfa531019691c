"""Round-2c levers: solver-structure knobs re-measured on the NEW shift
default (the round-1 'compact_direction is slower' verdict was measured on
the dense-decoder config; the two-loop recursion is ~2m sequential tiny
kernels per iteration, which may now be the binding launch-count cost).

Run on the TPU:  python scripts/perf_levers_r2c.py
Writes perf_levers_r2c.json at the repo root.
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
        return SolverConfig(method="lbfgs_fixed", fused_probes=True,
                            history_size=10, **kw)

    base = OptimizeConfig(
        prior=PriorConfig(latent_dim=2048, seq_len=10),
        solver=solver(), sampling_impl="dense", fold_bn=True,
        dense_decoder=True, decoder_impl="shift", heatmap_crop=16)

    model = build_model(base)
    x0 = jnp.zeros((1, 10, 45))
    v1 = model.init(jax.random.PRNGKey(0), x0, False)
    v2 = model.init(jax.random.PRNGKey(1), x0, False)

    def measure(name, cfg):
        opt = SequenceOptimizer(model, v1, v2, cfg)

        def run_all():
            out = opt.optimize_chunks_batched(chunks, mode="flat")
            jax.block_until_ready(out.optimized)

        t0 = time.perf_counter()
        run_all()
        compile_s = time.perf_counter() - t0
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            run_all()
            times.append(time.perf_counter() - t0)
        best = min(times)
        rec = {"lever": name, "windows_per_sec": round(wins / best, 1),
               "best_s": round(best, 4), "compile_s": round(compile_s, 1)}
        print(json.dumps(rec), flush=True)
        return rec

    levers = [
        ("shift16_base", base),
        ("shift16_compact", with_overrides(
            base, solver=solver(compact_direction=True))),
        ("shift8_compact", with_overrides(
            base, heatmap_crop=8, solver=solver(compact_direction=True))),
        ("shift16_iter20", with_overrides(
            base, solver=solver(max_iter=20))),
        ("shift16_iter15", with_overrides(
            base, solver=solver(max_iter=15))),
        ("shift16_K3", with_overrides(
            base, solver=solver(step_candidates=(1.0, 0.3, 0.05)))),
    ]
    results = []
    for name, cfg in levers:
        try:
            results.append(measure(name, cfg))
        except Exception as e:
            results.append({"lever": name, "error": repr(e)[:200]})
            print(json.dumps(results[-1]), flush=True)

    with open(os.path.join(REPO, "perf_levers_r2c.json"), "w") as f:
        json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
