"""Decompose the per-launch FIXED cost of the flat two-stage solve.

perf_levers_r2c.json showed max_iter 25->15 (40% fewer solver iterations)
saves only ~7% wall-clock: fitting slope/intercept over iter {15,20,25}
gives ~0.8 ms per stage-iteration and a ~185 ms intercept — ~82% of the
launch is NOT solver iterations.  Candidate components:
  (a) tunnel round-trip latency per host sync (block_until_ready / float()),
  (b) the crop-guard's BLOCKING scalar readback inside
      SequenceOptimizer._effective_cfg (a full RTT mid-launch),
  (c) the four jnp.stack input dispatches (~500 MB of heatmaps),
  (d) the compiled program's own non-iteration work (encode, crop
      extraction, lift, merge).

Run on the TPU:  python scripts/fixed_cost_probe.py
Writes fixed_cost_probe.json at the repo root.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def timeit(fn, n=5):
    fn()  # warm
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return min(ts)


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

    out = {}
    n_chunks = int(os.environ.get("PROBE_CHUNKS", "20"))
    chunks = [synthetic_chunk(100, seed=i) for i in range(n_chunks)]
    wins = num_windows(100) * n_chunks
    chunks = [TestChunk(*(jax.device_put(jnp.asarray(a)) for a in c))
              for c in chunks]

    # (a) pure dispatch+sync round trip of a trivial program
    one = jax.device_put(jnp.ones(()))
    trivial = jax.jit(lambda x: x + 1.0)
    jax.block_until_ready(trivial(one))
    out["rtt_trivial_sync_ms"] = round(1e3 * timeit(
        lambda: jax.block_until_ready(trivial(one)), n=10), 2)

    # (c) the four input stacks (as optimize_chunks_batched does each call)
    def stacks():
        est = jnp.stack([c.estimated_local for c in chunks])
        cams = jnp.stack([c.camera_poses for c in chunks])
        heat = jnp.stack([c.heatmaps for c in chunks])
        gt = jnp.stack([c.gt_global for c in chunks])
        jax.block_until_ready((est, cams, heat, gt))
        return est, cams, heat, gt
    out["input_stacks_ms"] = round(1e3 * timeit(stacks, n=5), 2)
    est, cams, heat, gt = stacks()

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

    opt = SequenceOptimizer(model, v1, v2, base)

    # (b) the crop guard alone (includes its blocking float() readback)
    out["crop_guard_ms"] = round(1e3 * timeit(
        lambda: opt._effective_cfg(heat), n=5), 2)

    # full driver path (stacks + guard + program + sync), legacy list input
    def full():
        res = opt.optimize_chunks_batched(chunks, mode="flat")
        jax.block_until_ready(res.optimized)
    t0 = time.perf_counter()
    full()
    out["compile_s"] = round(time.perf_counter() - t0, 1)
    out["full_driver_ms"] = round(1e3 * timeit(full, n=3), 2)

    # staged serving path: stage() once, then one launch + one sync/call
    staged = opt.stage(chunks)
    def staged_call():
        res = opt.optimize_chunks_batched(staged, mode="flat")
        jax.block_until_ready(res.optimized)
    out["staged_driver_ms"] = round(1e3 * timeit(staged_call, n=5), 2)
    out["windows_per_sec_staged"] = round(
        wins / (out["staged_driver_ms"] / 1e3), 1)

    # pipelined: 4 launches in flight, one sync — steady-state serving
    def pipelined():
        rs = [opt.optimize_chunks_batched(staged, mode="flat")
              for _ in range(4)]
        for r in rs:
            jax.block_until_ready(r.optimized)
    out["pipelined4_ms_per_launch"] = round(1e3 * timeit(pipelined, n=3) / 4,
                                            2)
    out["windows_per_sec_pipelined"] = round(
        wins / (out["pipelined4_ms_per_launch"] / 1e3), 1)

    # (d) the compiled program ONLY, inputs pre-staged, single sync
    staged2 = opt.stage(chunks)
    jitted = next(v for k, v in opt._jit_cache.items()
                  if isinstance(k, tuple) and k[0] == "batched")
    def program_only():
        res = jitted(opt.local_variables, opt.global_variables,
                     staged2.est, staged2.cams, staged2.heat, staged2.gt,
                     staged2.origins)
        jax.block_until_ready(res.optimized)
    out["program_only_ms"] = round(1e3 * timeit(program_only, n=5), 2)
    out["windows_per_sec_program_only"] = round(
        wins / (out["program_only_ms"] / 1e3), 1)

    # iteration slope of the program itself: max_iter=1 variant
    opt1 = SequenceOptimizer(model, v1, v2, with_overrides(
        base, solver=solver(max_iter=1)))
    t0 = time.perf_counter()
    res = opt1.optimize_chunks_batched(chunks, mode="flat")
    jax.block_until_ready(res.optimized)
    out["compile_iter1_s"] = round(time.perf_counter() - t0, 1)
    jit1 = next(v for k, v in opt1._jit_cache.items()
                if isinstance(k, tuple) and k[0] == "batched")
    staged1 = opt1.stage(chunks)
    def program_iter1():
        res = jit1(opt1.local_variables, opt1.global_variables,
                   staged1.est, staged1.cams, staged1.heat, staged1.gt,
                   staged1.origins)
        jax.block_until_ready(res.optimized)
    out["program_iter1_ms"] = round(1e3 * timeit(program_iter1, n=5), 2)

    per_iter = (out["program_only_ms"] - out["program_iter1_ms"]) / 48.0
    out["per_stage_iteration_ms"] = round(per_iter, 3)
    out["program_intercept_ms"] = round(
        out["program_iter1_ms"] - 2 * per_iter, 2)

    print(json.dumps(out, indent=1), flush=True)
    with open(os.path.join(REPO, "fixed_cost_probe.json"), "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
