"""A/B: solver-scan unroll factor and chunk-count re-sweep at the fused
production point (round-3 defaults: fused_energy + residual stage 2).

Motivation (iter_decomp_r3.json): the pipelined launch is ~37.6 ms of
program = ~9 ms intercept + 30 stage-iterations x 0.965 ms, and each
iteration is ~26-30 kernel dispatches — the path is dispatch-bound, not
FLOP-bound.  Two levers that only move fixed/dispatch overheads:
  * lax.scan unroll: XLA can fuse across iteration boundaries and drops
    per-trip loop overhead, at the cost of program size / compile time.
  * chunk count: RTT + intercept amortize over more windows per launch
    ("40 optimal, 56/80 over-saturate" was measured PRE-mega-kernel at
    perf_levers_r2e.json — the balance moves when the per-iteration cost
    halves).

Config: bench.py production defaults — latent 2048, shift decoder,
fold_bn, crop8, dense sampling, fused_probes, m5, iter15, K2,
fused_energy, global_residual.  SANITY: the first arm is the known
production point (unroll1 x 40 chunks ≈ 55-62 ms synced / 480 windows);
if it reads >2x slow the process is in the degraded-claim regime
(CLAUDE.md) and every number here is invalid — rerun in a fresh process.

Run on TPU: python scripts/unroll_chunks_ab.py  ->  unroll_chunks_ab.json
Env: AB_UNROLLS="1,2,3,5"  AB_CHUNKSETS="40,56,80"  AB_OUT=...
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

    unrolls = [int(x) for x in
               os.environ.get("AB_UNROLLS", "1,3,5").split(",")]
    chunksets = [int(x) for x in
                 os.environ.get("AB_CHUNKSETS", "40,56,80").split(",")]

    # base = the CURRENT production defaults.  The committed
    # unroll_chunks_ab*.json artifacts were measured at the r3-midpoint
    # defaults (shift decoder, iter15/m5, shared stage-2 budget) — set
    # AB_BASE=r3mid to reproduce those arms.
    r3mid = os.environ.get("AB_BASE", "") == "r3mid"
    base = OptimizeConfig(
        prior=PriorConfig(latent_dim=2048, seq_len=10),
        energy=EnergyConfig(global_weight_3d=1.0, global_residual=True),
        solver=SolverConfig(method="lbfgs_fixed", fused_probes=True,
                            history_size=5 if r3mid else 3,
                            max_iter=15 if r3mid else 12,
                            global_max_iter=None if r3mid else 3,
                            step_candidates=(1.0, 0.1),
                            fused_energy=True),
        sampling_impl="dense", heatmap_crop=8,
        fold_bn=True, dense_decoder=True,
        # AB_COMPUTE_DTYPE=bfloat16: bf16 solver evals (f32 encode/output
        # — pipeline mixed precision).  Halved eval activations may move
        # the chunk ceiling past the f32 plateau (c448) too.
        compute_dtype=os.environ.get("AB_COMPUTE_DTYPE", "float32"),
        decoder_impl="shift" if r3mid else "conv")
    model = build_model(base)
    x0 = jnp.zeros((1, 10, 45))
    v1 = model.init(jax.random.PRNGKey(0), x0, False)
    v2 = model.init(jax.random.PRNGKey(1), x0, False)

    max_chunks = max(chunksets)
    # AB_POOL_UNIQUE=N > 0: build only N distinct chunks and cycle them to
    # fill each arm's batch.  Launch timing is data-independent (static
    # shapes, fixed iteration counts), repeated list entries bind the SAME
    # device buffer (no extra HBM), and the raw-map pool + tunnel transfer
    # stay bounded (~25 MB/unique chunk) — this is what makes 160-320
    # chunk arms practical now that flat staging no longer OOMs there.
    pool_unique = int(os.environ.get("AB_POOL_UNIQUE", "0"))
    if os.environ.get("AB_FREE_POOL", "0") == "1":
        all_chunks = []        # built per-arm and freed after staging
    elif pool_unique > 0:
        uniq = [TestChunk(*(jax.device_put(jnp.asarray(a))
                            for a in synthetic_chunk(100, seed=i)))
                for i in range(pool_unique)]
        all_chunks = [uniq[i % pool_unique] for i in range(max_chunks)]
    else:
        all_chunks = [TestChunk(*(jax.device_put(jnp.asarray(a))
                                  for a in synthetic_chunk(100, seed=i)))
                      for i in range(max_chunks)]

    out = {"results": {}}
    ref_mean = None

    # AB_FREE_POOL=1: drop the raw full-map chunk pool after staging —
    # production serving only keeps the staged crops resident; the pool
    # is a bench-harness artifact that otherwise caps the batch at ~112
    # chunks (2.8 GB of full maps + staged data in 16 GB HBM)
    free_pool = os.environ.get("AB_FREE_POOL", "0") == "1"

    def run_arm(label, n_chunks, unroll):
        nonlocal ref_mean, all_chunks
        cfg = replace(base, solver=replace(base.solver, unroll=unroll))
        opt = SequenceOptimizer(model, v1, v2, cfg)
        if free_pool:
            all_chunks = [TestChunk(*(jax.device_put(jnp.asarray(a))
                                      for a in synthetic_chunk(100,
                                                               seed=i)))
                          for i in range(n_chunks)]
        chunks = all_chunks[:n_chunks]
        wins = num_windows(100) * n_chunks
        staged = opt.stage(chunks)
        if free_pool:
            del chunks
            all_chunks = []
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
        mean = float(np.mean(np.asarray(res.optimized)))
        rec = {
            "chunks": n_chunks, "unroll": unroll, "windows": wins,
            "windows_per_sec": round(wins / min(ts), 1),
            "best_s": round(min(ts), 4),
            "median_s": round(sorted(ts)[len(ts) // 2], 4),
            "pipelined_windows_per_sec": round(wins / pipe, 1),
            "compile_s": round(compile_s, 1),
            "optimized_mean": mean,
        }
        # trajectory identity: unroll must not change the math (same
        # 40-chunk staged batch -> identical optimized output)
        if n_chunks == chunksets[0]:
            if ref_mean is None:
                ref_mean = mean
            else:
                rec["mean_matches_unroll1"] = bool(
                    abs(mean - ref_mean) < 1e-5)
        out["results"][label] = rec
        print(label, rec, flush=True)

    dest = os.environ.get("AB_OUT", os.path.join(REPO,
                                                 "unroll_chunks_ab.json"))

    def flush_out():
        # write after EVERY arm: a late-arm OOM (the c640 probe is an
        # intentional ceiling test) must not lose the earlier arms —
        # the committed _flat2 artifact had to be hand-assembled from
        # stdout after exactly that failure mode
        with open(dest, "w") as f:
            json.dump(out, f, indent=1)

    # SANITY arm first: known config point, unroll=1 x chunksets[0].
    # Healthy per-window launch time at u1 is ~0.10-0.13 ms/window for
    # the r3-mid base and ~0.065-0.075 for the r3-final base (measured
    # artifacts); >2x that means the degraded-claim regime (CLAUDE.md)
    # and every number in this run is invalid.
    run_arm(f"u1_c{chunksets[0]}", chunksets[0], 1)
    flush_out()
    first = out["results"][f"u1_c{chunksets[0]}"]
    out["sanity_best_s"] = first["best_s"]
    per_win_ms = 1e3 * first["best_s"] / first["windows"]
    if per_win_ms > (0.26 if r3mid else 0.15):
        out["DEGRADED_SESSION"] = True
        print(f"WARNING: sanity arm {per_win_ms:.3f} ms/window is >2x the "
              "healthy range — degraded claim; numbers invalid",
              flush=True)

    for u in unrolls:
        if u == 1:
            continue
        run_arm(f"u{u}_c{chunksets[0]}", chunksets[0], u)
        flush_out()
    cu = int(os.environ.get("AB_CHUNK_UNROLL", "1"))
    for c in chunksets[1:]:
        try:
            run_arm(f"u{cu}_c{c}", c, cu)
        except Exception as e:   # e.g. the intentional OOM ceiling probe
            out["results"][f"u{cu}_c{c}"] = {
                "error": f"{type(e).__name__}: {str(e)[:400]}"}
            print(f"u{cu}_c{c} FAILED: {type(e).__name__}", flush=True)
        flush_out()

    flush_out()


if __name__ == "__main__":
    main()
