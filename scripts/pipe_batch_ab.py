"""Pipelined-batch re-sweep at the bf16 production point (VERDICT r3 #3).

The per-mode batch question: the synced headline optimum is c320 (the
staged-heat flat contract lifted the staging OOM and the synced curve
plateaus there, unroll_chunks_flat*.json), but with f32 compute the
PIPELINED curve peaked at c112 (~26-27k) and sat ~24.8k at c320.  The
bf16-compute default then measured 31.8k pipelined at c320
(c320_dtype_rematch_ab.json) — above the old f32 c112 peak — so the
pipelined optimum must be re-swept at the new operating point before
bench.py's BENCH_PIPELINE_CHUNKS default is chosen.

Arms (production config: bf16 compute + bf16 heat + conv + iter12/m3 +
s2=3 + unroll5, 16-unique tiled pools — launch timing is
data-independent at static shapes):

  sanity_c320    known-config point, gated against the committed healthy
                 range (27.3k w/s, c320_dtype_rematch_ab.json) before
                 any arm is trusted (degraded-claim trap)
  c64/c112/c160/c224   the pipelined-curve sweep (synced recorded too)
  depth sweep    at the pipelined winner: depth 4 (the committed
                 figure's shape) vs 6 vs 8 — is the 4-deep window
                 leaving overlap on the table?

Run on TPU: python scripts/pipe_batch_ab.py -> pipe_batch_ab.json
Envs: AB_OUT, AB_POOL_UNIQUE (default 16).
"""

from __future__ import annotations

import os
import sys
import time

from _ab_harness import (build_prior_pair, make_pool, production_base,
                         run_arm, time_arm, write_out)


def main():
    import jax

    from globalegomocap_tpu.optimize.driver import SequenceOptimizer
    from globalegomocap_tpu.optimize.window import num_windows

    uniq = int(os.environ.get("AB_POOL_UNIQUE", "16"))
    base = production_base(history_size=3)  # artifact predates the m2 tier
    model, v1, v2 = build_prior_pair(base)
    wpc = num_windows(100)

    out = {"pool_unique": uniq, "results": {}}

    def flush():
        write_out(out, "pipe_batch_ab.json")

    # ---- session sanity at the committed healthy point -----------------
    pool320 = make_pool(320, unique=uniq)
    rec = run_arm(model, v1, v2, base, pool320, wpc * 320)
    out["results"]["sanity_c320"] = {**rec, "chunks": 320}
    flush()
    healthy = 27278.0  # c320_dtype_rematch_ab.json conv_bf16compute
    if rec["windows_per_sec"] < healthy / 1.5:
        out["session_degraded"] = True
        print(f"SESSION DEGRADED: sanity_c320 {rec['windows_per_sec']} "
              f"vs healthy {healthy} — arms below are untrustworthy",
              flush=True)
        flush()

    # ---- pipelined batch sweep ------------------------------------------
    best_lbl, best_pipe = "sanity_c320", rec["pipelined_windows_per_sec"]
    for c in (64, 112, 160, 224):
        pool = pool320[:c]           # prefix: same device buffers
        r = run_arm(model, v1, v2, base, pool, wpc * c)
        out["results"][f"c{c}"] = {**r, "chunks": c}
        flush()
        if r["pipelined_windows_per_sec"] > best_pipe:
            best_lbl, best_pipe = f"c{c}", r["pipelined_windows_per_sec"]
        print(f"c{c}: {r['windows_per_sec']} synced / "
              f"{r['pipelined_windows_per_sec']} pipelined", flush=True)

    # ---- depth sweep at the pipelined winner ----------------------------
    cbest = 320 if best_lbl == "sanity_c320" else int(best_lbl[1:])
    opt = SequenceOptimizer(model, v1, v2, base)
    staged = opt.stage(pool320[:cbest])
    wins = wpc * cbest
    jax.block_until_ready(
        opt.optimize_chunks_batched(staged, mode="flat").optimized)
    for depth in (4, 6, 8):
        t0 = time.perf_counter()
        rs = [opt.optimize_chunks_batched(staged, mode="flat")
              for _ in range(depth)]
        for r in rs:
            jax.block_until_ready(r.optimized)
        per = (time.perf_counter() - t0) / depth
        out["results"][f"depth{depth}_{best_lbl}"] = {
            "pipelined_windows_per_sec": round(wins / per, 1),
            "depth": depth, "chunks": cbest}
        flush()
        print(f"depth{depth} at {best_lbl}: {round(wins / per, 1)}",
              flush=True)

    out["pipelined_winner"] = best_lbl
    flush()
    print("wrote pipe_batch_ab.json", flush=True)


if __name__ == "__main__":
    main()
