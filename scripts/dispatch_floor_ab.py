"""Per-iteration dispatch-floor attack at the bf16 point (VERDICT r3 #5).

iter_decomp_r3.json measured each stage iteration at ~0.9-0.97 ms across
~26-30 XLA fusions (f32): eval ~0.77 ms (decode fwd+bwd dominates) +
direction/bookkeeping ~0.2 ms at m5.  The bf16-compute default roughly
halves the eval math, so the NON-eval fraction (history bookkeeping,
candidate select, scan plumbing) has grown since every structural knob
was last tuned at f32.  Re-sweep the two knobs that trade against that
floor:

  unroll (scan unroll factor): u5 won at f32 (+7-9%, unroll_chunks_ab) —
      with cheaper math per iteration, deeper unrolling (u8) may now
      amortize more dispatch, or the compile blow-up may still lose.
  history m: bookkeeping cost scaled 0.76 -> 1.48 ms/iter from m1 to
      m10 (iter_decomp_r3); m3 is the quality-gated fast tier.  m2 is a
      SPEED arm only — if it wins materially it must pass
      quality_iter_crop gates before any default changes.

Arms (production bf16 config, c320, 16-unique tiled pool):
  sanity_c320 (gate vs 27.3k healthy) / u1 / u3 / u8 (u5 = sanity) / m2

Run on TPU: python scripts/dispatch_floor_ab.py -> dispatch_floor_ab.json
Envs: AB_OUT, AB_POOL_UNIQUE (default 16).
"""

from __future__ import annotations

import os
from dataclasses import replace

from _ab_harness import (build_prior_pair, make_pool, production_base,
                         run_arm, write_out)


def main():
    from globalegomocap_tpu.optimize.window import num_windows

    uniq = int(os.environ.get("AB_POOL_UNIQUE", "16"))
    base = production_base(history_size=3)  # the artifact's base tier
    model, v1, v2 = build_prior_pair(base)
    c = int(os.environ.get("AB_CHUNKS", "320"))
    pool = make_pool(c, unique=uniq)
    wins = num_windows(100) * c

    out = {"pool_unique": uniq, "chunks": c, "results": {}}

    def flush():
        write_out(out, "dispatch_floor_ab.json")

    rec = run_arm(model, v1, v2, base, pool, wins)
    out["results"]["sanity_c320_u5_m3"] = rec
    flush()
    healthy = 27278.0  # c320_dtype_rematch_ab.json conv_bf16compute
    if rec["windows_per_sec"] < healthy / 1.5:
        out["session_degraded"] = True
        print(f"SESSION DEGRADED: {rec['windows_per_sec']} vs {healthy}",
              flush=True)
        flush()
    print(f"sanity u5_m3: {rec['windows_per_sec']} synced", flush=True)

    for u in (1, 3, 8):
        cfg = replace(base, solver=replace(base.solver, unroll=u))
        r = run_arm(model, v1, v2, cfg, pool, wins)
        out["results"][f"u{u}_m3"] = r
        flush()
        print(f"u{u}: {r['windows_per_sec']} synced / "
              f"{r['pipelined_windows_per_sec']} pipelined "
              f"(compile {r['compile_s']}s)", flush=True)

    cfg = replace(base, solver=replace(base.solver, history_size=2))
    r = run_arm(model, v1, v2, cfg, pool, wins)
    out["results"]["u5_m2_SPEED_ONLY"] = r
    flush()
    print(f"m2: {r['windows_per_sec']} synced", flush=True)


if __name__ == "__main__":
    main()
