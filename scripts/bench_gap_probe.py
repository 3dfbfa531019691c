"""Root-cause probe for the bench-vs-A/B headline gap (VERDICT r3 #1).

Two rounds of official benches recorded ~20.2-20.7k w/s synced at the
production c320 point while c320_dtype_rematch_ab recorded 27.3k (bf16)
in its session — and every LATER session (heat_dtype_ab 20.9k,
heat_ceiling 21.6-22.3k, pipe_batch/dispatch_floor 20.6-20.8k) sits at
~21k for the same nominal config.  Two hypotheses, separated in ONE
process:

  1. POOL SHAPE: A/Bs tile 16 unique chunks (same device buffers);
     bench stages 320 distinct ones.  Launch timing should be
     data-independent at static shapes — tiled_u16 vs distinct arms.
  2. MIXED-PRECISION REGRESSION: the 27.3k arm ran at commit b96df6d,
     BEFORE f2aab3e made compute_dtype=bfloat16 mean MIXED precision
     (f32 encode + f32 output decode/offset).  The bfloat16_pure arm
     restores the pre-f2aab3e all-bf16 semantics; bfloat16_f32enc keeps
     only the encode f32 (the quality evidence localized the bone drift
     to the bf16-encoded init mu, not the output decode).  An f32
     compute arm calibrates session health against its 21957 committed
     figure (same-session ratio beats cross-session absolutes).

Run on TPU: python scripts/bench_gap_probe.py -> bench_gap_probe.json
"""

from __future__ import annotations

import os
from dataclasses import replace

from _ab_harness import (build_prior_pair, make_pool, production_base,
                         run_arm, write_out)


def main():
    from globalegomocap_tpu.optimize.window import num_windows

    n = int(os.environ.get("AB_CHUNKS", "320"))
    wins = num_windows(100) * n
    base = production_base(history_size=3)  # artifact predates the m2 tier
    model, v1, v2 = build_prior_pair(base)
    pool = make_pool(n, unique=16)

    out = {"chunks": n, "results": {}}

    def arm(label, cfg, chunks):
        # the activation dtype lives on the MODEL instance (params stay
        # f32, so v1/v2 transfer) — rebuild when the tier flips f32<->bf16
        m = model
        if cfg.compute_dtype.startswith("bfloat16") != \
                base.compute_dtype.startswith("bfloat16"):
            from globalegomocap_tpu.optimize.driver import build_model
            m = build_model(cfg)
        rec = run_arm(m, v1, v2, cfg, chunks, wins)
        out["results"][label] = rec
        print(label, rec, flush=True)
        write_out(out, "bench_gap_probe.json")

    arm("tiled_prod_mixed", base, pool)
    arm("tiled_pure_bf16", replace(base, compute_dtype="bfloat16_pure"),
        pool)
    arm("tiled_f32enc", replace(base, compute_dtype="bfloat16_f32enc"),
        pool)
    arm("tiled_f32", replace(base, compute_dtype="float32"), pool)
    distinct = make_pool(n, unique=0)
    arm("distinct_prod_mixed", base, distinct)


if __name__ == "__main__":
    main()
