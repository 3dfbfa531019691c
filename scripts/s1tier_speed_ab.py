"""Speed A/B of the stage-1 tier (max_iter x history) at the round-3
production point (conv decoder, fused kernels, residual s2=3, unroll5).

Quality evidence: quality_iter_crop_s1iter.json (clean corpus: iter12/m3
beats iter15/m5 on BOTH bone-aligned and raw-global) and _s1iter_v2.json
(guard-tripped corpora need >=15 iterations - the robust tier now
restores them).  This measures what the fast tier buys in launch time.

Run on TPU: python scripts/s1tier_speed_ab.py -> s1tier_speed_ab.json
"""

from __future__ import annotations

import os

from _ab_harness import (build_prior_pair, make_pool, production_base,
                         run_arm, write_out)


def main():
    from dataclasses import replace

    from globalegomocap_tpu.optimize.window import num_windows

    n_chunks = int(os.environ.get("AB_CHUNKS", "56"))
    tiers = [tuple(int(v) for v in x.split("x")) for x in
             os.environ.get("AB_TIERS", "15x5,12x5,12x3,10x3").split(",")]
    base = production_base(compute_dtype="float32",  # pre-bf16 artifact
                           history_size=3)
    model, v1, v2 = build_prior_pair(base)
    chunks = make_pool(n_chunks)
    wins = num_windows(100) * n_chunks

    out = {"chunks": n_chunks, "windows": wins, "results": {}}
    for it, m in tiers:
        label = f"iter{it}_m{m}"
        cfg = replace(base, solver=replace(base.solver, max_iter=it,
                                           history_size=m))
        out["results"][label] = run_arm(model, v1, v2, cfg, chunks, wins)
        print(label, out["results"][label], flush=True)

    write_out(out, "s1tier_speed_ab.json")


if __name__ == "__main__":
    main()
