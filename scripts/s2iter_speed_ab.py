"""Speed A/B of the stage-2 iteration budget (solver.global_max_iter) at
the round-3 production point (conv decoder, fused kernels, residual
stage 2, unroll 5, 56 chunks).

Quality evidence lives in quality_iter_crop_s2iter.json (trained priors:
metrics identical to 5 decimals for s2 in {3..15} on the headline
corpus) and its v2-corpus variant; this measures what the budget buys in
launch time (each stage-2 iteration ~0.9 ms, iter_decomp_r3.json).

Run on TPU: python scripts/s2iter_speed_ab.py -> s2iter_speed_ab.json
"""

from __future__ import annotations

import os

from _ab_harness import (build_prior_pair, make_pool, production_base,
                         run_arm, write_out)


def main():
    from dataclasses import replace

    from globalegomocap_tpu.optimize.window import num_windows

    n_chunks = int(os.environ.get("AB_CHUNKS", "56"))
    s2_list = [None if x == "none" else int(x) for x in
               os.environ.get("AB_S2", "none,8,5,3").split(",")]
    # committed-artifact base: stage-1 tier iter15/m5 (the fast tier
    # landed AFTER s2iter_speed_ab.json was measured)
    base = production_base(compute_dtype="float32",  # pre-bf16 artifact
                           history_size=3)
    base = replace(base, solver=replace(base.solver, history_size=5,
                                        max_iter=15))
    model, v1, v2 = build_prior_pair(base)
    chunks = make_pool(n_chunks)
    wins = num_windows(100) * n_chunks

    out = {"chunks": n_chunks, "windows": wins, "results": {}}
    for s2 in s2_list:
        label = f"s2_{'same' if s2 is None else s2}"
        cfg = replace(base, solver=replace(base.solver,
                                           global_max_iter=s2))
        out["results"][label] = run_arm(model, v1, v2, cfg, chunks, wins)
        print(label, out["results"][label], flush=True)

    write_out(out, "s2iter_speed_ab.json")


if __name__ == "__main__":
    main()
