"""A/B: matmul merges (+ folded smoothing + direct-camera world lifts)
vs the scatter-merge path, at the round-3 production point (u5/c56).

intercept_probe_r3.json put lift at 0.82 ms and merge+smooth at 0.81 ms
per probe call — the two LARGEST intercept items, both linear maps with
static coefficients.  This measures the launch-level effect of
  * est/mid world lifts through C_i directly (cam0 . inv(cam0) . C_i
    collapses; unconditional — in both arms),
  * every merge as one static-matrix matmul with the gaussian smoothing
    folded into the optimized field's matrix (cfg.matmul_merge, the
    A/B'd knob).

SANITY: the mm arm at u5/c56 should sit near 9639 w/s (unroll_chunks_ab2)
if the session is healthy.

Run on TPU: python scripts/postprocess_ab.py  ->  postprocess_ab.json
"""

from __future__ import annotations

import json
import os

import numpy as np

from _ab_harness import (build_prior_pair, make_pool, production_base,
                         run_arm, write_out)


def main():
    from dataclasses import replace

    from globalegomocap_tpu.optimize.window import num_windows

    n_chunks = int(os.environ.get("AB_CHUNKS", "56"))
    # committed-artifact base: iter15/m5, shift decoder, shared stage-2
    # budget (measured before the conv rematch + fast tier + s2=3 landed)
    base = production_base(decoder_impl="shift",
                           compute_dtype="float32")  # pre-bf16 artifact
    base = replace(base, solver=replace(base.solver, history_size=5,
                                        max_iter=15, global_max_iter=None))
    model, v1, v2 = build_prior_pair(base)
    chunks = make_pool(n_chunks)
    wins = num_windows(100) * n_chunks

    out = {"chunks": n_chunks, "windows": wins, "results": {}}
    means = {}
    for label, mm in (("matmul_merge", True), ("scatter_merge", False)):
        cfg = replace(base, matmul_merge=mm)
        rec, means[label] = run_arm(model, v1, v2, cfg, chunks, wins,
                                    return_result=True)
        out["results"][label] = rec
        print(label, rec, flush=True)

    diff = float(np.max(np.abs(means["matmul_merge"]
                               - means["scatter_merge"])))
    out["max_abs_diff"] = diff
    a, b = (out["results"]["matmul_merge"]["windows_per_sec"],
            out["results"]["scatter_merge"]["windows_per_sec"])
    out["speedup_matmul"] = round(a / b, 3)
    write_out(out, "postprocess_ab.json")
    print(json.dumps({k: v for k, v in out.items() if k != "results"}))


if __name__ == "__main__":
    main()
