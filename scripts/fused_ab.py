"""A/B: the fused post-decode energy mega-kernel vs the XLA path, at the
production operating point (VERDICT r2 #2's 'Done' criterion).

Config: headline defaults — 40 staged chunks x 100 frames (480 windows),
iter15 / m5 / K2 / crop8 / shift decoder / dense sampling / fold_bn,
global_weight_3d=1.0.  Measures synced windows/s over repeated staged
launches for fused_energy in {off, on}, plus a 4-deep pipelined figure.

Run on TPU: python scripts/fused_ab.py  ->  fused_ab.json
"""

from __future__ import annotations

import os

from _ab_harness import (build_prior_pair, make_pool, production_base,
                         run_arm, write_out)


def main():
    from dataclasses import replace

    from globalegomocap_tpu.config import EnergyConfig, SolverConfig
    from globalegomocap_tpu.optimize.window import num_windows

    n_chunks = int(os.environ.get("AB_CHUNKS", "40"))
    # committed-artifact base (fused_ab.json predates the residual
    # stage 2, scan unroll, conv rematch and fast tier): iter15/m5,
    # shift decoder, plain global stage, per-arm fused flags
    base = production_base(
        energy=EnergyConfig(global_weight_3d=1.0),
        solver=SolverConfig(method="lbfgs_fixed", fused_probes=True,
                            history_size=5, max_iter=15,
                            step_candidates=(1.0, 0.1)),
        decoder_impl="shift", compute_dtype="float32")  # pre-bf16
    model, v1, v2 = build_prior_pair(base)
    chunks = make_pool(n_chunks)
    wins = num_windows(100) * n_chunks

    out = {"chunks": n_chunks, "windows": wins}
    results = {}
    arms = (("xla", {}),
            ("batched_solver", {"batched_solver": True}),
            ("fused_kernel", {"fused_energy": True}),
            ("fused_decode", {"fused_energy": True,
                              "fused_decode": True}))
    sel = os.environ.get("AB_ARMS")       # e.g. "fused_kernel,fused_decode"
    if sel:
        want = set(sel.split(","))
        arms = tuple(a for a in arms if a[0] in want)
    for label, overrides in arms:
        cfg = replace(base, solver=replace(base.solver, **overrides))
        results[label] = run_arm(model, v1, v2, cfg, chunks, wins)
        print(label, results[label], flush=True)
    out["results"] = results
    if "xla" in results:
        a = results["xla"]["windows_per_sec"]
        for lbl in ("batched_solver", "fused_kernel", "fused_decode"):
            if lbl in results:
                out[f"speedup_{lbl}"] = round(
                    results[lbl]["windows_per_sec"] / a, 3)
    write_out(out, "fused_ab.json")


if __name__ == "__main__":
    main()
