"""Decoder-implementation rematch at the round-3 production point.

The shift-vs-dense(-vs-conv) decoder verdicts were measured in round 2
PRE-mega-kernel (perf_levers_r2.json: shift 1095 vs dense 870), when the
eval also carried XLA sampling + energy kernels.  With the fused energy
kernel + unroll-5 solver the decode chain is ~80% of every eval
(eval_decomp.json), so the kernel-count-vs-HBM-traffic tradeoff between
the three exact decoder formulations (and their bf16-weight variants)
may land differently.  One session, same staged batch, all arms.

Run on TPU: python scripts/decoder_rematch_ab.py -> decoder_rematch_ab.json
"""

from __future__ import annotations

import os

from _ab_harness import (build_prior_pair, make_pool, production_base,
                         run_arm, write_out)


def main():
    from dataclasses import replace

    from globalegomocap_tpu.optimize.window import num_windows

    n_chunks = int(os.environ.get("AB_CHUNKS", "56"))
    # committed-artifact base: iter15/m5, shared stage-2 budget (the fast
    # tier + s2=3 landed AFTER decoder_rematch_ab.json was measured)
    base = production_base(decoder_impl="shift",
                           compute_dtype="float32")  # pre-bf16 artifact
    base = replace(base, solver=replace(base.solver, history_size=5,
                                        max_iter=15, global_max_iter=None))
    model, v1, v2 = build_prior_pair(base)
    chunks = make_pool(n_chunks)
    wins = num_windows(100) * n_chunks

    arms = (("shift", {"decoder_impl": "shift"}),
            ("dense", {"decoder_impl": "dense"}),
            ("conv", {"decoder_impl": "conv"}),
            ("shift_bf16", {"decoder_impl": "shift",
                            "decoder_dtype": "bfloat16"}),
            ("dense_bf16", {"decoder_impl": "dense",
                            "decoder_dtype": "bfloat16"}))
    sel = os.environ.get("AB_ARMS")
    if sel:
        want = set(sel.split(","))
        arms = tuple(a for a in arms if a[0] in want)

    out = {"chunks": n_chunks, "windows": wins, "results": {}}
    for label, overrides in arms:
        cfg = replace(base, **overrides)
        out["results"][label] = run_arm(model, v1, v2, cfg, chunks, wins)
        print(label, out["results"][label], flush=True)

    write_out(out, "decoder_rematch_ab.json")


if __name__ == "__main__":
    main()
