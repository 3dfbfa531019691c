"""Decoder/dtype rematch at the c320 operating point.

The flat staged-crop contract moved the bench default from 112 to 320
chunks (unroll_chunks_flat*.json): the launch is now ~175 ms of mostly
program (RTT is 14%, MFU 15.4%, HBM 377 GB/s) — a different regime from
every previous dtype verdict (bf16 decoder weights NEGATIVE at round-2
batches; shift_bf16 TIED conv at c56).  Bottleneck moves have flipped
the decoder verdict twice already (decoder_rematch_ab.json) — re-match
the cheap dtype/impl levers at the new point:

  conv        production default (reference arm — sanity-gate vs the
              committed ~22k w/s healthy range)
  shift       shift decoder, f32 weights (lost to conv at c56: 9663 vs
              10267)
  shift_bf16  shift decoder with bf16 weights (tied conv at c56)

(heatmap_dtype=bfloat16 was NOT an arm here: at measurement time the
mega-kernel required f32 crops.  The kernel now converts bf16 crop
blocks in-kernel — scripts/heat_dtype_ab.py measures that lever.)

Run on TPU: python scripts/c320_dtype_rematch_ab.py
Writes c320_dtype_rematch_ab.json.  AB_CHUNKS / AB_POOL_UNIQUE envs.
"""

from __future__ import annotations

import os

from _ab_harness import (build_prior_pair, make_pool, production_base,
                         run_arm, write_out)


def main():
    from dataclasses import replace

    from globalegomocap_tpu.optimize.window import num_windows

    n_chunks = int(os.environ.get("AB_CHUNKS", "320"))
    uniq = int(os.environ.get("AB_POOL_UNIQUE", "16"))
    base = production_base(compute_dtype="float32",  # dtype is the arm
                           history_size=3)  # artifact predates the m2 tier
    model, v1, v2 = build_prior_pair(base)
    chunks = make_pool(n_chunks, unique=uniq)
    wins = num_windows(100) * n_chunks

    arms = (
        ("conv", {}),
        ("shift", {"decoder_impl": "shift"}),
        ("shift_bf16", {"decoder_impl": "shift",
                        "decoder_dtype": "bfloat16"}),
        # whole-prior bf16 compute (encode + conv decode activations;
        # params stay f32): OptimizeConfig.compute_dtype was only ever
        # measured on the TRAIN path (train_perf_r3.json, neutral).  At
        # c320 the solve may be partly activation-bandwidth-bound.  Needs
        # its own model instance; run_arm builds from cfg via the
        # optimizer, but the MODEL is shared — so build per-arm here.
        ("conv_bf16compute", {"compute_dtype": "bfloat16"}),
    )
    out = {"chunks": n_chunks, "pool_unique": uniq, "windows": wins,
           "results": {}}
    for label, overrides in arms:
        cfg = replace(base, **overrides)
        # compute_dtype lives on the MODEL instance — rebuild for dtype
        # arms (params are dtype-independent; v1/v2 stay f32 and flax
        # casts activations at apply time)
        m = model
        if cfg.compute_dtype != base.compute_dtype:
            from globalegomocap_tpu.optimize.driver import build_model
            m = build_model(cfg)
        try:
            out["results"][label] = run_arm(m, v1, v2, cfg, chunks, wins)
        except Exception as e:   # record incompatibilities, keep going
            out["results"][label] = {"error": f"{type(e).__name__}: {e}"}
        print(label, out["results"][label], flush=True)

    write_out(out, "c320_dtype_rematch_ab.json")


if __name__ == "__main__":
    main()
