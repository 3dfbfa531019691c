"""A/B: bf16 heat crops through the fused mega-kernel at the c320
production point.

Motivation: at c320/bf16-compute the launch moves ~50 GB through HBM at
~377 GB/s (bench.py cost analysis) — partly bandwidth-bound.  The crop
blocks are the mega-kernel's dominant input stream and are re-read once
per probe row per eval (grid=(R, nblk), context BlockSpecs ignore R), so
storing them bf16 halves that stream.  The kernel converts each crop
block to f32 in ONE whole-block convert (per-cell converts would slice
single bf16 sublanes — packed 2-per-row on TPU); all energy math stays
f32.  Quality: the only perturbation is bf16 rounding of heat VALUES in
[0, 1] (<= 2^-9 relative), gated per corpus by
QIC_HEAT_DTYPE=bfloat16 scripts/quality_iter_crop.py.

Arms (both at full production defaults incl. compute_dtype=bfloat16):
  heat_f32    sanity arm — the committed production point
              (c320_dtype_rematch_ab.json conv_bf16compute: 27278 w/s
              synced / 31821 pipelined; >2x off means a degraded claim
              and every number here is invalid)
  heat_bf16   cfg.heatmap_dtype="bfloat16"

Run on TPU: python scripts/heat_dtype_ab.py  ->  heat_dtype_ab.json
Envs: AB_CHUNKS (320), AB_POOL_UNIQUE (16), AB_OUT.
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
    base = production_base(history_size=3)  # artifact predates the m2 tier
    model, v1, v2 = build_prior_pair(base)
    chunks = make_pool(n_chunks, unique=uniq)
    wins = num_windows(100) * n_chunks

    out = {"chunks": n_chunks, "pool_unique": uniq, "windows": wins,
           "results": {}}
    for label, overrides in (("heat_f32", {}),
                             ("heat_bf16", {"heatmap_dtype": "bfloat16"})):
        cfg = replace(base, **overrides)
        try:
            out["results"][label] = run_arm(model, v1, v2, cfg, chunks,
                                            wins)
        except Exception as e:
            out["results"][label] = {"error": f"{type(e).__name__}: {e}"}
        print(label, out["results"][label], flush=True)

    f32 = out["results"]["heat_f32"]
    if "best_s" in f32:
        per_win_ms = 1e3 * f32["best_s"] / wins
        if per_win_ms > 0.08:   # healthy ~0.035-0.04 ms/window at c320
            out["DEGRADED_SESSION"] = True
            print(f"WARNING: sanity arm {per_win_ms:.3f} ms/window — "
                  "degraded claim; numbers invalid", flush=True)

    write_out(out, "heat_dtype_ab.json")


if __name__ == "__main__":
    main()
