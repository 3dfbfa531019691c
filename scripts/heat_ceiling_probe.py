"""Probe: does bf16 heat storage lift the c640 single-chip batch ceiling?

unroll_chunks_flat2.json found the SOLVE program's HLO temps OOM at 640
chunks (18.89G of 15.75G HBM) with f32 heat; bf16 crops halve the staged
crop stream and every crop-derived temp.  Arms (production defaults incl.
compute_dtype=bfloat16, heatmap_dtype=bfloat16):

  bf16_c448   comparator at the known f32 plateau point (22012 w/s)
  bf16_c640   the f32-OOM point — fits or not is the result
  bf16_c896   only reached if c640 fits and improves

Run on TPU: python scripts/heat_ceiling_probe.py -> heat_ceiling_probe.json
Envs: AB_POOL_UNIQUE (16), AB_OUT.
"""

from __future__ import annotations

import os

from _ab_harness import (build_prior_pair, make_pool, production_base,
                         run_arm, write_out)


def main():
    from globalegomocap_tpu.optimize.window import num_windows

    uniq = int(os.environ.get("AB_POOL_UNIQUE", "16"))
    base = production_base(heatmap_dtype="bfloat16", history_size=3)
    model, v1, v2 = build_prior_pair(base)

    out = {"pool_unique": uniq, "results": {}}
    for label, n_chunks in (("bf16_c448", 448), ("bf16_c640", 640),
                            ("bf16_c896", 896)):
        if label == "bf16_c896":
            # gate c896 on c640 beating the c448 comparator (NOT a
            # running max that already includes c640 — advisor finding)
            r640 = out["results"].get("bf16_c640", {})
            r448 = out["results"].get("bf16_c448", {})
            base_wps = r448.get("windows_per_sec", 0.0)
            if r640.get("windows_per_sec", 0.0) <= base_wps:
                out["results"][label] = {"skipped": "c640 did not improve"}
                break
        chunks = make_pool(n_chunks, unique=uniq)
        wins = num_windows(100) * n_chunks
        try:
            rec = run_arm(model, v1, v2, base, chunks, wins)
            rec["chunks"] = n_chunks
            out["results"][label] = rec
        except Exception as e:
            out["results"][label] = {"chunks": n_chunks,
                                     "error": f"{type(e).__name__}: {e}"}
        print(label, out["results"][label], flush=True)
        write_out(out, "heat_ceiling_probe.json")

    write_out(out, "heat_ceiling_probe.json")


if __name__ == "__main__":
    main()
