"""Root-cause probe for the bench-vs-A/B headline gap (VERDICT r3 #1).

Two rounds of official benches recorded ~20.2-20.7k w/s synced at the
production c320 point while the A/B artifacts recorded 22.0k (f32,
unroll_chunks_flat) and 27.3k (bf16, c320_dtype_rematch_ab).  Every A/B
number came from a TILED pool (AB_POOL_UNIQUE=16 — 16 distinct chunks
repeated, repeated entries binding the SAME device buffer), while
bench.py stages 320 ALL-DISTINCT chunks.  Launch timing is supposed to
be data-independent at static shapes; this probe tests that directly by
measuring both pool shapes in ONE process, plus a best-of-10 vs
best-of-3 sensitivity check.

Arms:
  tiled_u16_c320    16 unique chunks tiled to 320 (the A/B pool shape)
  distinct_c320     320 distinct chunks (the bench pool shape)

Run on TPU: python scripts/bench_gap_probe.py -> bench_gap_probe.json
"""

from __future__ import annotations

import os

from _ab_harness import (build_prior_pair, make_pool, production_base,
                         run_arm, write_out)


def main():
    from globalegomocap_tpu.optimize.window import num_windows

    n = int(os.environ.get("AB_CHUNKS", "320"))
    wins = num_windows(100) * n
    base = production_base()
    model, v1, v2 = build_prior_pair(base)

    out = {"chunks": n, "results": {}}
    for label, uniq in (("tiled_u16_c320", 16), ("distinct_c320", 0)):
        chunks = make_pool(n, unique=uniq)
        rec = run_arm(model, v1, v2, base, chunks, wins)
        out["results"][label] = rec
        print(label, rec, flush=True)
        write_out(out, "bench_gap_probe.json")
        del chunks


if __name__ == "__main__":
    main()
