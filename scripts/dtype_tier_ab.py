"""bf16 sub-tier speed A/B at the c320 production point (VERDICT r4 #3).

bench_gap_probe.json measured pure-bf16 at 24 042 vs mixed 21 372 w/s
same-session (+12.5%) and localized the pure tier's +0.0007 bone-aligned
cost to the bf16-encoded init mu; the f32enc arm showed the f32 ENCODE
alone carries the whole mixed-tier cost.  The new `bfloat16_f32head`
tier keeps ONLY the fc_mu init head f32 (one 5120x2048 f32 matmul;
encoder convs + everything else pure bf16) — this A/B measures whether
that recovers pure-tier speed.  Quality gates live in
quality_iter_crop.py QIC_ONLY=f32head.

Arms, same session (mixed first = the session-health reference vs its
~21.4-22.5k committed healthy range):
  mixed     compute_dtype=bfloat16      (production default)
  f32enc    compute_dtype=bfloat16_f32enc
  f32head   compute_dtype=bfloat16_f32head
  pure      compute_dtype=bfloat16_pure (speed ceiling)

Run on TPU: python scripts/dtype_tier_ab.py
Writes dtype_tier_ab.json.  AB_CHUNKS / AB_POOL_UNIQUE envs.
"""

from __future__ import annotations

import os

from _ab_harness import (build_prior_pair, make_pool, production_base,
                         run_arm, write_out)


def main():
    from dataclasses import replace

    from globalegomocap_tpu.optimize.driver import build_model
    from globalegomocap_tpu.optimize.window import num_windows

    n_chunks = int(os.environ.get("AB_CHUNKS", "320"))
    uniq = int(os.environ.get("AB_POOL_UNIQUE", "16"))
    base = production_base()          # bf16 mixed, m2 tier, bf16 heat
    model, v1, v2 = build_prior_pair(base)
    chunks = make_pool(n_chunks, unique=uniq)
    wins = num_windows(100) * n_chunks

    arms = (
        ("mixed", "bfloat16"),
        ("f32enc", "bfloat16_f32enc"),
        ("f32head", "bfloat16_f32head"),
        ("delta", "bfloat16_delta"),
        ("pure", "bfloat16_pure"),
    )
    out = {"chunks": n_chunks, "pool_unique": uniq, "windows": wins,
           "results": {}}
    for label, dt in arms:
        cfg = replace(base, compute_dtype=dt)
        # all arms share the bf16 model instance (build_model maps every
        # bfloat16* tier to a bf16-dtype ConvVAE; the tiers differ only
        # in where optimize_stage re-clones f32)
        out["results"][label] = run_arm(model, v1, v2, cfg, chunks, wins)
        print(label, out["results"][label], flush=True)

    mixed = out["results"]["mixed"]["windows_per_sec"]
    for label, _ in arms:
        out["results"][label]["vs_mixed"] = round(
            out["results"][label]["windows_per_sec"] / mixed, 4)
    write_out(out, "dtype_tier_ab.json")


if __name__ == "__main__":
    main()
