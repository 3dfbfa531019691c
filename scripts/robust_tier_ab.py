"""Speed A/B: the guard-tripped (robust) tier's energy path.

VERDICT r3 #4: when the crop-mass guard fires, the pipeline falls back
to the batched XLA full-map energy — paying both the deeper robust-tier
solve AND the slow energy path, and no artifact records that cost.  The
guard-crop fast path (OptimizeConfig.guard_crop) keeps the fused
mega-kernel by staging k x k crops centered at the projected initial
estimate (reference full-map term: optimizer.py:139-149 — it only ever
samples 4 texels around the projection, so any crop containing the
solve's sampling neighbourhood is equivalent).

Arms (40 v2-corpus chunks — coverage ~0.13-0.18 trips the guard, which
also restores the robust solver tier iter>=15/m10/K4 in EVERY arm; only
the energy path differs):

  sanity_clean_c40   known-config clean-corpus launch (degraded-claim
                     check: production point, healthy ~55-62 ms/launch
                     at c40 per CLAUDE.md round-3 notes)
  fullmap_c40        guard_crop=0 — the current fallback's price tag
  gcrop8/16/24_c40   estimate-centered crops through the mega-kernel

Quality companion: scripts/quality_iter_crop.py QIC_ONLY=gcrop
QIC_CORPUS=v2 (metrics per arm on the same regime).

Run on TPU: python scripts/robust_tier_ab.py -> robust_tier_ab.json
Envs: AB_CHUNKS (40), AB_OUT.
"""

from __future__ import annotations

import os

from _ab_harness import (build_prior_pair, make_pool, production_base,
                         run_arm, write_out)


def main():
    import jax
    import jax.numpy as jnp

    from dataclasses import replace

    from globalegomocap_tpu.data.synthetic import synthetic_chunk_v2
    from globalegomocap_tpu.data.test_data import TestChunk
    from globalegomocap_tpu.optimize.window import num_windows

    n_chunks = int(os.environ.get("AB_CHUNKS", "40"))
    wins = num_windows(100) * n_chunks
    out = {"chunks": n_chunks, "results": {}}

    base = production_base(history_size=3)  # artifact predates the m2 tier
    model, v1, v2 = build_prior_pair(base)

    # degraded-claim sanity arm first (the harness docstring's rule)
    clean = make_pool(n_chunks)
    rec = run_arm(model, v1, v2, base, clean, wins)
    out["results"]["sanity_clean_c40"] = rec
    print("sanity_clean_c40", rec, flush=True)
    write_out(out, "robust_tier_ab.json")
    del clean

    pool = [TestChunk(*(jax.device_put(jnp.asarray(a))
                        for a in synthetic_chunk_v2(100, seed=i)))
            for i in range(n_chunks)]

    for gc in (0, 8, 16, 24):
        label = "fullmap_c40" if gc == 0 else f"gcrop{gc}_c40"
        cfg = replace(base, guard_crop=gc)
        try:
            rec = run_arm(model, v1, v2, cfg, pool, wins)
        except Exception as e:
            rec = {"error": f"{type(e).__name__}: {e}"}
        out["results"][label] = rec
        print(label, rec, flush=True)
        write_out(out, "robust_tier_ab.json")


if __name__ == "__main__":
    main()
