"""Staging crop-extraction impl A/B (the serving-floor attack, round 5).

serving_batch_ab.json showed sustained serving saturating at ~15.2k w/s
independent of batch shape — per-WINDOW-bound at ~65 us/w, with the
solve accounting for only ~40 us/w (pipe_batch_ab): the staging program
is the growing share.  Its extraction is two chained take_along_axis
gathers per chunk (terms.py), a TPU-hostile op class.  This A/B measures
the three exactly-equivalent formulations (config.stage_crop_impl):

  gather   two chained take_along_axis            (the incumbent)
  flat     one flat-index take_along_axis
  onehot   row/col selector matmuls on the MXU

per arm, same session, c112 distinct device-resident chunks:
  stage_pipelined_ms   staging program sustained cost (depth 3)
  stage_synced_ms      best-of-10 synced staging launches
  loop_wps             the real interleaved stage+solve serving loop
plus an ARGMAX-ONLY floor arm (no extraction — the irreducible map-read
+ argmax cost) and the solve-only pipelined baseline.

Run on the TPU: python scripts/stage_impl_ab.py
Writes stage_impl_ab.json.  SI_CHUNKS/SI_ROUNDS envs.
"""

from __future__ import annotations

import collections
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main():
    _sleep = os.environ.pop("SERVE_SANITY_SLEEP", None)
    if _sleep:
        time.sleep(float(_sleep))

    import jax
    import jax.numpy as jnp

    from _ab_harness import build_prior_pair, production_base
    from globalegomocap_tpu.config import with_overrides
    from globalegomocap_tpu.data.synthetic import synthetic_chunk
    from globalegomocap_tpu.data.test_data import TestChunk
    from globalegomocap_tpu.optimize.driver import SequenceOptimizer
    from globalegomocap_tpu.optimize.window import num_windows

    c = int(os.environ.get("SI_CHUNKS", "112"))
    n_rounds = int(os.environ.get("SI_ROUNDS", "18"))
    depth = 3
    wins = num_windows(100) * c

    base = production_base()
    model, v1, v2 = build_prior_pair(base)

    pool = [TestChunk(*(jax.device_put(jnp.asarray(a))
                        for a in synthetic_chunk(100, seed=300 + i)))
            for i in range(c)]

    def batch_for(sub):
        start = (sub * 37) % c
        return [pool[(start + j) % c] for j in range(c)]

    # session gate at the c40 point (the modeled calibration shape)
    from _ab_harness import session_health_gate
    opt0 = SequenceOptimizer(model, v1, v2, base)
    warm = opt0.stage(pool[:40])
    cov = warm.crop_coverage if warm.crop_coverage is not None else 1.0
    jax.block_until_ready(
        opt0.optimize_chunks_batched(warm, mode="flat").optimized)
    gate = session_health_gate(opt0, warm, 480, __file__,
                               "stage_impl_ab")
    del warm

    out = {"chunks": c, "rounds": n_rounds, "windows_per_sub": wins,
           **gate, "arms": {}}

    # ON-DEVICE bit-exactness across impls at f32 heat storage: the CPU
    # equivalence tests cannot catch TPU matmul-precision rounding (the
    # onehot einsums must pin precision=HIGHEST — code review r5), so
    # assert it where it can actually break.
    import numpy as np
    cfg_f32 = with_overrides(base, heatmap_dtype="float32")
    ref = SequenceOptimizer(
        model, v1, v2,
        with_overrides(cfg_f32, stage_crop_impl="gather")).stage(
        pool[:8], coverage=cov)
    for impl in ("flat", "onehot"):
        st = SequenceOptimizer(
            model, v1, v2,
            with_overrides(cfg_f32, stage_crop_impl=impl)).stage(
            pool[:8], coverage=cov)
        if not (np.array_equal(np.asarray(st.heat), np.asarray(ref.heat))
                and np.array_equal(np.asarray(st.origins),
                                   np.asarray(ref.origins))):
            raise AssertionError(
                f"staging impl '{impl}' is NOT bit-exact vs gather on "
                f"this device")
    out["device_bit_exact"] = True
    del ref, st

    # ---- argmax-only floor: map read + argmax, no extraction -----------
    def argmax_prog(heat_l):
        outs = []
        for h in heat_l:
            hh, ww = h.shape[-3], h.shape[-2]
            flat = h.reshape(h.shape[:-3] + (hh * ww,) + h.shape[-1:])
            am = jnp.argmax(flat, axis=-2)
            outs.append(jnp.stack([am // ww, am % ww], -1))
        return jnp.stack(outs)

    amax = jax.jit(argmax_prog)
    hl = [ch.heatmaps for ch in pool]
    jax.block_until_ready(amax(hl))
    t0 = time.perf_counter()
    q = collections.deque()
    for s in range(n_rounds):
        q.append(amax(hl))
        if len(q) > depth:
            jax.block_until_ready(q.popleft())
    while q:
        jax.block_until_ready(q.popleft())
    out["argmax_only_pipelined_ms"] = round(
        1e3 * (time.perf_counter() - t0) / n_rounds, 2)

    # ---- per-impl staging + serving loop --------------------------------
    for impl in ("gather", "flat", "onehot"):
        cfg = with_overrides(base, stage_crop_impl=impl)
        opt = SequenceOptimizer(model, v1, v2, cfg)
        rec = {}
        st = opt.stage(batch_for(0), coverage=cov)     # compile
        jax.block_until_ready(st.heat)

        syncs = []
        for s in range(8):
            t0 = time.perf_counter()
            st = opt.stage(batch_for(s), coverage=cov)
            jax.block_until_ready(st.heat)
            syncs.append(time.perf_counter() - t0)
        rec["stage_synced_ms"] = round(1e3 * min(syncs), 2)

        t0 = time.perf_counter()
        q = collections.deque()
        for s in range(n_rounds):
            q.append(opt.stage(batch_for(s), coverage=cov))
            if len(q) > depth:
                jax.block_until_ready(q.popleft().heat)
        while q:
            jax.block_until_ready(q.popleft().heat)
        rec["stage_pipelined_ms"] = round(
            1e3 * (time.perf_counter() - t0) / n_rounds, 2)

        # solve program (compile once per impl-independent shape; shared
        # jit cache is per-optimizer, so warm it)
        jax.block_until_ready(
            opt.optimize_chunks_batched(st, mode="flat").optimized)

        t0 = time.perf_counter()
        q = collections.deque()
        for s in range(n_rounds):
            stg = opt.stage(batch_for(s), coverage=cov)
            q.append(opt.optimize_chunks_batched(stg, mode="flat"))
            if len(q) > depth:
                jax.block_until_ready(q.popleft().optimized)
        while q:
            jax.block_until_ready(q.popleft().optimized)
        loop_s = (time.perf_counter() - t0) / n_rounds
        rec["loop_ms_per_sub"] = round(1e3 * loop_s, 2)
        rec["loop_wps"] = round(wins / loop_s, 1)
        out["arms"][impl] = rec
        print(impl, rec, flush=True)

    # ---- solve-only pipelined baseline (pre-staged) ---------------------
    opt = SequenceOptimizer(model, v1, v2, base)
    staged = [opt.stage(batch_for(s), coverage=cov) for s in range(4)]
    for st in staged:
        jax.block_until_ready(st.heat)
    jax.block_until_ready(
        opt.optimize_chunks_batched(staged[0], mode="flat").optimized)
    t0 = time.perf_counter()
    q = collections.deque()
    for s in range(n_rounds):
        q.append(opt.optimize_chunks_batched(staged[s % 4], mode="flat"))
        if len(q) > depth:
            jax.block_until_ready(q.popleft().optimized)
    while q:
        jax.block_until_ready(q.popleft().optimized)
    solve_s = (time.perf_counter() - t0) / n_rounds
    out["solve_only_pipelined_ms"] = round(1e3 * solve_s, 2)
    out["solve_only_pipelined_wps"] = round(wins / solve_s, 1)

    print(json.dumps(out, indent=1), flush=True)
    with open(os.path.join(REPO, "stage_impl_ab.json"), "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
