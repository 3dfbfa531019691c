"""Per-submission decomposition of the sustained-serving floor
(VERDICT r4 #1).

serving_bench.json sustains ~15.1k w/s (≈31.8 ms per 480-window batch)
while the same chip replays ONE staged batch at ~28.5k w/s pipelined
(16.8 ms at c112) — round 4 asserted, without measuring, that the gap is
"per-batch staging + dispatch/readback".  This probe MEASURES the split
at the production serving point (c40/depth3, round-4 stack, device-
resident distinct batches):

  rtt_ms               tunnel round-trip (tiny synced launch)
  stage_call_ms        host-side cost of stage(): dispatching the staging
                       program (async return)
  stage_pipelined_ms   staging-only sustained cost per batch (dispatch
                       back-to-back, block at end) ≈ max(host, device)
  stage_synced_ms      host + device + RTT for one staging launch
  solve_dispatch_ms    host-side cost of dispatching the solve
  solve_synced_ms      one synced solve launch (the 39 ms calibration)
  solve_pipelined_ms   solve-only sustained cost per batch (pre-staged
                       batches replayed at depth 3) — the device floor
  serving_loop_ms      the real interleaved stage+solve loop (depth 3) —
                       should reproduce serving_bench's sustained number

and then measures the candidate attack:

  fused_loop_ms        crop+stack+solve as ONE program per submission
                       (no separate staging launch), same loop shape

Writes serving_decomp.json.  Run on the TPU.
"""

from __future__ import annotations

import collections
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def pct(sorted_v, q):
    return sorted_v[min(len(sorted_v) - 1, int(q * len(sorted_v)))]


def stats_ms(xs):
    s = sorted(1e3 * x for x in xs)
    return {"min": round(s[0], 2), "p50": round(pct(s, 0.5), 2),
            "p90": round(pct(s, 0.9), 2), "max": round(s[-1], 2)}


def main():
    _sleep = os.environ.pop("SERVE_SANITY_SLEEP", None)
    if _sleep:
        time.sleep(float(_sleep))

    import jax
    import jax.numpy as jnp
    import numpy as np

    from _ab_harness import build_prior_pair, production_base
    from globalegomocap_tpu.data.synthetic import synthetic_chunk
    from globalegomocap_tpu.data.test_data import TestChunk
    from globalegomocap_tpu.optimize.driver import SequenceOptimizer
    from globalegomocap_tpu.optimize.window import num_windows

    n_batches = int(os.environ.get("SD_BATCHES", "6"))
    n_rounds = int(os.environ.get("SD_ROUNDS", "4"))
    chunks_per = int(os.environ.get("SD_CHUNKS", "40"))
    depth = int(os.environ.get("SD_DEPTH", "3"))
    n_subs = n_batches * n_rounds

    cfg = production_base()
    model, v1, v2 = build_prior_pair(cfg)
    opt = SequenceOptimizer(model, v1, v2, cfg)
    wins = num_windows(100) * chunks_per

    batches = [[TestChunk(*(jax.device_put(jnp.asarray(a))
                            for a in synthetic_chunk(100,
                                                     seed=10_000 * b + i)))
                for i in range(chunks_per)]
               for b in range(n_batches)]

    # warmup + compile; coverage measured once (serving guard='first')
    warm = opt.stage(batches[0])
    cov = warm.crop_coverage if warm.crop_coverage is not None else 1.0
    jax.block_until_ready(
        opt.optimize_chunks_batched(warm, mode="flat").optimized)

    # session-health gate (same design as serving_bench)
    from _ab_harness import session_health_gate
    gate = session_health_gate(opt, warm, wins, __file__,
                               "serving_decomp")

    out = {"chunks_per_batch": chunks_per, "windows_per_batch": wins,
           "depth": depth, "submissions": n_subs, **gate}

    # ---- tunnel RTT ------------------------------------------------------
    tiny = jax.jit(lambda x: x + 1.0)
    z = jax.device_put(jnp.zeros(()))
    jax.block_until_ready(tiny(z))
    rtts = []
    for _ in range(10):
        t0 = time.perf_counter()
        jax.block_until_ready(tiny(z))
        rtts.append(time.perf_counter() - t0)
    out["rtt_ms"] = stats_ms(rtts)

    # ---- staging: host dispatch / pipelined / synced ---------------------
    call_ts, staged_all = [], []
    for b in range(n_subs):
        t0 = time.perf_counter()
        st = opt.stage(batches[b % n_batches], coverage=cov)
        call_ts.append(time.perf_counter() - t0)
        staged_all.append(st)
        if len(staged_all) > depth:      # bound staged HBM like serving
            jax.block_until_ready(staged_all.pop(0).heat)
    for st in staged_all:
        jax.block_until_ready(st.heat)
    out["stage_call_ms"] = stats_ms(call_ts)

    t0 = time.perf_counter()
    keep = collections.deque()
    for b in range(n_subs):
        keep.append(opt.stage(batches[b % n_batches], coverage=cov))
        if len(keep) > depth:
            jax.block_until_ready(keep.popleft().heat)
    while keep:
        jax.block_until_ready(keep.popleft().heat)
    out["stage_pipelined_ms"] = round(
        1e3 * (time.perf_counter() - t0) / n_subs, 2)

    syncs = []
    for b in range(n_batches):
        t0 = time.perf_counter()
        st = opt.stage(batches[b], coverage=cov)
        jax.block_until_ready(st.heat)
        syncs.append(time.perf_counter() - t0)
    out["stage_synced_ms"] = stats_ms(syncs)

    # ---- solve: dispatch / synced / pipelined (pre-staged) ---------------
    staged = [opt.stage(batches[b], coverage=cov)
              for b in range(n_batches)]
    for st in staged:
        jax.block_until_ready(st.heat)

    disp = []
    inflight = collections.deque()
    for b in range(n_subs):
        t0 = time.perf_counter()
        r = opt.optimize_chunks_batched(staged[b % n_batches], mode="flat")
        disp.append(time.perf_counter() - t0)
        inflight.append(r)
        if len(inflight) > depth:
            jax.block_until_ready(inflight.popleft().optimized)
    while inflight:
        jax.block_until_ready(inflight.popleft().optimized)
    out["solve_dispatch_ms"] = stats_ms(disp)

    syncs = []
    for _ in range(10):
        t0 = time.perf_counter()
        jax.block_until_ready(opt.optimize_chunks_batched(
            staged[0], mode="flat").optimized)
        syncs.append(time.perf_counter() - t0)
    out["solve_synced_ms"] = stats_ms(syncs)

    t0 = time.perf_counter()
    inflight = collections.deque()
    for b in range(n_subs):
        inflight.append(opt.optimize_chunks_batched(
            staged[b % n_batches], mode="flat"))
        if len(inflight) > depth:
            jax.block_until_ready(inflight.popleft().optimized)
    while inflight:
        jax.block_until_ready(inflight.popleft().optimized)
    solve_pipe = (time.perf_counter() - t0) / n_subs
    out["solve_pipelined_ms"] = round(1e3 * solve_pipe, 2)
    out["solve_pipelined_wps"] = round(wins / solve_pipe, 1)
    del staged

    # ---- the real serving loop (stage + solve interleaved) ---------------
    t0 = time.perf_counter()
    inflight = collections.deque()
    for b in range(n_subs):
        st = opt.stage(batches[b % n_batches], coverage=cov)
        inflight.append(opt.optimize_chunks_batched(st, mode="flat"))
        if len(inflight) > depth:
            jax.block_until_ready(inflight.popleft().optimized)
    while inflight:
        jax.block_until_ready(inflight.popleft().optimized)
    loop_s = (time.perf_counter() - t0) / n_subs
    out["serving_loop_ms"] = round(1e3 * loop_s, 2)
    out["serving_loop_wps"] = round(wins / loop_s, 1)

    # ---- ATTACK: crop+stack+solve as ONE program per submission ----------
    from globalegomocap_tpu.energy.terms import crop_heatmaps_channels_last
    from globalegomocap_tpu.optimize.pipeline import optimize_chunks_flat
    cfg_eff = opt._cfg_for_coverage(cov)
    k = cfg_eff.heatmap_crop
    camera = opt._camera

    def fused_prog(lv, gv, est_l, cams_l, heat_l, gt_l):
        est = jnp.stack(est_l)
        cams = jnp.stack(cams_l)
        gt = jnp.stack(gt_l)
        cr = [crop_heatmaps_channels_last(h, k)[:2] for h in heat_l]
        heat = jnp.stack([c.reshape(c.shape[0], -1) for c, _ in cr])
        org = jnp.stack([o for _, o in cr])
        return optimize_chunks_flat(
            model, lv, gv, est, cams, heat, gt, camera, cfg_eff,
            origins=org,
            full_hw=(heat_l[0].shape[-3], heat_l[0].shape[-2]))

    fused = jax.jit(fused_prog)

    def fused_call(b):
        ch = batches[b % n_batches]
        return fused(v1, v2,
                     [c.estimated_local for c in ch],
                     [c.camera_poses for c in ch],
                     [c.heatmaps for c in ch],
                     [c.gt_global for c in ch])

    t0 = time.perf_counter()
    r0 = fused_call(0)
    jax.block_until_ready(r0.optimized)
    out["fused_compile_s"] = round(time.perf_counter() - t0, 1)
    # equivalence vs the two-program path on batch 0 (same math, one
    # program — fusion may reassociate, so allclose not bitwise)
    two = opt.optimize_chunks_batched(opt.stage(batches[0], coverage=cov),
                                      mode="flat")
    d = float(jnp.max(jnp.abs(r0.optimized - two.optimized)))
    out["fused_vs_two_program_max_abs"] = round(d, 6)

    syncs, disp = [], []
    for _ in range(10):
        t0 = time.perf_counter()
        r = fused_call(1)
        disp.append(time.perf_counter() - t0)
        jax.block_until_ready(r.optimized)
        syncs.append(time.perf_counter() - t0)
    out["fused_dispatch_ms"] = stats_ms(disp)
    out["fused_synced_ms"] = stats_ms(syncs)

    t0 = time.perf_counter()
    inflight = collections.deque()
    for b in range(n_subs):
        inflight.append(fused_call(b))
        if len(inflight) > depth:
            jax.block_until_ready(inflight.popleft().optimized)
    while inflight:
        jax.block_until_ready(inflight.popleft().optimized)
    fused_s = (time.perf_counter() - t0) / n_subs
    out["fused_loop_ms"] = round(1e3 * fused_s, 2)
    out["fused_loop_wps"] = round(wins / fused_s, 1)

    # ---- decomposition summary -------------------------------------------
    out["decomposition_note"] = (
        "serving_loop_ms - solve_pipelined_ms = the staging+dispatch "
        "overhead per submission; compare stage_pipelined_ms (staging "
        "program device+host sustained cost) and stage_call_ms (pure "
        "host dispatch) to locate it; fused_loop_ms is the one-program "
        "attack on the same submission stream")
    print(json.dumps(out, indent=1), flush=True)
    with open(os.path.join(REPO, "serving_decomp.json"), "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
