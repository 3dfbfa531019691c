"""Sustained serving benchmark: a stream of DISTINCT staged batches
through StreamingOptimizer.submit_batch with bounded in-flight depth.

bench.py's pipelined number replays ONE staged batch; this measures the
realistic serving regime — every batch is different data (stage() runs
on the host while the device solves previous batches), with per-batch
completion latencies.

Run on the TPU: python scripts/serving_bench.py
Writes serving_bench.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main():
    # re-exec'd after a degraded-session detection: the old process's
    # tunnel connection dropped at exec; wait out the claim-wedge window
    # BEFORE this process claims (CLAUDE.md: ~60 s)
    _sleep = os.environ.pop("SERVE_SANITY_SLEEP", None)
    if _sleep:
        time.sleep(float(_sleep))

    import jax
    import jax.numpy as jnp
    import numpy as np

    from globalegomocap_tpu.config import (
        EnergyConfig, OptimizeConfig, PriorConfig, SolverConfig)
    from globalegomocap_tpu.data.synthetic import synthetic_chunk
    from globalegomocap_tpu.data.test_data import TestChunk
    from globalegomocap_tpu.optimize.driver import (
        SequenceOptimizer, build_model)
    from globalegomocap_tpu.optimize.streaming import (
        StagePrefetcher, StreamingOptimizer)
    from globalegomocap_tpu.optimize.window import num_windows

    # 6 x 40-chunk batches ~= 5.9 GB of device-resident raw maps (16 GB
    # HBM); the stream cycles this pool SERVE_ROUNDS times (staging +
    # solving is genuine work each cycle) so latency percentiles have
    # n_batches * rounds samples
    n_batches = int(os.environ.get("SERVE_BATCHES", "6"))
    n_rounds = int(os.environ.get("SERVE_ROUNDS", "4"))
    # c64/depth2 since round 5: with one-hot staging the per-window
    # floor saturates by c64 and depth 2 matches depth 3 —
    # serving_batch_onehot.json measured 22444 w/s at p50 98.7 ms
    # (vs the round-4 c40/depth3 point's 15095 at 117.5), strictly
    # dominating on BOTH axes
    chunks_per = int(os.environ.get("SERVE_CHUNKS", "64"))
    depth = int(os.environ.get("SERVE_DEPTH", "2"))

    # production defaults (match bench.py): fused mega-kernel, residual
    # stage 2, unroll-5 solver scan.  SERVE_FUSED=0 reproduces the
    # round-3 pre-kernel serving numbers.
    fused = os.environ.get("SERVE_FUSED", "1") == "1"
    cfg = OptimizeConfig(
        prior=PriorConfig(latent_dim=2048, seq_len=10),
        energy=EnergyConfig(global_weight_3d=1.0, global_residual=True),
        solver=SolverConfig(method="lbfgs_fixed", fused_probes=True,
                            history_size=int(os.environ.get(
                                "SERVE_HISTORY", "2")),
                            max_iter=int(os.environ.get(
                                "SERVE_MAX_ITER", "12")),
                            step_candidates=(1.0, 0.1),
                            fused_energy=fused,
                            unroll=int(os.environ.get("SERVE_UNROLL",
                                                      "5")),
                            global_max_iter=(
                                None if os.environ.get("SERVE_S2_ITER",
                                                       "3") == "none"
                                else int(os.environ.get("SERVE_S2_ITER",
                                                        "3")))),
        sampling_impl="dense", fold_bn=True, dense_decoder=True,
        decoder_impl=os.environ.get("SERVE_DECODER", "conv"),
        # bf16 solver state as a delta around the f32 mu (f32 encode/
        # output like the mixed tier): production default since round 5
        # (dtype_tier_ab.json +14.9%, quality_iter_crop_f32head*.json)
        compute_dtype=os.environ.get("SERVE_COMPUTE_DTYPE",
                                     "bfloat16_delta"),
        # bf16 staged heat crops (f32 kernel math): +2.5%, quality-gated
        # (heat_dtype_ab.json, quality_iter_crop_heat16.json)
        heatmap_dtype=os.environ.get("SERVE_HEATMAP_DTYPE", "bfloat16"),
        heatmap_crop=8)
    model = build_model(cfg)
    x0 = jnp.zeros((1, 10, 45))
    v1 = model.init(jax.random.PRNGKey(0), x0, False)
    v2 = model.init(jax.random.PRNGKey(1), x0, False)
    opt = SequenceOptimizer(model, v1, v2, cfg)

    wins_per_batch = num_windows(100) * chunks_per

    def make_batch(b):
        return [TestChunk(*(jax.device_put(jnp.asarray(a))
                            for a in synthetic_chunk(100,
                                                     seed=10_000 * b + i)))
                for i in range(chunks_per)]

    # pre-generate host data; staging itself is part of the serving loop
    batches = [make_batch(b) for b in range(n_batches)]

    # warmup: compile the program once
    warm = opt.stage(batches[0])
    jax.block_until_ready(
        opt.optimize_chunks_batched(warm, mode="flat").optimized)

    # SESSION-HEALTH CALIBRATOR (degraded-claim trap, CLAUDE.md — same
    # design as bench.py's gate): min-of-3 synced launches of the warm
    # 40-chunk batch (480 windows at the serving config).  A process
    # started right after a crashed/killed TPU claim can run far slower
    # per launch while completing without error; round 4's first
    # serving re-measure recorded 13.3k w/s sustained in such a session
    # vs 15.8k committed for a STRICTLY SLOWER stack.  If the launch
    # exceeds 1.5x the recorded healthy cost, sleep out the claim-wedge
    # window and re-exec fresh (<=2 retries) instead of recording a
    # degraded artifact.  SERVE_EXPECTED_LAUNCH_S=0 records-only.
    calib = []
    for _ in range(3):
        t0 = time.perf_counter()
        jax.block_until_ready(
            opt.optimize_chunks_batched(warm, mode="flat").optimized)
        calib.append(time.perf_counter() - t0)
    calib_s = min(calib)
    # Healthy-launch model, valid ONLY for the default round-4 fused
    # stack: ~24 ms tunnel RTT + ~31.25 us/window of program time —
    # 39.0 ms at the default 480-window batch (the session that produced
    # the committed serving_bench.json) and ~48.6 ms at SERVE_CHUNKS=64,
    # both measured.  Any OTHER stack override (SERVE_FUSED=0 etc.)
    # changes the launch cost in ways this constant cannot model, so the
    # gate refuses to guess: expected=0 (record-only) with a warning,
    # unless the caller supplies SERVE_EXPECTED_LAUNCH_S explicitly
    # (ADVICE r4: SERVE_FUSED=0 would otherwise guarantee two false
    # degraded-detections and ~10 min of pointless TPU restarts).
    _stack_envs = ("SERVE_FUSED", "SERVE_HISTORY", "SERVE_MAX_ITER",
                   "SERVE_UNROLL", "SERVE_S2_ITER", "SERVE_DECODER",
                   "SERVE_COMPUTE_DTYPE", "SERVE_HEATMAP_DTYPE")
    _overridden = [e for e in _stack_envs if e in os.environ]
    if "SERVE_EXPECTED_LAUNCH_S" in os.environ:
        expected = float(os.environ["SERVE_EXPECTED_LAUNCH_S"])
    elif _overridden:
        print(f"serving_bench: stack overrides {_overridden} — no "
              f"healthy-launch model for this config; session-health "
              f"gate DISABLED (set SERVE_EXPECTED_LAUNCH_S to gate)",
              file=sys.stderr, flush=True)
        expected = 0.0
    else:
        expected = 0.024 + 31.25e-6 * wins_per_batch
    retry = int(os.environ.get("SERVE_SANITY_RETRY", "0"))
    if expected > 0 and calib_s > 1.5 * expected and retry < 2:
        print(f"serving_bench: session degraded (launch "
              f"{calib_s*1e3:.0f} ms vs expected {expected*1e3:.0f} ms);"
              f" re-exec {retry + 1}/2", file=sys.stderr, flush=True)
        env = dict(os.environ, SERVE_SANITY_RETRY=str(retry + 1),
                   SERVE_SANITY_SLEEP="75")
        os.execve(sys.executable,
                  [sys.executable, os.path.abspath(__file__)], env)

    def pct(sorted_ms, q):
        return round(sorted_ms[min(len(sorted_ms) - 1,
                                   int(q * len(sorted_ms)))], 1)

    # ---- phase 1: sustained stream (submit as work arrives) -------------
    service = StreamingOptimizer(opt, max_in_flight=depth)
    n_subs = n_batches * n_rounds
    lat = []
    submit_block_ms = []
    t_start = time.perf_counter()
    submit_t = {}
    for b in range(n_subs):
        chunks = batches[b % n_batches]
        submit_t[b] = time.perf_counter()
        service.submit_batch(chunks)           # stages + dispatches
        submit_block_ms.append(
            1e3 * (time.perf_counter() - submit_t[b]))
        while len(service._completed) > len(lat):
            done_idx = len(lat)
            lat.append(time.perf_counter() - submit_t[done_idx])
    service.drain()
    total = time.perf_counter() - t_start
    while len(lat) < n_subs:
        lat.append(total - (submit_t[len(lat)] - t_start))

    lat_ms = sorted(1e3 * x for x in lat)

    # ---- phase 2: backpressure (submissions faster than solve rate) -----
    # Every submission is issued immediately; beyond `depth` the pipeline
    # must BLOCK the producer (bounded in-flight = bounded HBM), which
    # shows up as submit-call latencies ~ one batch solve time instead of
    # the dispatch-only latency of phase 1.
    bp = StreamingOptimizer(opt, max_in_flight=depth)
    bp_submit_ms = []
    bp_inflight = []
    t_bp = time.perf_counter()
    for b in range(n_subs):
        t0 = time.perf_counter()
        bp.submit_batch(batches[b % n_batches])
        bp_submit_ms.append(1e3 * (time.perf_counter() - t0))
        bp_inflight.append(len(bp._in_flight))
    bp.drain()
    bp_total = time.perf_counter() - t_bp
    assert max(bp_inflight) <= depth, \
        f"in-flight depth exceeded: {max(bp_inflight)} > {depth}"
    bp_sorted = sorted(bp_submit_ms)

    # ---- phase 3: prefetched stream (stage t+1 overlaps solve t) --------
    # StagePrefetcher moves the staging pass (the 28 ms submit-block of
    # phase 1) onto a worker thread, so the producer's submit only
    # dispatches the solve.
    pf = StreamingOptimizer(opt, max_in_flight=depth)
    pf_submit_ms = []
    pf_lat = []
    pf_submit_t = {}
    t_pf = time.perf_counter()
    src = (batches[b % n_batches] for b in range(n_subs))
    for b, staged in enumerate(StagePrefetcher(opt, src, depth=2)):
        pf_submit_t[b] = time.perf_counter()
        pf.submit_batch(staged)
        pf_submit_ms.append(1e3 * (time.perf_counter() - pf_submit_t[b]))
        while len(pf._completed) > len(pf_lat):
            pf_lat.append(time.perf_counter() - pf_submit_t[len(pf_lat)])
    pf.drain()
    pf_total = time.perf_counter() - t_pf
    while len(pf_lat) < n_subs:
        pf_lat.append(pf_total - (pf_submit_t[len(pf_lat)] - t_pf))
    pf_lat_ms = sorted(1e3 * x for x in pf_lat)

    # A degraded session that survived both re-exec retries must not
    # masquerade as a calibrated artifact (ADVICE r4): flag it in the
    # JSON and exit non-zero after writing.
    degraded = bool(expected > 0 and calib_s > 1.5 * expected)
    out = {
        "batches": n_batches,
        "rounds": n_rounds,
        "submissions": n_subs,
        "chunks_per_batch": chunks_per,
        "windows_per_batch": wins_per_batch,
        "in_flight_depth": depth,
        "calibration_launch_ms": round(1e3 * calib_s, 1),
        "calibration_expected_ms": round(1e3 * expected, 1),
        "session_degraded": degraded,
        "sustained_windows_per_sec": round(
            n_subs * wins_per_batch / total, 1),
        "total_s": round(total, 3),
        "batch_latency_ms_p50": pct(lat_ms, 0.50),
        "batch_latency_ms_p90": pct(lat_ms, 0.90),
        "batch_latency_ms_p95": pct(lat_ms, 0.95),
        "batch_latency_ms_p99": pct(lat_ms, 0.99),
        "batch_latency_ms_max": round(lat_ms[-1], 1),
        "submit_block_ms_p50": pct(sorted(submit_block_ms), 0.50),
        "prefetched": {
            "windows_per_sec": round(n_subs * wins_per_batch / pf_total, 1),
            "batch_latency_ms_p50": pct(pf_lat_ms, 0.50),
            "batch_latency_ms_p95": pct(pf_lat_ms, 0.95),
            "batch_latency_ms_p99": pct(pf_lat_ms, 0.99),
            "submit_block_ms_p50": pct(sorted(pf_submit_ms), 0.50),
            "note": "StagePrefetcher stages batch t+1 on a worker thread "
                    "while the device solves batch t (prefetch depth 2)",
        },
        "backpressure": {
            "windows_per_sec": round(n_subs * wins_per_batch / bp_total, 1),
            "max_in_flight_observed": max(bp_inflight),
            "submit_ms_p50": pct(bp_sorted, 0.50),
            "submit_ms_p95": pct(bp_sorted, 0.95),
            "submit_ms_p99": pct(bp_sorted, 0.99),
            "note": "submissions issued with no pacing; submit blocks at "
                    "depth so producer rate degrades to solve rate "
                    "(bounded HBM)",
        },
    }
    print(json.dumps(out, indent=1), flush=True)
    with open(os.path.join(REPO, "serving_bench.json"), "w") as f:
        json.dump(out, f, indent=1)
    if degraded:
        print("serving_bench: SESSION STILL DEGRADED after retries — "
              "artifact flagged session_degraded; do not commit as a "
              "calibrated measurement", file=sys.stderr, flush=True)
        sys.exit(3)


if __name__ == "__main__":
    main()
