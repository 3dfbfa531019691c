"""Benchmark: windows/sec of the two-stage latent optimization (the
reference's headline workload, optimize_whole_sequence.py) on synthetic
chunks with the full-size prior (latent 2048, seq 10).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "windows/s", "vs_baseline": N}

vs_baseline compares against the reference-equivalent serial torch
two-stage L-BFGS measured on this machine's CPU
(scripts/measure_torch_baseline.py writes baseline_torch.json; a recorded
fallback value is used if absent).
"""

from __future__ import annotations

import json
import os
import time

import numpy as np

SEED = 0
# 320 chunks = 3840 windows: every per-iteration cost cut (mega-kernel,
# unroll, iter12/m3, s2=3) moves the RTT-amortization optimum up, and the
# flat staged-crop contract + freeing the raw pool after staging lifted
# the old 112-chunk HBM bound.  unroll_chunks_flat*.json measures the
# synced curve 18970 (c112) -> 19648 (c160) -> 20844 (c224) -> 22009
# (c320) -> 22012 (c448, plateau); c640 OOMs the SOLVE program's temps
# (18.9G).  Pipelined peaks at c112 (~26k) and sits ~24.8k at c320 — the
# synced value is the headline metric, so c320 is the default.  Launch
# latency is ~175 ms; latency-sensitive serving should stay at 40
# (serving_bench.py does — its producer is host-staging-bound anyway).
N_CHUNKS = int(os.environ.get("BENCH_CHUNKS", "320"))
FRAMES_PER_CHUNK = 100
# defaults are the measured-fastest configuration that passes the e2e
# quality tests (see perf_sweep.json + tests/test_e2e_quality.py)
SOLVER = os.environ.get("BENCH_SOLVER", "lbfgs_fixed")
# dense (MXU contraction) crushes the gather path at the flat production
# batch: 998 vs 584 windows/s (the old gather-wins result was measured at
# batch 12 in serial mode)
SAMPLING = os.environ.get("BENCH_SAMPLING", "dense")
# BN folding is exact for eval-mode inference (tests/test_fold_bn.py)
FOLD_BN = os.environ.get("BENCH_FOLD_BN", "1") == "1"
# 'flat' (one concatenated solver batch, fastest single-chip) | 'serial'
# (per-chunk launches) | 'batched' (chunk-vmapped, the multi-chip path)
MODE = os.environ.get("BENCH_MODE", "flat")
# decoder as a banded-matmul chain (exact; fewer kernels per objective
# eval — see models/dense_decoder.py and tests/test_dense_decoder.py);
# measured 529 vs 504 windows/s on 1x v5e, so default ON
DENSE_DECODER = os.environ.get("BENCH_DENSE_DECODER", "1") == "1"
# '' | 'conv' | 'dense' | 'shift' — overrides DENSE_DECODER when set.
# The verdict has now flipped TWICE as the surrounding bottlenecks moved:
# round 1 dense>conv, round 2 shift>dense (perf_levers_r2.json, 1095.5 vs
# 869.9), and at the round-3 operating point (fused energy kernel +
# unroll-5 solver scan) the PLAIN XLA CONV stack wins the rematch:
# 10267 vs 9663 w/s synced / 14103 vs 13015 pipelined same-session
# (decoder_rematch_ab.json; shift_bf16 ties conv within noise).  conv is
# also the exact reference formulation — default since round 3.
DECODER_IMPL = os.environ.get("BENCH_DECODER_IMPL", "conv")
# 'bfloat16' halves dense/shift decoder weight streaming
DECODER_DTYPE = os.environ.get("BENCH_DECODER_DTYPE", "float32")
# fixed solver: fold the accepted-point value_and_grad into the candidate
# probe batch (identical trajectory, fewer latency-bound evals);
# measured 561 vs 529 windows/s on 1x v5e, so default ON
FUSED_PROBES = os.environ.get("BENCH_FUSED_PROBES", "1") == "1"
# fixed solver: compact-representation L-BFGS direction (identical math,
# ~8 kernels instead of ~2*history sequential ones)
COMPACT_DIR = os.environ.get("BENCH_COMPACT_DIRECTION", "0") == "1"
# fixed solver: pointer-indexed circular history (one O(d) row write per
# iteration instead of three O(m*d) roll copies; identical trajectory)
CIRCULAR_HISTORY = os.environ.get("BENCH_CIRCULAR_HISTORY", "0") == "1"
# fixed solver: the whole post-decode energy (value + analytic grad) as
# ONE Pallas kernel per eval (ops/pallas/fused_energy.py) — DEFAULT ON:
# +49% synced / +73% pipelined at the production point (fused_ab.json),
# quality-verified with trained priors (quality_iter_crop_fused.json:
# all tripwires + stage-2 gates pass, raw-global 0.03287 vs 0.0335 XLA)
FUSED_ENERGY = os.environ.get("BENCH_FUSED_ENERGY", "1") == "1"
# L-BFGS history size: m=2 at iter12 is the round-4 fast tier — +6.6%
# synced over m3 at the bf16 c320 point (dispatch_floor_ab.json) and
# quality-gated on BOTH gate corpora (quality_iter_crop_m2.json: raw
# 0.02995 vs 0.03023 m3, bone +0.0002; _camnoise: raw 0.0699 vs 0.06998,
# strict stage-2 gates pass); the crop-mass guard restores the robust
# tier (iter>=15, m>=10, K4) on degraded corpora where deeper search
# wins (quality_iter_crop_s1iter_v2.json)
HISTORY = int(os.environ.get("BENCH_HISTORY", "2"))
# stage-1 solver iterations: the fewer-is-better trend (15 beat 25 in
# round 2) continues to 12 on the clean corpus — and 12/m3 measures
# 15077 vs 12163 w/s synced / 21783 vs 18088 pipelined
# (s1tier_speed_ab.json).  Guard-tripped corpora go back to >=15.
MAX_ITER = int(os.environ.get("BENCH_MAX_ITER", "12"))
# parallel line-search candidates (fractions of lr): K=2 beats K=4 on the
# headline metrics too (quality_iter_crop_k3.json: raw-global 0.03589 vs
# 0.03815, camera 0.02873 vs 0.03127, aligned within 0.0005, tripwires
# pass) and is 22% faster (perf_levers_r2f.json: 5715 vs 4699 w/s)
STEP_CANDIDATES = tuple(
    float(x) for x in
    os.environ.get("BENCH_STEP_CANDIDATES", "1.0,0.1").split(","))
# 'bfloat16' halves the staged-crop HBM stream (the mega-kernel upcasts
# to f32 in VMEM, math unchanged): +2.5% synced / +2.2% pipelined at c320
# (heat_dtype_ab.json) and quality-gated with trained priors — tripwires
# + stage-2 gates pass with metrics a hair BETTER
# (quality_iter_crop_heat16.json).  Production default since round 4.
HEATMAP_DTYPE = os.environ.get("BENCH_HEATMAP_DTYPE", "bfloat16")
# whole-prior activation dtype for the SOLVER'S EVALS (params f32).
# 'bfloat16_delta' (round-5 default) keeps the mixed tier's f32 encode/
# offset/output but iterates the SOLVER STATE in bf16 as a delta around
# the f32-exact init mu: dtype_tier_ab.json localized the pure tier's
# +9% to the solver-state dtype (z/history/probe arrays), not the
# encode, and the delta tier measures 26222 w/s synced / 29816
# pipelined at c320 — +14.9% over mixed and ABOVE the all-bf16 pure
# ceiling (init exact by construction, bf16 rounding scaled to
# ||dz|| << ||mu||).  Quality-gated per corpus
# (quality_iter_crop_f32head*.json: bone MATCHES mixed to 1e-5 on
# clean + camnoise + v2, raw within noise); 'bfloat16' is the round-4
# mixed tier (c320_dtype_rematch_ab.json, quality_iter_crop_bf16*).
COMPUTE_DTYPE = os.environ.get("BENCH_COMPUTE_DTYPE", "bfloat16_delta")
# > 0: peak-centered k x k heatmap crops, extracted ONCE at staging
# (the program never reads the full maps).  k=8 default: quality-verified
# with trained full-size priors on the 5-sequence workload — all
# tripwires pass, raw-global within 0.0002 of crop16, which is itself
# EXACTLY lossless vs full maps (quality_iter_crop.json); the mass guard
# falls back to full maps for multimodal/flattened sources
HEATMAP_CROP = int(os.environ.get("BENCH_HEATMAP_CROP", "8"))
# lax.scan unroll factor for the solver iteration loop: the per-iteration
# cost is kernel-dispatch-bound (~26-30 fusions x tens of us), so letting
# XLA fuse across iteration boundaries buys +7-9% synced / +5-8%
# pipelined (unroll_chunks_ab.json), with outputs bitwise-identical at
# unroll<=5 (8 drifts in the last float digit and compiles 134 s — not
# worth it)
UNROLL = int(os.environ.get("BENCH_UNROLL", "5"))
# stage-2 (global) iteration budget: the residual global stage converges
# from an EXACT init, and with trained priors its metrics are identical
# to 5 decimals for any budget in {3..15} on BOTH the headline corpus
# and the SLAM-noise v2 corpus (quality_iter_crop_s2iter*.json) — while
# each stage-2 iteration costs ~0.9 ms of launch time: s2=3 measures
# 12181 vs 10211 w/s synced / 17504 vs 14121 pipelined
# (s2iter_speed_ab.json).  'none' = stage 2 shares max_iter (parity).
_s2 = os.environ.get("BENCH_S2_ITER", "3")
S2_ITER = None if _s2 == "none" else int(_s2)
# pipelined-mode batch: the synced headline optimum (c320) and the
# pipelined/serving optimum need not coincide.  At the round-5 DELTA
# tier the pipelined curve RISES with chunks again (pipe_batch_ab.json,
# same-session: c64 24.5k < c112 28.3k < c160 28.4k < c224 28.6k at
# depth 4; depth 6 at c224 adds +3.4% to 29.5k, depth 8 only +1.4%
# more) — the pipelined figure is measured at c224/depth6 by default;
# 0 = reuse the synced batch
PIPELINE_CHUNKS = int(os.environ.get("BENCH_PIPELINE_CHUNKS", "224"))

# torch-CPU reference-equivalent baseline (windows/sec, two stages), as
# measured by scripts/measure_torch_baseline.py on this machine; see
# BASELINE.md.  Used when baseline_torch.json is absent.
FALLBACK_BASELINE_WINDOWS_PER_SEC = 0.29

# SESSION SANITY (the degraded-claim trap, CLAUDE.md): a TPU process that
# starts right after a crashed/killed TPU process can run ~13x slow —
# per-launch costs behave as if every solver iteration pays a tunnel RTT
# — while completing without error.  Round 3's official bench recorded
# 20.2k w/s in such a session while the same config measured 27.3k in a
# healthy one (c320_dtype_rematch_ab.json).  Guard: when the measured
# best launch exceeds 1.5x the recorded healthy cost of the DEFAULT
# config, the bench sleeps out the claim-wedge window and re-execs
# itself in a fresh process (up to 2 retries) instead of recording a
# degraded headline.  The gate only applies at the default config (any
# perf-relevant BENCH_* override disables it) unless
# BENCH_EXPECTED_LAUNCH_S supplies an expectation for the overridden
# config.  BENCH_SANITY=0 disables entirely (the CPU smoke test path is
# auto-exempt: the gate requires a TPU backend).
_PERF_ENVS = (
    "BENCH_CHUNKS", "BENCH_SOLVER", "BENCH_SAMPLING", "BENCH_FOLD_BN",
    "BENCH_MODE", "BENCH_DENSE_DECODER", "BENCH_DECODER_IMPL",
    "BENCH_DECODER_DTYPE", "BENCH_FUSED_PROBES", "BENCH_COMPACT_DIRECTION",
    "BENCH_CIRCULAR_HISTORY", "BENCH_FUSED_ENERGY", "BENCH_HISTORY",
    "BENCH_MAX_ITER", "BENCH_STEP_CANDIDATES", "BENCH_HEATMAP_DTYPE",
    "BENCH_COMPUTE_DTYPE", "BENCH_HEATMAP_CROP", "BENCH_UNROLL",
    "BENCH_S2_ITER", "BENCH_LATENT", "BENCH_HIDDEN", "BENCH_GLOBAL_W3D",
    "BENCH_RESIDUAL")
# healthy per-launch seconds of the default program (c320 = 3840 windows,
# bf16 compute + bf16 heat): 27278 w/s -> 0.141 s (c320_dtype_rematch_
# ab.json arm conv_bf16compute; bf16 heat is +2.5% on top — the constant
# stays at the conservative f32-heat figure)
EXPECTED_LAUNCH_S = float(os.environ.get("BENCH_EXPECTED_LAUNCH_S", "0.141"))
SANITY = os.environ.get("BENCH_SANITY", "1") == "1"
SANITY_FACTOR = float(os.environ.get("BENCH_SANITY_FACTOR", "1.5"))
_SANITY_RETRY = int(os.environ.get("BENCH_SANITY_RETRY", "0"))
_CONFIG_IS_DEFAULT = not any(os.environ.get(v) for v in _PERF_ENVS)


def _reexec_fresh(best: float) -> None:
    """Replace this (degraded) process with a fresh bench run.  The
    60 s claim-wedge wait must fall BETWEEN the old connection dropping
    (at exec, when CLOEXEC sockets close) and the new claim — so the
    sleep is signalled via env and executed by the NEW process before it
    imports jax (see top of main)."""
    import sys
    print(f"bench: session degraded (launch {best*1e3:.0f} ms vs "
          f"expected {EXPECTED_LAUNCH_S*1e3:.0f} ms); re-exec "
          f"{_SANITY_RETRY + 1}/2", file=sys.stderr, flush=True)
    env = dict(os.environ,
               BENCH_SANITY_RETRY=str(_SANITY_RETRY + 1),
               BENCH_SANITY_SLEEP=os.environ.get("BENCH_SANITY_SLEEP_S",
                                                 "75"))
    os.execve(sys.executable,
              [sys.executable, os.path.abspath(__file__)], env)

# MFU accounting: XLA cost analysis of the compiled program gives total
# FLOPs per launch; achieved FLOP/s / peak = MFU.  v5e peak is 197 TFLOPS
# bf16 (the default TPU matmul precision); override for other chips.
MFU = os.environ.get("BENCH_MFU", "1") == "1"
PEAK_TFLOPS = float(os.environ.get("BENCH_PEAK_TFLOPS", "197"))


def load_baseline() -> float:
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "baseline_torch.json")
    if os.path.exists(path):
        with open(path) as f:
            return float(json.load(f)["windows_per_sec"])
    return FALLBACK_BASELINE_WINDOWS_PER_SEC


def main():
    # re-exec'd after a degraded-session detection: the old process's
    # tunnel connection dropped at exec; wait out the claim-wedge window
    # BEFORE this process claims (CLAUDE.md: ~60 s)
    _sleep = os.environ.pop("BENCH_SANITY_SLEEP", None)
    if _sleep:
        time.sleep(float(_sleep))

    import jax
    import jax.numpy as jnp

    from globalegomocap_tpu.config import (
    EnergyConfig,
        OptimizeConfig, PriorConfig, SolverConfig)
    from globalegomocap_tpu.data.synthetic import synthetic_chunk
    from globalegomocap_tpu.optimize.driver import (
        SequenceOptimizer, build_model)
    from globalegomocap_tpu.optimize.window import num_windows

    cfg = OptimizeConfig(
        # BENCH_LATENT exists for the CPU smoke test only; the metric is
        # defined at the full size
        prior=PriorConfig(latent_dim=int(os.environ.get("BENCH_LATENT",
                                                        "2048")),
                          seq_len=10,
                          hidden_dims=tuple(int(x) for x in os.environ.get(
                              "BENCH_HIDDEN",
                              "64,64,128,256,512").split(","))),
        solver=SolverConfig(method=SOLVER, fused_probes=FUSED_PROBES,
                            compact_direction=COMPACT_DIR,
                            circular_history=CIRCULAR_HISTORY,
                            history_size=HISTORY, max_iter=MAX_ITER,
                            fused_energy=FUSED_ENERGY,
                            step_candidates=STEP_CANDIDATES,
                            unroll=UNROLL,
                            global_max_iter=S2_ITER),
        energy=EnergyConfig(
            global_weight_3d=float(os.environ.get("BENCH_GLOBAL_W3D",
                                                  "1.0")),
            # residual stage-2 parametrization: exact at init, no decode
            # floor; improves every metric family in both camera regimes
            # (stage2_residual.json) — production default since round 3
            global_residual=os.environ.get("BENCH_RESIDUAL", "1") == "1"),
        sampling_impl=SAMPLING,
        fold_bn=FOLD_BN,
        dense_decoder=DENSE_DECODER,
        decoder_impl=DECODER_IMPL,
        decoder_dtype=DECODER_DTYPE,
        heatmap_dtype=HEATMAP_DTYPE,
        heatmap_crop=HEATMAP_CROP,
        compute_dtype=COMPUTE_DTYPE,
    )
    model = build_model(cfg)
    x0 = jnp.zeros((1, 10, 45))
    local_vars = model.init(jax.random.PRNGKey(0), x0, False)
    global_vars = model.init(jax.random.PRNGKey(1), x0, False)
    opt = SequenceOptimizer(model, local_vars, global_vars, cfg)

    chunks = [synthetic_chunk(FRAMES_PER_CHUNK, seed=SEED + i)
              for i in range(N_CHUNKS)]
    wins = num_windows(FRAMES_PER_CHUNK) * N_CHUNKS
    staged_pipe = None

    # Pre-stage inputs on device: the metric is optimization throughput,
    # not host->device transfer (production keeps data resident/streamed).
    from globalegomocap_tpu.data.test_data import TestChunk
    chunks = [TestChunk(*(jax.device_put(jnp.asarray(a)) for a in c))
              for c in chunks]

    if MODE in ("batched", "flat"):
        # Stage ONCE (stacking + crop-guard readback are per-dataset
        # costs, not per-solve: fixed_cost_probe.json measured them at
        # ~94 ms of a 237 ms launch); the timed region is the production
        # hot path — one program launch + one sync.
        staged = opt.stage(chunks)
        if PIPELINE_CHUNKS and PIPELINE_CHUNKS < N_CHUNKS:
            staged_pipe = opt.stage(chunks[:PIPELINE_CHUNKS])
        # Free the raw full-map pool: the solve program reads only the
        # staged (pre-cropped) arrays, and production serving likewise
        # drops raw maps once staged.  Keeping ~25 MB/chunk of full maps
        # resident was half of what bounded the batch at 112 chunks (the
        # other half — staging-temp layout padding — is fixed by the
        # flat staged-crop contract, see pipeline._unflatten_staged_crops).
        del chunks
        bmode = "flat" if MODE == "flat" else "vmap"

        def run_all():
            out = opt.optimize_chunks_batched(staged, mode=bmode)
            jax.block_until_ready(out.optimized)
    else:
        def run_all():
            outs = [opt.optimize_chunk(c) for c in chunks]
            for o in outs:
                jax.block_until_ready(o.optimized)

    run_all()  # compile warmup

    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        run_all()
        times.append(time.perf_counter() - t0)

    best = min(times)

    # session-sanity gate (see the module docstring block above): a
    # degraded claim inflates the launch cost well past 1.5x — re-exec
    # in a fresh process rather than recording it as the headline
    degraded = False
    if (SANITY and MODE in ("batched", "flat")
            and jax.default_backend() != "cpu"
            and (_CONFIG_IS_DEFAULT
                 or "BENCH_EXPECTED_LAUNCH_S" in os.environ)):
        if best > SANITY_FACTOR * EXPECTED_LAUNCH_S:
            if _SANITY_RETRY < 2:
                _reexec_fresh(best)  # never returns
            degraded = True  # retries exhausted: record, but flag it

    wps = wins / best

    # Pipelined serving throughput: issue DEPTH launches back-to-back and
    # sync once — async dispatch overlaps the tunnel RTT with device
    # compute, the steady-state regime of a stream of staged batches.
    # BENCH_PIPELINE_CHUNKS > 0 measures the pipelined figure at its own
    # (smaller) batch: the synced optimum (c320) and the pipelined
    # optimum need not coincide — the staged_pipe batch is a prefix of
    # the same pool.
    pipelined_wps = None
    if MODE in ("batched", "flat"):
        depth = int(os.environ.get("BENCH_PIPELINE_DEPTH", "6"))
        pipe_staged, pipe_wins = staged, wins
        if staged_pipe is not None:
            pipe_staged = staged_pipe
            pipe_wins = num_windows(FRAMES_PER_CHUNK) * PIPELINE_CHUNKS
        if depth > 1:
            # warm the (possibly differently-shaped) pipelined program
            jax.block_until_ready(opt.optimize_chunks_batched(
                pipe_staged, mode=bmode).optimized)
            t0 = time.perf_counter()
            outs = [opt.optimize_chunks_batched(pipe_staged, mode=bmode)
                    for _ in range(depth)]
            for o in outs:
                jax.block_until_ready(o.optimized)
            pipelined_wps = pipe_wins * depth / (time.perf_counter() - t0)
    baseline = load_baseline()
    record = {
        "metric": "two_stage_latent_optimization_throughput",
        "value": round(wps, 3),
        "unit": "windows/s",
        "vs_baseline": round(wps / baseline, 3),
    }
    if pipelined_wps is not None:
        record["pipelined_windows_per_sec"] = round(pipelined_wps, 1)
        if staged_pipe is not None:
            record["pipeline_chunks"] = PIPELINE_CHUNKS
    if degraded:
        record["session_degraded"] = True

    if MFU and MODE in ("batched", "flat"):
        # roofline accounting from the compiled executable itself: the
        # driver's jit cache holds the already-compiled program — lower
        # the same (function, shapes) pair and read XLA's cost analysis
        # (hits the in-process pjit cache; no second device compile).
        try:
            jitted = next(v for k, v in opt._jit_cache.items()
                          if isinstance(k, tuple) and k[0] == "batched")
            ca = jitted.lower(opt.local_variables, opt.global_variables,
                              staged.est, staged.cams, staged.heat,
                              staged.gt, staged.origins
                              ).compile().cost_analysis()
            if isinstance(ca, (list, tuple)):
                ca = ca[0]
            flops = float(ca.get("flops", 0.0))
            byt = float(ca.get("bytes accessed", 0.0))
            if flops > 0:
                record["tflops_per_s"] = round(flops / best / 1e12, 2)
                record["mfu_vs_bf16_peak"] = round(
                    flops / best / (PEAK_TFLOPS * 1e12), 4)
            if byt > 0:
                record["hbm_gb_per_s"] = round(byt / best / 1e9, 1)
        except Exception:
            pass  # cost analysis is best-effort; never break the bench

    print(json.dumps(record))


if __name__ == "__main__":
    main()
