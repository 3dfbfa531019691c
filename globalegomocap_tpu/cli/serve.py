"""Serving CLI: continuously optimize sequence directories as they arrive.

A long-lived production driver the reference has no equivalent of (its
workflow is one `optimize_whole_sequence.py` run per pre-existing
sequence): this watches `--data_root`, and every NEW sequence directory
(containing `data_start_X_end_Y` chunk dirs) is staged and solved as one
flat batched launch through the streaming pipeline — staging of batch
t+1 overlaps the solve of batch t (serving_bench.json: 5661 sustained
windows/s at depth 3 on one v5e).

Emits one JSON line per completed sequence:
  {"sequence": ..., "chunks": N, "windows": W, "latency_ms": ...,
   "windows_per_sec": ..., "optimized_global_mpjpe": ...}

    python -m globalegomocap_tpu.cli.serve --data_root incoming \
        --local_ckpt local.msgpack --global_ckpt global.msgpack \
        [--watch_interval 2.0] [--max_batches 0] [--out_dir results]

watch_interval 0 processes what is present and exits (one-shot mode);
max_batches > 0 exits after that many sequences (0 = run forever).
"""

from __future__ import annotations

import argparse
import json
import os
import time

import numpy as np


def main(argv=None):
    from globalegomocap_tpu.cli.optimize_sequence import (
        build_parser, load_variables, str2bool)
    p = argparse.ArgumentParser(description=__doc__,
                                parents=[build_parser()],
                                conflict_handler="resolve",
                                add_help=False)
    p.add_argument("--data_root", required=True, type=str,
                   help="directory whose subdirectories are sequences")
    p.add_argument("--data_path", required=False, default=None)
    p.add_argument("--watch_interval", default=0.0, type=float,
                   help="seconds between directory scans; 0 = one-shot")
    p.add_argument("--max_batches", default=0, type=int,
                   help="stop after N sequences (0 = no limit)")
    p.add_argument("--max_in_flight", default=3, type=int)
    # serve is the DEPLOYMENT surface, so unlike cli/optimize_sequence
    # (whose defaults track reference parity) its dtype defaults are the
    # measured production stack: bf16 solver evals (f32 encode/offset/
    # final decode — pipeline mixed precision, +24%/c320,
    # c320_dtype_rematch_ab.json) and bf16 staged heat crops (f32 math
    # in-kernel, +2.5%, heat_dtype_ab.json) — both quality-gated per
    # corpus (quality_iter_crop_bf16*/heat16.json).
    p.add_argument("--compute_dtype", default="bfloat16_delta",
                   choices=["float32", "bfloat16", "bfloat16_f32enc",
                            "bfloat16_f32head", "bfloat16_delta",
                            "bfloat16_pure"],
                   help="whole-prior activation dtype in the solve "
                        "(params stay f32); bfloat16_delta iterates the "
                        "solver state in bf16 around the f32-exact init "
                        "mu — +14.9% over the mixed tier, bone matches "
                        "mixed on every gate corpus (dtype_tier_ab.json, "
                        "quality_iter_crop_f32head*.json); bfloat16 is "
                        "the round-4 mixed tier (+24% over f32)")
    p.add_argument("--heatmap_dtype", default="bfloat16",
                   choices=["float32", "bfloat16"],
                   help="staged heat-crop storage dtype (kernel math "
                        "stays f32); bfloat16 measured +2.5% "
                        "(heat_dtype_ab.json)")
    p.add_argument("--guard_crop", default=16, type=int,
                   help="guard-trip fast path: k x k crops centered at "
                        "the projected initial estimate when the "
                        "crop-mass guard trips; 16 is quality-neutral "
                        "vs the full-map fallback on the matched-prior "
                        "v2 corpus (bone +0.4%%, raw +0.2%% — "
                        "quality_iter_crop_gcrop_v2_pv2.json) at +27%% "
                        "synced / +33%% pipelined (robust_tier_ab."
                        "json); 8 doubles the speed at +1.3%% bone; "
                        "0 = full-map fallback (reference parity, "
                        "cli/optimize_sequence default)")
    p.add_argument("--prefetch_depth", default=2, type=int,
                   help="stage up to this many ready sequences ahead on a "
                        "worker thread while the device solves (overlaps "
                        "the staging pass — serving_bench.json's "
                        "submit-block cost — with the solve; 0 = stage "
                        "inline on the submit path)")
    p.add_argument("--stage_on_host", default=True, type=str2bool,
                   help="crop heatmaps in numpy BEFORE the host->device "
                        "transfer (serve ingests host-resident pkl "
                        "chunks, so only k*k crops cross the tunnel; "
                        "host_ingest_ab.json: 252 vs 24 w/s sustained)")
    p.add_argument("--with_metrics", default=True, type=str2bool)
    p.add_argument("--max_load_retries", default=5, type=int,
                   help="watch mode: scans to retry a sequence whose chunk "
                        "load raises (mid-upload arrivals) before giving "
                        "up with an error record")
    # serve is the DEPLOYMENT surface: unlike cli/optimize_sequence
    # (reference-parity defaults), it defaults to the FULL measured
    # production solver stack, not just the dtypes — every knob below is
    # speed-measured AND quality-gated on trained priors:
    #   lbfgs_fixed + fused probes + fused mega-kernel + unroll 5
    #     (fused_ab.json, unroll_chunks_ab.json)
    #   iter12 / history m2 / K2 fast tier (quality_iter_crop_s1iter*,
    #     quality_iter_crop_m2*, quality_iter_crop_kcand.json; the
    #     crop-mass guard restores iter>=15/m>=10/K4 on degraded maps)
    #   residual stage 2 at 3 iterations (stage2_residual.json,
    #     quality_iter_crop_s2iter*.json)
    #   crop8 staging + dense MXU sampling + folded BN + conv decoder
    #     (decoder_rematch_ab.json)
    p.set_defaults(solver="lbfgs_fixed", fused_probes=True,
                   fused_energy=True, unroll=5,
                   max_iter=12, history_size=2, step_candidates="1.0,0.1",
                   global_residual=True, global_max_iter=3,
                   heatmap_crop=8, sampling="dense", fold_bn=True,
                   dense_decoder=True, decoder_impl="conv")
    args = p.parse_args(argv)

    import jax

    from globalegomocap_tpu.config import (
        OptimizeConfig, EnergyConfig, PriorConfig, SolverConfig)
    from globalegomocap_tpu.data.test_data import (
        list_chunk_dirs, load_test_chunk)
    from globalegomocap_tpu.evaluation.metrics import calculate_errors

    # ONE jitted launch evaluates every chunk of a sequence: the eager
    # per-chunk path dispatched ~60 tiny ops per chunk through the
    # tunnel (~25 ms RTT each — ~20 s/sequence at 8 chunks, the whole
    # serve_e2e pathology); vmap over the chunk axis + jit turns the
    # metric suite into a single program per batch shape.
    metrics_batched = jax.jit(jax.vmap(calculate_errors))
    from globalegomocap_tpu.optimize.driver import (
        SequenceOptimizer, build_model)
    from globalegomocap_tpu.optimize.streaming import (
        StagePrefetcher, StreamingOptimizer)
    from globalegomocap_tpu.optimize.window import num_windows

    cfg = OptimizeConfig(
        energy=EnergyConfig(vae=args.vae, gmm=args.gmm, smooth=args.smooth,
                            bone_length=args.bone_length,
                            weight_3d=args.weight_3d,
                            reproj=args.reproj_weight,
                            global_weight_3d=args.global_weight_3d,
                            global_smooth=args.global_smooth,
                            global_residual=args.global_residual,
                            local_residual=args.local_residual,
                            overlap_consistency=args.overlap_consistency,
                            soft_smooth=args.soft_smooth),
        prior=PriorConfig(latent_dim=args.latent_dim, seq_len=args.seq_len,
                          hidden_dims=tuple(
                              int(x) for x in args.hidden_dims.split(","))),
        solver=SolverConfig(method=args.solver,
                            max_iter=args.max_iter,
                            history_size=args.history_size,
                            step_candidates=tuple(
                                float(x) for x in
                                args.step_candidates.split(",")),
                            fused_probes=args.fused_probes,
                            circular_history=args.circular_history,
                            fused_energy=args.fused_energy,
                            unroll=args.unroll,
                            global_max_iter=args.global_max_iter,
                            init=args.init, init_seed=args.init_seed),
        sampling_impl=args.sampling, heatmap_dtype=args.heatmap_dtype,
        heatmap_crop=args.heatmap_crop, guard_crop=args.guard_crop,
        fold_bn=args.fold_bn,
        dense_decoder=args.dense_decoder, decoder_impl=args.decoder_impl,
        decoder_dtype=args.decoder_dtype,
        compute_dtype=args.compute_dtype,
        heatmap_crop_min_mass=args.heatmap_crop_min_mass,
        camera=args.camera, final_smooth=args.final_smooth,
        final_smooth_method=args.final_smooth_method, merge=args.merge)
    model = build_model(cfg)
    hd = tuple(cfg.prior.hidden_dims)
    opt = SequenceOptimizer(
        model,
        load_variables(args.local_ckpt, args.seq_len, hd),
        load_variables(args.global_ckpt, args.seq_len, hd),
        cfg)
    service = StreamingOptimizer(opt, max_in_flight=args.max_in_flight,
                                 stage_on_host=args.stage_on_host)

    done: set[str] = set()
    pending: list[tuple[str, list, float]] = []  # (name, chunks, t_submit)
    emitted = 0

    def emit(name, chunks, t_submit, res):
        nonlocal emitted
        jax.block_until_ready(res.optimized)
        latency = time.perf_counter() - t_submit
        wins = sum(num_windows(c.n_frames) for c in chunks)
        rec = {"sequence": name, "chunks": len(chunks), "windows": wins,
               "latency_ms": round(1e3 * latency, 1),
               "windows_per_sec": round(wins / latency, 1)}
        if args.with_metrics:
            errs = metrics_batched(res.estimated, res.mid,
                                   res.optimized, res.gt)
            for key in ("optimized_global_mpjpe", "original_global_mpjpe"):
                rec[key] = round(float(np.mean(np.asarray(errs[key]))), 5)
        if args.save_pose:
            out = os.path.join(args.out_dir, name)
            os.makedirs(out, exist_ok=True)
            np.save(os.path.join(out, "optimized.npy"),
                    np.asarray(res.optimized))
        print(json.dumps(rec), flush=True)
        emitted += 1

    watch = args.watch_interval > 0
    fail_counts: dict[str, int] = {}

    def drain_pending():
        """Block on all in-flight work and emit it (watch-mode idle path:
        finished sequences must not sit unreported until the NEXT arrival
        pushes them out — ADVICE r2)."""
        for res in service.drain():
            n, cs, ts = pending.pop(0)
            emit(n, cs, ts, res)

    while True:
        progressed = False  # did this pass submit or emit anything?
        ready: list[tuple[str, list]] = []  # this pass's stageable batches
        seqs = sorted(d for d in os.listdir(args.data_root)
                      if os.path.isdir(os.path.join(args.data_root, d))
                      and d not in done)
        for name in seqs:
            if args.max_batches and emitted + len(pending) + len(ready) \
                    >= args.max_batches:
                break
            chunk_dirs = list_chunk_dirs(
                os.path.join(args.data_root, name))
            if not chunk_dirs:
                continue  # empty dir: re-polled next pass, not progress
            try:
                chunks = [load_test_chunk(d) for d in chunk_dirs]
            except Exception as e:  # noqa: BLE001 — skip partial arrivals
                fail_counts[name] = fail_counts.get(name, 0) + 1
                if watch and fail_counts[name] < args.max_load_retries:
                    continue  # likely mid-upload: retry next scan
                print(json.dumps({"sequence": name,
                                  "error": repr(e)}), flush=True)
                done.add(name)
                progressed = True
                continue
            if len({c.n_frames for c in chunks}) != 1:
                # unequal chunk lengths: serial per-chunk fallback
                from globalegomocap_tpu.optimize.driver import (
                    optimize_sequence_dir)
                t0 = time.perf_counter()
                _, avg, timing = optimize_sequence_dir(
                    opt, os.path.join(args.data_root, name),
                    verbose=False)
                rec = {"sequence": name, "chunks": len(chunks),
                       "latency_ms": round(
                           1e3 * (time.perf_counter() - t0), 1),
                       "optimized_global_mpjpe": round(float(
                           avg["optimized_global_mpjpe"]), 5)}
                print(json.dumps(rec), flush=True)
                emitted += 1
                done.add(name)
                progressed = True
                continue
            done.add(name)
            ready.append((name, chunks))
            progressed = True

        # submit this pass's batches; with prefetch_depth > 0 a worker
        # thread stages sequence t+1 while the device solves t (the
        # staging pass leaves the submit critical path — StagePrefetcher)
        if ready:
            if args.prefetch_depth > 0:
                staged_iter = StagePrefetcher(
                    opt, (cs for _, cs in ready),
                    depth=args.prefetch_depth,
                    on_host=args.stage_on_host)
            else:
                staged_iter = (cs for _, cs in ready)  # stage inline
            for (name, chunks), staged in zip(ready, staged_iter):
                t0 = time.perf_counter()
                service.submit_batch(staged)
                pending.append((name, chunks, t0))
                # results complete in submission order; drain ready ones
                while len(service._completed) > 0:
                    n, cs, ts = pending.pop(0)
                    emit(n, cs, ts, service._completed.pop(0))

        if args.max_batches and emitted + len(pending) >= args.max_batches:
            break
        if not watch:
            break
        if not progressed:
            # idle pass: finish + emit everything in flight, THEN sleep —
            # gating on `progressed` (not `seqs` emptiness) also prevents
            # a 100%-CPU rescan loop when only empty/failed dirs remain.
            drain_pending()
            time.sleep(args.watch_interval)

    drain_pending()
    return emitted


if __name__ == "__main__":
    main()
