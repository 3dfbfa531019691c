"""Self-contained headline demo: the complete user journey on one TPU.

1. Generate synthetic AMASS training motion and 5 synthetic evaluation
   "sequences" (the data shape of the reference's 5-sequence benchmark).
2. Train the full-size local + global priors on-device.
3. Optimize every sequence with the fastest verified configuration and
   print the reference-style per-sequence metric summaries, overall
   averages, and total optimization wall-clock.

Run:  python scripts/run_headline.py   (~15 min on one v5e; most of it
is the two 768-epoch prior trainings)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from globalegomocap_tpu.config import (
        OptimizeConfig, PriorConfig, SolverConfig, TrainConfig)
    from globalegomocap_tpu.data.amass import AmassWindows
    from globalegomocap_tpu.data.synthetic import (
        synthetic_amass, synthetic_chunk)
    from globalegomocap_tpu.data.test_data import TestChunk
    from globalegomocap_tpu.evaluation.metrics import calculate_errors
    from globalegomocap_tpu.models.conv_vae import ConvVAE
    from globalegomocap_tpu.optimize.driver import (
        SequenceOptimizer, build_model, print_summary)
    from globalegomocap_tpu.optimize.window import num_windows
    from globalegomocap_tpu.train.train_vae import Trainer
    from globalegomocap_tpu.utils.profiling import ThroughputMeter

    print("=== 1/3 generating synthetic AMASS motion ===", flush=True)
    seqs = synthetic_amass(n_sequences=10, frames_per_seq=250, seed=5)

    def train(local_pose):
        # Training recipe for the small synthetic corpus (see
        # prior_recon_sweep / prior_floor / prior_bn / prior_kl0
        # experiments + /tmp runs committed as *_experiment.json):
        # the reference's real-AMASS kl_weight regime posterior-collapses
        # here — ANY kl > 0 caps recon at ~0.065-0.11, above the injected
        # estimation noise (~0.048), so decoding through the prior
        # REGRESSED raw-global metrics (the round-1 headline regression).
        # kl=0 + a near-deterministic posterior init (logvar -6) + cosine
        # decay + enough steps trains recon to ~0.009, the regime the
        # reference's released checkpoints are in on real AMASS.
        epochs = int(os.environ.get("HEADLINE_EPOCHS", "768"))
        kl = float(os.environ.get("HEADLINE_KL", "0.0"))
        lr = float(os.environ.get("HEADLINE_LR", "1e-3"))
        cfg = TrainConfig(latent_dim=2048, seq_length=10, epochs=epochs,
                          batch_size=64, kl_weight=kl,
                          learning_rate=lr, lr_schedule="cosine",
                          lr_final=3e-5, logvar_init_bias=-6.0,
                          log_step=0,
                          # one launch per epoch + eval only at the end:
                          # 0.494 -> 0.118 s/epoch (train_bench_scan.json)
                          epoch_scan=os.environ.get(
                              "HEADLINE_EPOCH_SCAN", "1") == "1",
                          eval_every=epochs)
        ds = AmassWindows.from_sequences(seqs, frame_num=10,
                                         local_pose=local_pose)
        trainer = Trainer(cfg, ds, AmassWindows(ds.windows[::17]),
                          ConvVAE(latent_dim=2048, seq_len=10))
        t0 = time.time()
        trainer.train(log_fn=lambda *_: None)
        print(f"  {'local' if local_pose else 'global'} prior: recon "
              f"MPJPE {trainer.evaluate():.4f} ({time.time()-t0:.0f}s)",
              flush=True)
        return trainer.variables

    print("=== 2/3 training full-size priors on device ===", flush=True)

    def cached_train(local_pose):
        # HEADLINE_PRIOR_CACHE=dir reuses priors trained with the same
        # recipe+corpus (quality_iter_crop.py writes the same files);
        # default unset — the headline stays a self-contained run
        cache = os.environ.get("HEADLINE_PRIOR_CACHE", "")
        if not cache:
            return train(local_pose)
        name = "local" if local_pose else "global"
        epochs = int(os.environ.get("HEADLINE_EPOCHS", "768"))
        path = os.path.join(cache, f"{name}_{epochs}.msgpack")
        if os.path.exists(path):
            from globalegomocap_tpu.models.checkpoint import load_msgpack
            print(f"  {name} prior loaded from cache {path}", flush=True)
            return jax.tree_util.tree_map(jnp.asarray, load_msgpack(path))
        return train(local_pose)

    local_vars = cached_train(True)
    global_vars = cached_train(False)

    print("=== 3/3 optimizing 5 sequences ===", flush=True)
    # the fastest quality-verified configuration (perf_levers_r1.json,
    # tests/test_e2e_quality.py::test_production_config_quality)
    # max_iter 15 beats 25 and history 5 beats 10 on BOTH speed and
    # quality with trained priors (quality_iter_crop.json,
    # quality_iter_crop_m5.json — iter15/crop16/m5 has the best
    # raw-global MPJPE of every measured config); crop16 is exactly
    # lossless vs full maps
    # K=2 step candidates further improve raw-global and camera error
    # (quality_iter_crop_k3.json: 0.03589 / 0.02873)
    # stage-2 weight split: global_weight_3d=1.0 (100x the reference's
    # hard-coded split).  stage2_experiment.json: on this exact-camera
    # corpus the reference split makes stage 2 DEGRADE mid (raw 0.03376 ->
    # 0.03628) because there is no trajectory error to fix and the global
    # prior can only add its decode floor; the strong 3d anchor bounds
    # that to +0.0006 raw while bone-aligned IMPROVES, and under SLAM-like
    # camera noise (the reference's real regime) it is ALSO the best
    # config (raw 0.07740 -> 0.07604).
    from globalegomocap_tpu.config import EnergyConfig
    g3d = float(os.environ.get("HEADLINE_GLOBAL_W3D", "1.0"))
    fused = os.environ.get("HEADLINE_FUSED", "1") == "1"
    # residual stage-2 parametrization (EnergyConfig.global_residual):
    # p(z) = mid + decode(z) - decode(z0), exact at init — the global
    # stage can no longer regress stage 1 through its decode floor, and
    # it improves EVERY metric family in both the exact-camera and the
    # SLAM-noise regime (stage2_residual.json: clean bone-aligned
    # 0.02176 -> 0.02039 vs 0.02172 for the best plain split; camnoise
    # raw 0.07740 -> 0.07575).  Production default since round 3.
    residual = os.environ.get("HEADLINE_RESIDUAL", "1") == "1"
    cfg = OptimizeConfig(prior=PriorConfig(latent_dim=2048, seq_len=10),
                         energy=EnergyConfig(global_weight_3d=g3d,
                                             global_residual=residual),
                         solver=SolverConfig(method="lbfgs_fixed",
                                             fused_probes=True,
                                             # round-4 fast tier: 12/m2
                                             # (m2 gate quality_iter_
                                             # crop_m2*.json passes on
                                             # v1 + camnoise, +6.6%
                                             # synced at c320); the
                                             # guard restores the robust
                                             # tier on degraded corpora
                                             history_size=int(
                                                 os.environ.get(
                                                     "HEADLINE_HISTORY",
                                                     "2")),
                                             max_iter=int(os.environ.get(
                                                 "HEADLINE_MAX_ITER",
                                                 "12")),
                                             fused_energy=fused,
                                             step_candidates=(1.0, 0.1),
                                             # scan unroll: scheduling-only
                                             # (outputs bitwise-identical,
                                             # unroll_chunks_ab.json)
                                             unroll=int(os.environ.get(
                                                 "HEADLINE_UNROLL", "5")),
                                             # stage-2 budget: metrics
                                             # identical 3..15 on both
                                             # corpora (s2iter artifacts)
                                             global_max_iter=(
                                                 None if os.environ.get(
                                                     "HEADLINE_S2_ITER",
                                                     "3") == "none"
                                                 else int(os.environ.get(
                                                     "HEADLINE_S2_ITER",
                                                     "3")))),
                         sampling_impl="dense", heatmap_crop=16,
                         fold_bn=True, dense_decoder=True,
                         # conv wins the round-3 decoder rematch
                         # (decoder_rematch_ab.json) and is the exact
                         # reference formulation
                         decoder_impl=os.environ.get("HEADLINE_DECODER",
                                                     "conv"),
                         # bf16 solver state as a delta around the f32
                         # mu (f32 encode/offset/output like the mixed
                         # tier): +14.9% over mixed at c320
                         # (dtype_tier_ab.json); bone matches mixed on
                         # all three gate corpora
                         # (quality_iter_crop_f32head*.json) — default
                         # since round 5
                         compute_dtype=os.environ.get(
                             "HEADLINE_COMPUTE_DTYPE", "bfloat16_delta"),
                         # bf16 staged heat crops (f32 kernel math):
                         # +2.5% and quality-gated at crop8
                         # (quality_iter_crop_heat16.json); these strict
                         # gates re-validate it at the headline's crop16
                         heatmap_dtype=os.environ.get(
                             "HEADLINE_HEATMAP_DTYPE", "bfloat16"))
    opt = SequenceOptimizer(build_model(cfg), local_vars, global_vars, cfg)

    # 5 sequences x 5 chunks x 100 frames (the reference's scale)
    sequences = {
        f"synthetic-{i}": [
            TestChunk(*(jax.device_put(jnp.asarray(a))
                        for a in synthetic_chunk(100, seed=1000 * i + j)))
            for j in range(5)]
        for i in range(5)
    }

    # stage each sequence ONCE (stacking + crop-guard readback are
    # per-dataset costs; the hot call is then a single program launch —
    # fixed_cost_probe.json) and warm up the compiled program
    staged = {name: opt.stage(chunks)
              for name, chunks in sequences.items()}
    jax.block_until_ready(opt.optimize_chunks_batched(
        next(iter(staged.values())), mode="flat").optimized)

    meter = ThroughputMeter(unit="windows")
    overall = {}
    for name, chunks in sequences.items():
        per_chunk = []
        with meter.measure(num_windows(100) * len(chunks)):
            res = opt.optimize_chunks_batched(staged[name], mode="flat")
            jax.block_until_ready(res.optimized)
        for i in range(len(chunks)):
            per_chunk.append({k: np.asarray(v) for k, v in calculate_errors(
                res.estimated[i], res.mid[i], res.optimized[i],
                res.gt[i]).items()})
        avg = {k: np.mean([e[k] for e in per_chunk], axis=0)
               for k in per_chunk[0]}
        overall[name] = avg
        print(f"--- {name} ---")
        print_summary(avg)

    print("=== overall ===")
    keys = next(iter(overall.values())).keys()
    mean = {k: np.mean([v[k] for v in overall.values()], axis=0)
            for k in keys}
    for k in keys:
        if k != "joints_error":
            print(f"{k}: {float(mean[k]):.5f}")
    print(f"optimization throughput: {meter.report()}")
    print(f"total optimization wall-clock: {meter.total_seconds:.2f}s "
          f"for 25 chunks / 300 windows / 5 sequences")

    # regression tripwires: the flagship run must improve the paper's
    # headline quantities — pose error IN GLOBAL SPACE and the hip-midpoint
    # ("camera") trajectory error (reference: calculate_errors.py:116-121)
    # — not only the aligned variants.  HEADLINE_ASSERT=0 skips (for
    # ablation experiments).
    if os.environ.get("HEADLINE_ASSERT", "1") != "0":
        checks = [
            ("optimized_global_mpjpe", "original_global_mpjpe"),
            ("optimized_camera_pos_error", "original_camera_pos_error"),
            ("aligned_optimized_mpjpe", "aligned_original_mpjpe"),
            ("bone_length_aligned_optimized_mpjpe",
             "bone_length_aligned_original_mpjpe"),
        ]
        for opt_k, orig_k in checks:
            assert float(mean[opt_k]) < float(mean[orig_k]), (
                f"HEADLINE REGRESSION: {opt_k}={float(mean[opt_k]):.5f} "
                f"not better than {orig_k}={float(mean[orig_k]):.5f}")
        # mid-vs-optimized tripwires (the reference's own stage-2
        # regression check, optimize_whole_sequence.py:87-88, prints on
        # bone-aligned opt > mid).  With the residual stage-2
        # parametrization the global stage starts EXACTLY at mid (no
        # decode floor), so the gates are strict: stage 2 must not
        # regress any sequence beyond cross-backend solver scatter (1%),
        # and must IMPROVE the overall bone-aligned and raw-global
        # means.  (The old plain-decode stage needed a 3% decode-floor
        # allowance and still fired marginally under backend numeric
        # scatter — stage2_residual.json documents the fix.)
        for name, avg in overall.items():
            b_mid = float(avg["bone_length_aligned_mid_optimized_mpjpe"])
            b_opt = float(avg["bone_length_aligned_optimized_mpjpe"])
            assert b_opt <= b_mid * 1.01, (
                f"STAGE-2 REGRESSION ({name}): bone-aligned "
                f"mid {b_mid:.5f} -> optimized {b_opt:.5f}")
        bm = float(mean["bone_length_aligned_mid_optimized_mpjpe"])
        bo = float(mean["bone_length_aligned_optimized_mpjpe"])
        assert bo <= bm, (
            f"STAGE-2 REGRESSION: overall bone-aligned mid {bm:.5f} -> "
            f"optimized {bo:.5f}")
        r_mid = float(mean["mid_global_mpjpe"])
        r_opt = float(mean["optimized_global_mpjpe"])
        assert r_opt <= r_mid, (
            f"STAGE-2 REGRESSION: raw-global mid {r_mid:.5f} -> "
            f"optimized {r_opt:.5f}")
        print("headline quality tripwires: PASS "
              "(raw global, camera trajectory, aligned, bone-aligned; "
              "stage-2 mid-vs-opt: bone-aligned strictly improving "
              "overall and non-regressing per sequence, raw-global "
              "improving)")


if __name__ == "__main__":
    main()
