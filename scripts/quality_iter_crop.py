"""Quality evidence for the round-2 speed knobs: max_iter and heatmap_crop.

perf_levers_r2c.json measured iter15 at 1147 vs iter25 at 1065 windows/s
(shift decoder) and crop8 at 1277.7 — both quality-unverified at the
round-2 prior recipe.  This experiment trains the full-size priors ONCE
with the headline recipe (kl0 / logvar -6 / cosine; see run_headline.py),
then evaluates each solver/crop configuration on the headline's exact
5-sequence workload, recording the four tripwire metrics + throughput so
defaults are chosen with evidence.

Run on the TPU: python scripts/quality_iter_crop.py
Writes quality_iter_crop.json.  QIC_EPOCHS overrides training length.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

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
        SequenceOptimizer, build_model)
    from globalegomocap_tpu.optimize.window import num_windows
    from globalegomocap_tpu.train.train_vae import Trainer

    epochs = int(os.environ.get("QIC_EPOCHS", "768"))
    # trained-prior cache: quality A/Bs dominate wall-clock with two
    # ~8-min trainings; QIC_CACHE=dir reuses priors across runs
    cache = os.environ.get("QIC_CACHE", "/tmp/qic_priors")
    # QIC_PRIOR_REGIME=v2 trains the priors on v2-statistics motion
    # (jerky: scale 0.10, 0.5-2.5 Hz) — deployment-matched priors, the
    # reference's real-AMASS-for-real-motion setup; default v1
    regime = os.environ.get("QIC_PRIOR_REGIME", "v1")

    def _regime_seqs(rg):
        if rg == "v2":
            return synthetic_amass(n_sequences=10, frames_per_seq=250,
                                   seed=5, motion_scale=0.10,
                                   freq_range=(0.5, 2.5))
        if rg == "v3":
            from globalegomocap_tpu.data.synthetic import (
                synthetic_motion_contacts)
            return synthetic_amass(n_sequences=10, frames_per_seq=250,
                                   seed=5,
                                   motion_fn=synthetic_motion_contacts)
        return synthetic_amass(n_sequences=10, frames_per_seq=250, seed=5)

    def train(local_pose, rg=None, rg_seqs=None):
        rg = rg or regime
        if rg_seqs is None:
            rg_seqs = _regime_seqs(rg)
        name = "local" if local_pose else "global"
        suffix = "" if rg == "v1" else f"_{rg}"
        path = os.path.join(cache, f"{name}_{epochs}{suffix}.msgpack")
        shape_ref = ConvVAE(latent_dim=2048, seq_len=10)
        if os.path.exists(path):
            from globalegomocap_tpu.models.checkpoint import load_msgpack
            print(f"{name} prior loaded from cache {path}", flush=True)
            return jax.tree_util.tree_map(jnp.asarray, load_msgpack(path))
        cfg = TrainConfig(latent_dim=2048, seq_length=10, epochs=epochs,
                          batch_size=64, kl_weight=0.0,
                          learning_rate=1e-3, lr_schedule="cosine",
                          lr_final=3e-5, logvar_init_bias=-6.0,
                          log_step=0)
        ds = AmassWindows.from_sequences(rg_seqs, frame_num=10,
                                         local_pose=local_pose)
        tr = Trainer(cfg, ds, AmassWindows(ds.windows[::17]), shape_ref)
        t0 = time.time()
        tr.train(log_fn=lambda *_: None)
        print(f"{name} prior recon "
              f"{tr.evaluate():.4f} ({time.time()-t0:.0f}s)", flush=True)
        if cache:
            os.makedirs(cache, exist_ok=True)
            from globalegomocap_tpu.models.checkpoint import save_msgpack
            save_msgpack(tr.variables, path)
        return tr.variables

    local_vars = train(True)
    global_vars = train(False)

    # the headline's exact 5x5-chunk workload; QIC_CORPUS=v2 swaps in the
    # second regime (jerky motion + SLAM camera noise + degraded maps —
    # VERDICT r2 #4 quality-robustness corpus)
    corpus = os.environ.get("QIC_CORPUS", "v1")
    if corpus == "v2":
        from globalegomocap_tpu.data.synthetic import synthetic_chunk_v2
        mk = synthetic_chunk_v2
    elif corpus == "v3":
        # discontinuous contacts + occlusion DROPOUT (joints vanishing)
        # + jitter-only cameras — the fast-tier de-risk corpus
        # (VERDICT r3 #6)
        from globalegomocap_tpu.data.synthetic import synthetic_chunk_v3
        mk = synthetic_chunk_v3
    elif corpus == "v2j":
        # jitter-only cameras: the error class the optimizer CAN fix
        # (drift is unobservable without loop closure and dominates v2's
        # raw-global metric)
        def mk(n, seed):
            return synthetic_chunk(
                n, seed,
                cam_noise={"drift_rot": 0.0, "drift_trans": 0.0,
                           "jitter_rot": 0.008, "jitter_trans": 0.008},
                degrade={}, motion_scale=0.10, freq_range=(0.5, 2.5))
    elif corpus == "camnoise":
        # SLAM drift+jitter with CLEAN maps and normal motion (the
        # stage2_experiment camnoise regime): the one cell where the
        # crop guard does NOT trip, so the stage-1 FAST tier actually
        # runs under camera noise — the tier-safety evidence the
        # degraded-map corpora can't provide (their guard restores the
        # robust tier anyway)
        def mk(n, seed):
            return synthetic_chunk(n, seed, cam_noise={})
    else:
        mk = synthetic_chunk
    chunks = [mk(100, seed=1000 * i + j)
              for i in range(5) for j in range(5)]
    chunks = [TestChunk(*(jax.device_put(jnp.asarray(a)) for a in c))
              for c in chunks]
    wins = num_windows(100) * len(chunks)

    metric_keys = ["original_global_mpjpe", "mid_global_mpjpe",
                   "optimized_global_mpjpe",
                   "original_camera_pos_error",
                   "optimized_camera_pos_error",
                   "aligned_original_mpjpe", "aligned_optimized_mpjpe",
                   "bone_length_aligned_original_mpjpe",
                   "bone_length_aligned_mid_optimized_mpjpe",
                   "bone_length_aligned_optimized_mpjpe"]

    results = []

    # stage-2 weight split matches the headline default
    # (stage2_experiment.json: global_weight_3d=1.0 best in both corpora)
    g3d = os.environ.get("QIC_GLOBAL_W3D", "1.0")
    g3d = None if g3d in ("", "ref") else float(g3d)

    def measure(label, max_iter, crop, history=10,
                candidates=(1.0, 0.5, 0.1, 0.02), fused_energy=False,
                residual=False, s1_residual=False, s2_iter=None,
                guard_crop=0, bank=None, lv=None, gv=None):
        from globalegomocap_tpu.config import EnergyConfig
        rscale = float(os.environ.get("QIC_REPROJ_SCALE", "1.0"))
        cfg = OptimizeConfig(
            guard_crop=guard_crop,
            prior=PriorConfig(latent_dim=2048, seq_len=10),
            energy=EnergyConfig(global_weight_3d=g3d,
                                global_residual=residual,
                                local_residual=s1_residual,
                                reproj=0.01 * rscale),
            solver=SolverConfig(method="lbfgs_fixed", fused_probes=True,
                                history_size=history, max_iter=max_iter,
                                step_candidates=tuple(candidates),
                                fused_energy=fused_energy,
                                global_max_iter=s2_iter,
                                unroll=int(os.environ.get("QIC_UNROLL",
                                                          "5"))),
            sampling_impl="dense", fold_bn=True, dense_decoder=True,
            decoder_impl=os.environ.get("QIC_DECODER", "conv"),
            compute_dtype=os.environ.get("QIC_COMPUTE_DTYPE", "float32"),
            heatmap_dtype=os.environ.get("QIC_HEAT_DTYPE", "float32"),
            heatmap_crop=crop)
        opt = SequenceOptimizer(build_model(cfg),
                                local_vars if lv is None else lv,
                                global_vars if gv is None else gv,
                                cfg, prior_bank=bank)
        staged = opt.stage(chunks)
        res = opt.optimize_chunks_batched(staged, mode="flat")  # compile
        jax.block_until_ready(res.optimized)
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            res = opt.optimize_chunks_batched(staged, mode="flat")
            jax.block_until_ready(res.optimized)
            ts.append(time.perf_counter() - t0)
        per_chunk = []
        for i in range(len(chunks)):
            e = calculate_errors(res.estimated[i], res.mid[i],
                                 res.optimized[i], res.gt[i])
            per_chunk.append({k: float(np.asarray(e[k]))
                              for k in metric_keys})
        rec = {"label": label, "max_iter": max_iter, "heatmap_crop": crop,
               "history": history,
               "windows_per_sec": round(wins / min(ts), 1),
               # crop-guard evidence: mean peak-crop mass coverage and
               # whether the guard kept the crop or fell back to full maps
               "crop_coverage": (None if staged.crop_coverage is None
                                 else round(float(staged.crop_coverage),
                                            4)),
               "crop_active": staged.origins is not None,
               # the crop size actually staged (the guard may swap the
               # fast-tier crop for guard_crop or full maps)
               "staged_k": (None if staged.origins is None else
                            int(round((staged.heat.shape[-1] / 15)
                                      ** 0.5)))}
        if bank is not None:
            rec["selected_prior"] = opt.last_prior_name
            rec["batch_accel"] = (None if staged.accel_mean is None
                                  else round(staged.accel_mean, 6))
        for k in metric_keys:
            rec[k] = round(float(np.mean([e[k] for e in per_chunk])), 5)
        rec["tripwires_pass"] = bool(
            rec["optimized_global_mpjpe"] < rec["original_global_mpjpe"]
            and rec["optimized_camera_pos_error"]
            < rec["original_camera_pos_error"]
            and rec["aligned_optimized_mpjpe"]
            < rec["aligned_original_mpjpe"]
            and rec["bone_length_aligned_optimized_mpjpe"]
            < rec["bone_length_aligned_original_mpjpe"])
        # stage-2 value gates (VERDICT r2 #1): optimized vs the stage-1
        # mid output — bone-aligned strict, raw-global with the
        # decode-floor allowance (see run_headline.py tripwires)
        rec["stage2_bone_ok"] = bool(
            rec["bone_length_aligned_optimized_mpjpe"]
            <= rec["bone_length_aligned_mid_optimized_mpjpe"] * 1.01)
        rec["stage2_raw_ok"] = bool(
            rec["optimized_global_mpjpe"]
            <= rec["mid_global_mpjpe"] * 1.03)
        results.append(rec)
        print(json.dumps(rec), flush=True)
        suffix = os.environ.get("QIC_ONLY", "")
        if corpus == "v2j":
            suffix = f"{suffix}_jit" if suffix else "jit"
        elif corpus != "v1" and suffix not in ("", corpus) \
                and not suffix.startswith(corpus):
            # arm sets runnable on multiple corpora (e.g. s2iter) must not
            # overwrite each other's artifacts
            suffix = f"{suffix}_{corpus}"
        if regime != "v1":
            suffix = f"{suffix}_p{regime}" if suffix else f"p{regime}"
        name = f"quality_iter_crop_{suffix}.json" if suffix \
            else "quality_iter_crop.json"
        with open(os.path.join(REPO, name), "w") as f:
            json.dump(results, f, indent=1)

    only = os.environ.get("QIC_ONLY", "")
    if only == "bf16":
        # whole-prior bf16 activations in the SOLVE (params f32): +24%
        # synced at c320 (c320_dtype_rematch_ab.json) — gate the quality
        # drift vs f32 at the full production tier, per corpus
        for dt, lbl in (("float32", "f32"), ("bfloat16", "bf16")):
            os.environ["QIC_COMPUTE_DTYPE"] = dt
            measure(f"dtype_{lbl}_i12_m3_s2_3_fused_res", 12, 8,
                    history=3, candidates=(1.0, 0.1), fused_energy=True,
                    residual=True, s2_iter=3)
        del os.environ["QIC_COMPUTE_DTYPE"]
        return
    if only == "f32head":
        # VERDICT r4 #3: close the pure-bf16 quality gap cheaply — the
        # pure tier's +0.0007 bone cost is localized to the bf16-encoded
        # init mu (bench_gap_probe.json), so an f32 fc_mu head on an
        # otherwise-pure-bf16 solve (compute_dtype=bfloat16_f32head)
        # should recover mixed-tier bone at near-pure speed.  Gate all
        # three arms same-session at the FULL production point (m2 tier,
        # bf16 heat) per corpus: done-bar is f32head bone within +0.0003
        # of mixed.
        had_heat = os.environ.get("QIC_HEAT_DTYPE")
        os.environ.setdefault("QIC_HEAT_DTYPE", "bfloat16")
        for dt, lbl in (("bfloat16", "mixed"),
                        ("bfloat16_f32head", "f32head"),
                        ("bfloat16_delta", "delta"),
                        ("bfloat16_pure", "pure")):
            os.environ["QIC_COMPUTE_DTYPE"] = dt
            measure(f"dtype_{lbl}_i12_m2_s2_3_fused_res", 12, 8,
                    history=2, candidates=(1.0, 0.1), fused_energy=True,
                    residual=True, s2_iter=3)
        del os.environ["QIC_COMPUTE_DTYPE"]
        if had_heat is None:
            del os.environ["QIC_HEAT_DTYPE"]
        return
    if only == "heat16":
        # bf16 heat crops through the mega-kernel (heat_dtype_ab.json):
        # the only math change is bf16 rounding of crop VALUES (<= 2^-9
        # relative); gate vs f32 heat at the full production tier
        # (compute_dtype stays bf16 — the production mixed-precision arm)
        os.environ["QIC_COMPUTE_DTYPE"] = "bfloat16"
        for hd, lbl in (("float32", "hf32"), ("bfloat16", "hbf16")):
            os.environ["QIC_HEAT_DTYPE"] = hd
            measure(f"heat_{lbl}_i12_m3_s2_3_fused_res", 12, 8,
                    history=3, candidates=(1.0, 0.1), fused_energy=True,
                    residual=True, s2_iter=3)
        del os.environ["QIC_HEAT_DTYPE"]
        del os.environ["QIC_COMPUTE_DTYPE"]
        return
    if only == "bank":
        # prior-regime auto-selection (optimize/prior_bank.py, VERDICT
        # r3 #7): a bank holding the v1- and v2-regime trained prior
        # pairs, each tagged with its training-motion statistic.  Run
        # with QIC_CORPUS=v2: the staged batches' statistic must select
        # the v2 prior, and the metrics must reproduce the hand-matched
        # `_pv2` runs (same variables -> same program); the v1 corpus
        # must keep selecting the v1 prior.  Arms: hand-picked v1 prior
        # (the mismatch price), hand-picked matched prior (the target),
        # bank auto-selection (must equal the matched arm).
        from globalegomocap_tpu.optimize.prior_bank import (
            PriorBank, windows_accel_stat)
        lv1, gv1 = train(True, rg="v1"), train(False, rg="v1")
        lv2, gv2 = train(True, rg="v2"), train(False, rg="v2")
        a_v1 = windows_accel_stat(AmassWindows.from_sequences(
            _regime_seqs("v1"), frame_num=10, local_pose=True).windows)
        a_v2 = windows_accel_stat(AmassWindows.from_sequences(
            _regime_seqs("v2"), frame_num=10, local_pose=True).windows)
        bank = (PriorBank().add("prior_v1", lv1, gv1, a_v1)
                .add("prior_v2", lv2, gv2, a_v2))
        print(f"bank stats: v1={a_v1:.6f} v2={a_v2:.6f}", flush=True)
        measure("bank_handpicked_v1", 12, 8, history=3,
                candidates=(1.0, 0.1), fused_energy=True, residual=True,
                s2_iter=3, lv=lv1, gv=gv1)
        measure("bank_handpicked_matched", 12, 8, history=3,
                candidates=(1.0, 0.1), fused_energy=True, residual=True,
                s2_iter=3,
                lv=(lv2 if corpus.startswith("v2") else lv1),
                gv=(gv2 if corpus.startswith("v2") else gv1))
        measure("bank_auto", 12, 8, history=3, candidates=(1.0, 0.1),
                fused_energy=True, residual=True, s2_iter=3, bank=bank)
        return
    if only == "gcrop":
        # guard-trip fast path (OptimizeConfig.guard_crop): on a corpus
        # whose maps trip the crop-mass guard, compare the full-map XLA
        # fallback (the current robust tier — its speed was never
        # recorded, VERDICT r3 #4) against estimate-centered crops that
        # keep the fused-kernel path.  Run with QIC_CORPUS=v2 (and the
        # matched prior via QIC_PRIOR_REGIME=v2 for absolute numbers).
        # The guard's robust solver tier (iter>=15/m10/K4) engages
        # identically in every arm — only the energy path differs.
        for gc, lbl in ((0, "g0_fullmap"), (8, "g8"), (16, "g16"),
                        (24, "g24")):
            measure(f"gcrop_{lbl}_fused_res_s2_3", 12, 8, history=3,
                    candidates=(1.0, 0.1), fused_energy=True,
                    residual=True, s2_iter=3, guard_crop=gc)
        return
    if only == "v3":
        # VERDICT r3 #6 — de-risk the fast tier on the THIRD regime
        # (discontinuous contacts + occlusion dropout, QIC_CORPUS=v3):
        # the production stack (iter12/m3 + crop8 + bf16 compute/heat +
        # fused + residual s2=3) must either pass the strict gates or
        # the crop-mass guard must catch the regime (dropout floors pull
        # coverage down) and restore the robust tier; guard_crop=8 then
        # keeps the fused kernel under that tier.  Run with
        # QIC_PRIOR_REGIME=v3 for deployment-matched absolute numbers.
        os.environ["QIC_COMPUTE_DTYPE"] = "bfloat16"
        os.environ["QIC_HEAT_DTYPE"] = "bfloat16"
        # the production fast tier exactly as bench/headline run it
        # (guard may veto the staged crop and deepen the solve)
        measure("v3_prod_i12_m3_s2_3_fused_res_bf16", 12, 8, history=3,
                candidates=(1.0, 0.1), fused_energy=True, residual=True,
                s2_iter=3)
        # guard-trip fast path: estimate-centered crops keep the fused
        # kernel when the guard rejects argmax-centered staging
        measure("v3_gcrop8_i12_m3_s2_3_fused_res_bf16", 12, 8,
                history=3, candidates=(1.0, 0.1), fused_energy=True,
                residual=True, s2_iter=3, guard_crop=8)
        # the robust tier explicitly (deep solve, full maps) — the
        # quality ceiling this regime can reach
        measure("v3_robust_i25_m10_K4_fullmap_res", 25, 0, history=10,
                fused_energy=True, residual=True)
        del os.environ["QIC_COMPUTE_DTYPE"]
        del os.environ["QIC_HEAT_DTYPE"]
        # f32 anchor at the fast tier (bf16 drift check on contacts)
        measure("v3_prod_i12_m3_s2_3_fused_res_f32", 12, 8, history=3,
                candidates=(1.0, 0.1), fused_energy=True, residual=True,
                s2_iter=3)
        return
    if only == "m2":
        # dispatch_floor_ab.json measured history m2 +6.6% synced over
        # the m3 production tier (the L-BFGS bookkeeping share grew when
        # bf16 halved the eval math) — SPEED ONLY until this gate: m2
        # must match m3 on both metric families at the full production
        # stack (run on v1 AND camnoise; degraded-map corpora restore
        # the robust tier anyway)
        os.environ["QIC_COMPUTE_DTYPE"] = "bfloat16"
        os.environ["QIC_HEAT_DTYPE"] = "bfloat16"
        for m in (3, 2):
            measure(f"m{m}_i12_s2_3_fused_res_bf16", 12, 8, history=m,
                    candidates=(1.0, 0.1), fused_energy=True,
                    residual=True, s2_iter=3)
        del os.environ["QIC_COMPUTE_DTYPE"]
        del os.environ["QIC_HEAT_DTYPE"]
        return
    if only == "kcand":
        # line-search candidate count at the round-3 fast tier: K=2
        # (1.0, 0.1) beat K=4 in round 2; K=1 halves the probe batch the
        # kernels see per iteration (no fallback step if 1.0 fails
        # Armijo — the iteration then keeps the carried point)
        for cands, lbl in (((1.0, 0.1), "K2"), ((1.0,), "K1"),
                           ((0.5,), "K1_half"), ((1.0, 0.5, 0.1, 0.02),
                                                 "K4")):
            measure(f"k_{lbl}_i12_m3_s2_3_fused_res", 12, 8, history=3,
                    candidates=cands, fused_energy=True, residual=True,
                    s2_iter=3)
        return
    if only == "s1iter":
        # stage-1 budget under the FULL round-3 production stack
        # (fused + residual + s2=3 + conv decoder): the old fine grid
        # (quality_iter_crop_fine.json) measured iter12 BETTER than
        # iter15 on raw-global pre-residual — re-test now that stage 1
        # is ~80% of the launch
        for it, m in ((15, 5), (12, 5), (10, 5), (8, 5), (12, 3),
                      (10, 3)):
            measure(f"s1_{it}_m{m}_s2_3_fused_res", it, 8, history=m,
                    candidates=(1.0, 0.1), fused_energy=True,
                    residual=True, s2_iter=3)
        return
    if only == "s2iter":
        # stage-2 iteration budget (solver.global_max_iter): the residual
        # global stage starts EXACT at its init, so its corrections may
        # converge well before the local stage's 15 iterations — each
        # stage-2 iteration costs ~0.9 ms of launch time
        # (iter_decomp_r3.json).  Quality gates decide.
        for s2 in (15, 10, 8, 5, 3):
            measure(f"iter15_s2_{s2}_crop8_m5_K2_fused_res", 15, 8,
                    history=5, candidates=(1.0, 0.1), fused_energy=True,
                    residual=True, s2_iter=s2)
        return
    if only == "v2":
        # re-validate the round-2 defaults on the v2 corpus (+ the fused
        # mega-kernel path at the production operating point)
        measure("v2_iter15_crop8_m5_K2", 15, 8, history=5,
                candidates=(1.0, 0.1))
        measure("v2_iter25_crop8_m5_K2", 25, 8, history=5,
                candidates=(1.0, 0.1))
        measure("v2_iter15_crop16_m5_K2", 15, 16, history=5,
                candidates=(1.0, 0.1))
        measure("v2_iter15_crop8_m10_K4", 15, 8, history=10)
        measure("v2_iter15_crop0_m5_K2", 15, 0, history=5,
                candidates=(1.0, 0.1))
        measure("v2_iter15_crop8_m5_K2_fused", 15, 8, history=5,
                candidates=(1.0, 0.1), fused_energy=True)
        return
    if only == "residual":
        # the residual global stage at the production operating point:
        # re-verify the fast-tier knob orderings (iter/crop/m/K) hold
        # with the round-3 production default (residual + fused kernels)
        measure("iter15_crop8_m5_K2_fused_res", 15, 8, history=5,
                candidates=(1.0, 0.1), fused_energy=True, residual=True)
        measure("iter15_crop8_m5_K2_fused_plain", 15, 8, history=5,
                candidates=(1.0, 0.1), fused_energy=True)
        measure("iter25_crop8_m5_K2_fused_res", 25, 8, history=5,
                candidates=(1.0, 0.1), fused_energy=True, residual=True)
        measure("iter15_crop16_m5_K2_fused_res", 15, 16, history=5,
                candidates=(1.0, 0.1), fused_energy=True, residual=True)
        measure("iter15_crop8_m10_K4_fused_res", 15, 8, history=10,
                fused_energy=True, residual=True)
        measure("iter15_crop8_m5_K2_xla_res", 15, 8, history=5,
                candidates=(1.0, 0.1), residual=True)
        return
    if only == "s1res":
        # stage-1 residual probe (EnergyConfig.local_residual): does the
        # decode-floor argument transfer to the local stage, or does
        # residual keep the estimate's noise?  (TODO round-4 item)
        measure("s1res_iter15_crop8_m5_K2_fused", 15, 8, history=5,
                candidates=(1.0, 0.1), fused_energy=True, residual=True,
                s1_residual=True)
        measure("s1base_iter15_crop8_m5_K2_fused", 15, 8, history=5,
                candidates=(1.0, 0.1), fused_energy=True, residual=True)
        return
    if only == "fused":
        # the mega-kernel path vs the XLA path at the production operating
        # point: same config, quality must match (fused_ab.json measured
        # +49% synced / +73% pipelined throughput)
        measure("iter15_crop8_m5_K2_xla", 15, 8, history=5,
                candidates=(1.0, 0.1))
        measure("iter15_crop8_m5_K2_fused", 15, 8, history=5,
                candidates=(1.0, 0.1), fused_energy=True)
        measure("iter15_crop16_m5_K2_fused", 15, 16, history=5,
                candidates=(1.0, 0.1), fused_energy=True)
        return
    if only == "v2reproj":
        # degraded-map robustness lever: reduced reprojection weight
        # (distractor peaks mislead the heatmap term on the v2 maps)
        global_results = results
        for scale, lbl in ((1.0, "r1"), (0.25, "r025"), (0.0, "r0")):
            os.environ["QIC_REPROJ_SCALE"] = str(scale)
            measure(f"v2_iter15_m5_K2_reproj_{lbl}", 15, 8, history=5,
                    candidates=(1.0, 0.1))
        return
    if only == "fine":
        # sensitivity around the chosen operating point (iter15/m5/K2):
        # is the sweet spot flat or are we on an edge?
        measure("iter15_K2_m5", 15, 8, history=5, candidates=(1.0, 0.1))
        measure("iter12_K2_m5", 12, 8, history=5, candidates=(1.0, 0.1))
        measure("iter18_K2_m5", 18, 8, history=5, candidates=(1.0, 0.1))
        measure("iter15_K2_m3", 15, 8, history=3, candidates=(1.0, 0.1))
        measure("iter15_K2_m5_c16", 15, 16, history=5,
                candidates=(1.0, 0.1))
        return
    if only == "k3":
        # fewer line-search probes: K=3 cuts 25% of eval FLOPs per
        # iteration but changes trajectories — needs quality evidence
        measure("iter15_crop8_m5_K4", 15, 8, history=5)
        measure("iter15_crop8_m5_K3", 15, 8, history=5,
                candidates=(1.0, 0.5, 0.1))
        measure("iter15_crop8_m5_K2", 15, 8, history=5,
                candidates=(1.0, 0.1))
        measure("iter20_crop8_m5_K2", 20, 8, history=5,
                candidates=(1.0, 0.1))
        return
    if only == "m5":
        # round-2e follow-up: m=5 quality (4695 w/s at batch 40 vs 3958
        # at m=10; perf_levers_r2e.json)
        measure("iter15_crop8_m5", 15, 8, history=5)
        measure("iter15_crop16_m5", 15, 16, history=5)
        measure("iter15_crop8_m10", 15, 8, history=10)   # same-prior anchor
        return

    measure("iter25_crop16", 25, 16)   # current default
    measure("iter15_crop16", 15, 16)
    measure("iter20_crop16", 20, 16)
    measure("iter25_crop8", 25, 8)
    measure("iter15_crop8", 15, 8)
    measure("iter25_crop0", 25, 0)     # full maps: the quality ceiling


if __name__ == "__main__":
    main()
