"""Optimize all chunks of a sequence directory.

Drop-in CLI for the reference's headline workload
(`python optimize_whole_sequence.py --data_path data/jian3 ...`,
reference: optimize_whole_sequence.py:9-23), same flags and defaults,
plus checkpoint-source and solver options.

    python -m globalegomocap_tpu.cli.optimize_sequence \
        --data_path data/jian3 \
        --local_ckpt <local_vae.msgpack|.pth.tar> \
        --global_ckpt <global_vae.msgpack|.pth.tar>
"""

from __future__ import annotations

import argparse


def str2bool(x: str) -> bool:
    return str(x).lower() == "true"


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--data_path", required=True, type=str)
    p.add_argument("--camera", default="egosyn", type=str,
                   help="built-in calibration name or a JSON path")
    p.add_argument("--vae", default=0.0, type=float)
    p.add_argument("--gmm", default=0.0, type=float)
    p.add_argument("--smooth", default=0.001, type=float)
    p.add_argument("--bone_length", default=0.01, type=float)
    p.add_argument("--weight_3d", default=0.01, type=float)
    p.add_argument("--reproj_weight", default=0.01, type=float)
    p.add_argument("--save", default=False, type=str2bool,
                   help="export aligned skeleton meshes as PLY")
    p.add_argument("--save_pose", default=False, type=str2bool,
                   help="write result_pose.pkl per chunk (reference:"
                        " optimizer.py:469-483)")
    p.add_argument("--final_smooth", default=True, type=str2bool)
    p.add_argument("--final_smooth_method", default="gaussian",
                   choices=["gaussian", "one_euro"])
    p.add_argument("--fold_bn", default=False, type=str2bool,
                   help="fold eval-mode BatchNorm into conv weights")
    p.add_argument("--dense_decoder", default=False, type=str2bool,
                   help="run the decoder as a banded-matmul chain (exact; "
                        "fewer kernels per objective eval)")
    p.add_argument("--decoder_impl", default="",
                   choices=["", "conv", "dense", "shift"],
                   help="decoder implementation override ('' derives from "
                        "--dense_decoder)")
    p.add_argument("--decoder_dtype", default="float32",
                   choices=["float32", "bfloat16"],
                   help="dense/shift decoder weight storage dtype")
    p.add_argument("--compute_dtype", default="float32",
                   choices=["float32", "bfloat16", "bfloat16_f32enc",
                            "bfloat16_f32head", "bfloat16_delta",
                            "bfloat16_pure"],
                   help="whole-prior activation dtype in the solve "
                        "(params stay f32): bfloat16 = the quality-gated "
                        "MIXED tier (f32 encode + f32 output decode); "
                        "bfloat16_f32enc keeps only the encode f32; "
                        "bfloat16_f32head keeps only the fc_mu init head "
                        "f32; bfloat16_delta keeps the f32 encode/output "
                        "but iterates the solver state in bf16 as a "
                        "delta around the f32 mu (pure-tier speed, "
                        "exact init); bfloat16_pure runs everything "
                        "bf16 (speed reference, +0.001 bone cost)")
    p.add_argument("--overlap_consistency", default=0.0, type=float,
                   help="cross-window coupling weight (joint "
                        "whole-sequence solve when > 0)")
    p.add_argument("--soft_smooth", default=0.0, type=float,
                   help="anchor-to-presmoothed-input weight (the "
                        "reference's soft_smooth_energy; 0 = off, "
                        "reference default)")
    p.add_argument("--input_smooth_sigma", default=1.0, type=float,
                   help="sigma of the per-window input pre-smoothing "
                        "feeding --soft_smooth")
    p.add_argument("--init", default="mu", choices=["mu", "sample"],
                   help="latent init: deterministic encoder mean or the "
                        "reference's stochastic reparameterized sample "
                        "(optimizer.py:257)")
    p.add_argument("--init_seed", default=0, type=int)
    p.add_argument("--merge", default=True, type=str2bool)
    p.add_argument("--local_ckpt", required=True, type=str)
    p.add_argument("--global_ckpt", required=True, type=str)
    p.add_argument("--latent_dim", default=2048, type=int)
    p.add_argument("--seq_len", default=10, type=int)
    p.add_argument("--hidden_dims", default="64,64,128,256,512", type=str,
                   help="comma-separated encoder channel widths")
    p.add_argument("--solver", default="lbfgs",
                   choices=["lbfgs", "lbfgs_fixed", "adam"])
    p.add_argument("--max_iter", default=25, type=int,
                   help="stage-1 L-BFGS iteration budget (reference "
                        "parity 25; the measured fast tier runs 12 — "
                        "quality_iter_crop_s1iter*.json; the crop-mass "
                        "guard restores >=15 on degraded corpora)")
    p.add_argument("--history_size", default=25, type=int,
                   help="L-BFGS history m (parity 25; the fast tier "
                        "runs 2 — quality_iter_crop_m2*.json; the guard "
                        "restores >=10 on degraded corpora)")
    p.add_argument("--step_candidates", default="1.0,0.5,0.1,0.02",
                   type=str,
                   help="lbfgs_fixed parallel line-search step fractions "
                        "(comma-separated); the fast tier runs 1.0,0.1 "
                        "(quality_iter_crop_kcand.json)")
    p.add_argument("--fused_probes", default=False, type=str2bool,
                   help="lbfgs_fixed: fold the accepted-point "
                        "value_and_grad into the candidate probe batch "
                        "(identical trajectory, fewer evals)")
    p.add_argument("--circular_history", default=False, type=str2bool,
                   help="lbfgs_fixed: pointer-indexed circular history "
                        "(one O(d) row write per iteration instead of "
                        "three O(m*d) roll copies; identical trajectory)")
    p.add_argument("--global_weight_3d", default=None, type=float,
                   help="stage-2 (global) 3d-anchor weight override; "
                        "None keeps the reference split (weight_3d). "
                        "stage2_experiment.json: 1.0 is best in both "
                        "clean and SLAM-noise regimes")
    p.add_argument("--global_smooth", default=None, type=float,
                   help="stage-2 smoothness weight override")
    p.add_argument("--global_residual", default=False, type=str2bool,
                   help="residual stage-2 parametrization: p(z) = mid + "
                        "decode(z) - decode(z0) — exact at init (no "
                        "decode floor); improves every metric family in "
                        "both camera regimes (stage2_residual.json)")
    p.add_argument("--local_residual", default=False, type=str2bool,
                   help="residual STAGE-1 parametrization (experimental; "
                        "measured NEGATIVE on the synthetic corpora — "
                        "the local stage denoises through the prior and "
                        "the residual form keeps the estimate's noise; "
                        "quality_iter_crop_s1res.json)")
    p.add_argument("--fused_energy", default=False, type=str2bool,
                   help="lbfgs_fixed: ONE Pallas kernel per objective "
                        "eval for the whole post-decode energy "
                        "(value + analytic grad); needs reproj + "
                        "heatmap_crop + float32 maps")
    p.add_argument("--global_max_iter", default=None, type=int,
                   help="lbfgs_fixed: stage-2 (global) iteration "
                        "override; None = same budget as stage 1 "
                        "(reference parity).  The residual global stage "
                        "converges from an exact init, so a smaller "
                        "budget can hold quality at lower latency")
    p.add_argument("--unroll", default=1, type=int,
                   help="lbfgs_fixed: lax.scan unroll factor for the "
                        "iteration loop (scheduling-only — outputs are "
                        "bitwise-identical at <=5; the production bench "
                        "runs 5: +7-9%% on the dispatch-bound path, "
                        "unroll_chunks_ab.json)")
    p.add_argument("--sampling", default="gather",
                   choices=["gather", "dense", "pallas"])
    p.add_argument("--heatmap_dtype", default="float32",
                   choices=["float32", "bfloat16"],
                   help="heatmap storage dtype inside the solver")
    p.add_argument("--heatmap_crop", default=0, type=int,
                   help="crop maps to k x k around their peaks before the "
                        "solve (0 = full maps, exact reference semantics)")
    p.add_argument("--heatmap_crop_min_mass", default=0.90, type=float,
                   help="fall back to full maps when the peak crops hold "
                        "less than this mean fraction of map mass "
                        "(multimodal-map guard; 0 disables)")
    p.add_argument("--guard_crop", default=0, type=int,
                   help="guard-trip fast path: stage k x k crops centered "
                        "at the PROJECTED INITIAL ESTIMATE (instead of "
                        "full maps) when the crop-mass guard trips — "
                        "keeps the fused-kernel path on multimodal/"
                        "flattened maps (0 = full-map fallback, parity)")
    p.add_argument("--out_dir", default="out", type=str)
    p.add_argument("--profile_dir", default=None, type=str,
                   help="capture a jax.profiler device trace here")
    return p


def load_variables(path: str, seq_len: int, hidden_dims):
    """Load prior variables from either a torch .pth.tar or a flax
    msgpack checkpoint."""
    import jax
    import jax.numpy as jnp
    if path.endswith((".pth.tar", ".pth", ".tar", ".pt")):
        from globalegomocap_tpu.models.torch_convert import (
            load_torch_checkpoint)
        v = load_torch_checkpoint(path, seq_len, hidden_dims)
    else:
        from flax import serialization
        with open(path, "rb") as f:
            blob = serialization.msgpack_restore(f.read())
        v = {"params": blob["params"], "batch_stats": blob["batch_stats"]}
    return jax.tree_util.tree_map(jnp.asarray, v)


def main(argv=None):
    args = build_parser().parse_args(argv)

    from globalegomocap_tpu.config import (
        OptimizeConfig, EnergyConfig, PriorConfig, SolverConfig)
    from globalegomocap_tpu.optimize.driver import (
        SequenceOptimizer, build_model, optimize_sequence_dir)

    cfg = OptimizeConfig(
        energy=EnergyConfig(vae=args.vae, gmm=args.gmm, smooth=args.smooth,
                            bone_length=args.bone_length,
                            weight_3d=args.weight_3d,
                            reproj=args.reproj_weight,
                            overlap_consistency=args.overlap_consistency,
                            soft_smooth=args.soft_smooth,
                            global_weight_3d=args.global_weight_3d,
                            global_smooth=args.global_smooth,
                            global_residual=args.global_residual,
                            local_residual=args.local_residual),
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
        sampling_impl=args.sampling,
        compute_dtype=args.compute_dtype,
        heatmap_dtype=args.heatmap_dtype,
        heatmap_crop=args.heatmap_crop,
        heatmap_crop_min_mass=args.heatmap_crop_min_mass,
        guard_crop=args.guard_crop,
        input_smooth_sigma=args.input_smooth_sigma,
        fold_bn=args.fold_bn,
        dense_decoder=args.dense_decoder,
        decoder_impl=args.decoder_impl,
        decoder_dtype=args.decoder_dtype,
        camera=args.camera,
        final_smooth=args.final_smooth,
        final_smooth_method=args.final_smooth_method,
        merge=args.merge,
    )
    model = build_model(cfg)
    hd = tuple(cfg.prior.hidden_dims)
    opt = SequenceOptimizer(
        model,
        load_variables(args.local_ckpt, args.seq_len, hd),
        load_variables(args.global_ckpt, args.seq_len, hd),
        cfg)

    if args.profile_dir:
        from globalegomocap_tpu.utils.profiling import device_trace
        with device_trace(args.profile_dir):
            errors, averages, timing = optimize_sequence_dir(
                opt, args.data_path)
    else:
        errors, averages, timing = optimize_sequence_dir(opt,
                                                         args.data_path)

    if args.save_pose and errors:
        import os
        import pickle
        from globalegomocap_tpu.data.test_data import (
            list_chunk_dirs, load_test_chunk)
        for chunk_dir in list_chunk_dirs(args.data_path):
            chunk = load_test_chunk(chunk_dir)
            _, est, mid_local, opt_seq, gt = opt.run(chunk,
                                                     with_metrics=False)
            name = os.path.basename(chunk_dir)
            out_dir = os.path.join(args.out_dir,
                                   os.path.basename(args.data_path), name)
            os.makedirs(out_dir, exist_ok=True)
            with open(os.path.join(out_dir, "result_pose.pkl"), "wb") as f:
                pickle.dump({"estimated_pose": est,
                             "optimized_pose": opt_seq,
                             "mid_optimized_pose": mid_local,
                             "gt_pose": gt}, f)

    if args.save and errors:
        import os
        import numpy as np
        from globalegomocap_tpu.data.test_data import (
            list_chunk_dirs, load_test_chunk)
        from globalegomocap_tpu.evaluation.metrics import (
            align_sequence_globally)
        from globalegomocap_tpu.tools.ply import save_skeleton_sequence
        for chunk_dir in list_chunk_dirs(args.data_path):
            chunk = load_test_chunk(chunk_dir)
            _, est, _, opt_seq, gt = opt.run(chunk, with_metrics=False)
            name = os.path.basename(chunk_dir)
            base = os.path.join(args.out_dir, name)
            save_skeleton_sequence(
                np.asarray(align_sequence_globally(opt_seq, gt)),
                os.path.join(base, "optimized_global_aligned"))
            save_skeleton_sequence(
                np.asarray(align_sequence_globally(est, gt)),
                os.path.join(base, "input_global_aligned"))
            save_skeleton_sequence(gt, os.path.join(base,
                                                    "gt_global_aligned"))
    return averages


if __name__ == "__main__":
    main()
