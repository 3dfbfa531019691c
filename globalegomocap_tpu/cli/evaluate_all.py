"""Evaluate every sequence directory under a dataset root in one run.

The reference is invoked once per sequence (README.md:28-34: five separate
`optimize_whole_sequence.py --data_path data/<seq>` runs); this entry point
sweeps them all with one warm compiled program and prints per-sequence and
overall averages plus total wall-clock — the "all 5 sequences in one
launch" workload of BASELINE.json.

    python -m globalegomocap_tpu.cli.evaluate_all --data_root data \
        --local_ckpt local.pth.tar --global_ckpt global.pth.tar
"""

from __future__ import annotations

import argparse
import os
import time

import numpy as np


def main(argv=None):
    from globalegomocap_tpu.cli.optimize_sequence import (
        build_parser, load_variables)
    p = argparse.ArgumentParser(description=__doc__,
                                parents=[build_parser()],
                                conflict_handler="resolve",
                                add_help=False)
    from globalegomocap_tpu.cli.optimize_sequence import str2bool
    p.add_argument("--data_root", required=True, type=str,
                   help="directory whose subdirectories are sequences")
    p.add_argument("--data_path", required=False, default=None)
    p.add_argument("--batched", default=True, type=str2bool,
                   help="solve each sequence's equal-length chunks in one "
                        "staged flat launch (falls back per-chunk when "
                        "lengths differ)")
    args = p.parse_args(argv)

    from globalegomocap_tpu.config import (
        OptimizeConfig, EnergyConfig, PriorConfig, SolverConfig)
    from globalegomocap_tpu.optimize.driver import (
        SequenceOptimizer, build_model, optimize_sequence_dir)

    cfg = OptimizeConfig(
        energy=EnergyConfig(vae=args.vae, gmm=args.gmm, smooth=args.smooth,
                            bone_length=args.bone_length,
                            weight_3d=args.weight_3d,
                            reproj=args.reproj_weight,
                            overlap_consistency=args.overlap_consistency),
        prior=PriorConfig(latent_dim=args.latent_dim, seq_len=args.seq_len,
                          hidden_dims=tuple(
                              int(x) for x in args.hidden_dims.split(","))),
        solver=SolverConfig(method=args.solver,
                            fused_probes=args.fused_probes),
        sampling_impl=args.sampling,
        heatmap_dtype=args.heatmap_dtype,
        heatmap_crop=args.heatmap_crop,
        fold_bn=args.fold_bn,
        dense_decoder=args.dense_decoder,
        decoder_impl=args.decoder_impl,
        decoder_dtype=args.decoder_dtype,
        heatmap_crop_min_mass=args.heatmap_crop_min_mass,
        camera=args.camera, final_smooth=args.final_smooth,
        final_smooth_method=args.final_smooth_method,
        merge=args.merge)
    model = build_model(cfg)
    hd = tuple(cfg.prior.hidden_dims)
    opt = SequenceOptimizer(
        model,
        load_variables(args.local_ckpt, args.seq_len, hd),
        load_variables(args.global_ckpt, args.seq_len, hd),
        cfg)

    sequences = sorted(
        d for d in os.listdir(args.data_root)
        if os.path.isdir(os.path.join(args.data_root, d)))
    t0 = time.perf_counter()
    per_seq = {}
    for seq in sequences:
        print(f"================ sequence: {seq} ================")
        _, averages, timing = optimize_sequence_dir(
            opt, os.path.join(args.data_root, seq), batched=args.batched)
        per_seq[seq] = averages
    total = time.perf_counter() - t0

    if per_seq:
        print("================ overall averages ================")
        keys = next(iter(per_seq.values())).keys()
        for k in keys:
            vals = [v[k] for v in per_seq.values()]
            print(f"{k}: {np.mean(vals, axis=0)}")
    print(f"total wall-clock for {len(per_seq)} sequences: {total:.2f}s")
    return per_seq


if __name__ == "__main__":
    main()
