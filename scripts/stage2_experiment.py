"""Stage-2 (global prior) value analysis — VERDICT r2 item #1.

The round-2 headline artifact showed stage 2 DEGRADING raw-global MPJPE
vs the stage-1 (mid) output (0.03296 -> 0.03581).  Hypothesis: the
synthetic corpus used exact camera trajectories, so the global stage —
whose job in the reference is to correct SLAM drift/jitter
(optimizer.py:352-353 gives it the full 3d/smooth weights and no reproj
term) — has nothing to fix and can only add its decode/recon floor
(~0.008 recon MPJPE).

This experiment runs the headline configuration on:
  (a) the clean-camera corpus (round-2 headline regime), and
  (b) a SLAM-noise corpus (perturb_camera_trajectory: drift + jitter,
      the reference's real-data regime),
crossed with stage-2 weight overrides (global_weight_3d / global_smooth),
and records mid-vs-optimized for the global/aligned metric families.

Run on TPU:  python scripts/stage2_experiment.py
Priors: QIC_CACHE (default /tmp/qic_priors) must hold local_768/global_768
msgpacks (quality_iter_crop.py writes them).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from dataclasses import replace

    from globalegomocap_tpu.config import (
        OptimizeConfig, PriorConfig, SolverConfig)
    from globalegomocap_tpu.data.synthetic import synthetic_chunk
    from globalegomocap_tpu.data.test_data import TestChunk
    from globalegomocap_tpu.evaluation.metrics import calculate_errors
    from globalegomocap_tpu.models.checkpoint import load_msgpack
    from globalegomocap_tpu.optimize.driver import (
        SequenceOptimizer, build_model)

    cache = os.environ.get("QIC_CACHE", "/tmp/qic_priors")
    local_vars = jax.tree_util.tree_map(
        jnp.asarray, load_msgpack(os.path.join(cache, "local_768.msgpack")))
    global_vars = jax.tree_util.tree_map(
        jnp.asarray, load_msgpack(os.path.join(cache, "global_768.msgpack")))

    base_cfg = OptimizeConfig(
        prior=PriorConfig(latent_dim=2048, seq_len=10),
        solver=SolverConfig(method="lbfgs_fixed", fused_probes=True,
                            history_size=5, max_iter=15,
                            step_candidates=(1.0, 0.1)),
        sampling_impl="dense", heatmap_crop=16,
        fold_bn=True, dense_decoder=True, decoder_impl="shift")
    model = build_model(base_cfg)

    n_seqs = int(os.environ.get("S2_SEQS", "3"))
    n_chunks = int(os.environ.get("S2_CHUNKS", "3"))

    corpora = {
        "clean": None,
        "camnoise": {},   # perturb_camera_trajectory defaults
    }
    # stage-2 weight overrides: None entries keep the reference split
    weight_cfgs = {
        "ref_split": {},
        "w3d_x10": {"global_weight_3d": 0.1},
        "w3d_x100": {"global_weight_3d": 1.0},
        "smooth_x10": {"global_smooth": 0.01},
        "w3d_x10_smooth_x10": {"global_weight_3d": 0.1,
                               "global_smooth": 0.01},
        # residual parametrization (EnergyConfig.global_residual): exact
        # at init, no decode floor — crossed with the weight splits
        "residual_ref_split": {"global_residual": True},
        "residual_w3d_x100": {"global_residual": True,
                              "global_weight_3d": 1.0},
        "residual_smooth_x10": {"global_residual": True,
                                "global_smooth": 0.01},
    }
    sel_w = os.environ.get("S2_WEIGHTS")    # comma-separated arm filter
    if sel_w:
        want = set(sel_w.split(","))
        weight_cfgs = {k: v for k, v in weight_cfgs.items() if k in want}
    sel_c = os.environ.get("S2_CORPORA")
    if sel_c:
        want = set(sel_c.split(","))
        corpora = {k: v for k, v in corpora.items() if k in want}

    results = {}
    for corpus, cam_noise in corpora.items():
        sequences = [
            [TestChunk(*(jax.device_put(jnp.asarray(a))
                         for a in synthetic_chunk(
                             100, seed=1000 * i + j, cam_noise=cam_noise)))
             for j in range(n_chunks)]
            for i in range(n_seqs)]
        for wname, overrides in weight_cfgs.items():
            cfg = replace(base_cfg,
                          energy=replace(base_cfg.energy, **overrides))
            opt = SequenceOptimizer(model, local_vars, global_vars, cfg)
            staged = [opt.stage(chunks) for chunks in sequences]
            t0 = time.perf_counter()
            per_seq = []
            for sb in staged:
                res = opt.optimize_chunks_batched(sb, mode="flat")
                jax.block_until_ready(res.optimized)
                errs = [calculate_errors(res.estimated[i], res.mid[i],
                                         res.optimized[i], res.gt[i])
                        for i in range(n_chunks)]
                per_seq.append({k: float(np.mean(
                    [np.asarray(e[k]) for e in errs]))
                    for k in errs[0] if k != "joints_error"})
            mean = {k: float(np.mean([s[k] for s in per_seq]))
                    for k in per_seq[0]}
            key = f"{corpus}/{wname}"
            results[key] = {
                "mean": mean,
                "per_seq_opt_vs_mid_raw_global": [
                    (round(s["mid_global_mpjpe"], 5),
                     round(s["optimized_global_mpjpe"], 5))
                    for s in per_seq],
                "wall_s": round(time.perf_counter() - t0, 2),
            }
            m = mean
            print(f"{key:28s} raw mid {m['mid_global_mpjpe']:.5f} -> "
                  f"opt {m['optimized_global_mpjpe']:.5f} | "
                  f"seq-aligned mid {m['aligned_mid_seq_mpjpe']:.5f} -> "
                  f"opt {m['optimized_aligned_global_mpjpe']:.5f} | "
                  f"bone mid {m['bone_length_aligned_mid_optimized_mpjpe']:.5f}"
                  f" -> opt {m['bone_length_aligned_optimized_mpjpe']:.5f}",
                  flush=True)

    out = os.environ.get("S2_OUT", "stage2_experiment.json")
    with open(out, "w") as f:
        json.dump({"n_seqs": n_seqs, "n_chunks": n_chunks,
                   "results": results}, f, indent=1)
    print("wrote", out)


if __name__ == "__main__":
    main()
