"""Measure the joint whole-sequence (cross-window coupling) feature with
trained priors on hardware: quality and throughput at several coupling
weights.  Writes coupling_result.json.
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

    from globalegomocap_tpu.config import (
        OptimizeConfig, PriorConfig, SolverConfig, TrainConfig,
        EnergyConfig)
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

    seqs = synthetic_amass(n_sequences=10, frames_per_seq=250, seed=21)

    def train(local_pose):
        cfg = TrainConfig(latent_dim=2048, seq_length=10, epochs=20,
                          batch_size=64, kl_weight=0.5,
                          learning_rate=1e-3, log_step=0)
        ds = AmassWindows.from_sequences(seqs, frame_num=10,
                                         local_pose=local_pose)
        tr = Trainer(cfg, ds, AmassWindows(ds.windows[::17]),
                     ConvVAE(latent_dim=2048, seq_len=10))
        tr.train(log_fn=lambda *_: None)
        return tr.variables

    print("training priors...", flush=True)
    local_vars = train(True)
    global_vars = train(False)

    chunks = [synthetic_chunk(100, seed=300 + i, noise_std=0.03)
              for i in range(5)]
    chunks_dev = [TestChunk(*(jax.device_put(jnp.asarray(a)) for a in c))
                  for c in chunks]
    wins = num_windows(100) * len(chunks)

    results = []
    for coupling in (0.0, 1e-6, 3e-6, 1e-5, 1e-4):
        cfg = OptimizeConfig(
            prior=PriorConfig(latent_dim=2048, seq_len=10),
            energy=EnergyConfig(overlap_consistency=coupling),
            solver=SolverConfig(method="lbfgs_fixed"),
            sampling_impl="gather")
        opt = SequenceOptimizer(build_model(cfg), local_vars, global_vars,
                                cfg)
        outs = [opt.optimize_chunk(c) for c in chunks_dev]
        for o in outs:
            jax.block_until_ready(o.optimized)
        t0 = time.perf_counter()
        outs = [opt.optimize_chunk(c) for c in chunks_dev]
        for o in outs:
            jax.block_until_ready(o.optimized)
        dt = time.perf_counter() - t0

        keys = ("optimized_global_mpjpe", "aligned_optimized_mpjpe",
                "bone_length_aligned_optimized_mpjpe",
                "optimized_aligned_camera_pos_error")
        sums = {k: 0.0 for k in keys}
        for o in outs:
            e = calculate_errors(o.estimated, o.mid, o.optimized, o.gt)
            for k in keys:
                sums[k] += float(e[k])
        rec = {"coupling": coupling,
               "windows_per_sec": round(wins / dt, 1),
               **{k: round(v / len(outs), 5) for k, v in sums.items()}}
        print(json.dumps(rec), flush=True)
        results.append(rec)

    with open(os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "coupling_result.json"), "w") as f:
        json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
