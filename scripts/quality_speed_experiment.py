"""Quality x speed experiment on hardware with TRAINED full-size priors.

1. Train full-size (latent 2048) local + global priors on synthetic AMASS
   motion — on the TPU this takes a couple of minutes.
2. Run the two-stage optimization over synthetic chunks with each solver
   configuration, recording throughput AND the MPJPE improvements, so
   speed knobs (probe count, iterations, dtype) are chosen with quality
   evidence rather than guessed.

Writes quality_speed.json.  Run: python scripts/quality_speed_experiment.py
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
        with_overrides)
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

    epochs = int(os.environ.get("QS_EPOCHS", "8"))
    n_chunks = int(os.environ.get("QS_CHUNKS", "5"))

    print("generating synthetic AMASS...", flush=True)
    seqs = synthetic_amass(n_sequences=10, frames_per_seq=250, seed=21)

    def train(local_pose: bool):
        cfg = TrainConfig(latent_dim=2048, seq_length=10, epochs=epochs,
                          batch_size=64, kl_weight=0.5,
                          learning_rate=1e-3, log_step=0)
        ds = AmassWindows.from_sequences(seqs, frame_num=10,
                                         local_pose=local_pose)
        test = AmassWindows(ds.windows[::17])
        tr = Trainer(cfg, ds, test, ConvVAE(latent_dim=2048, seq_len=10))
        t0 = time.time()
        tr.train(log_fn=lambda *_: None)
        mpjpe = tr.evaluate()
        print(f"trained {'local' if local_pose else 'global'} prior: "
              f"recon MPJPE {mpjpe:.4f} in {time.time()-t0:.0f}s",
              flush=True)
        return tr.variables

    local_vars = train(True)
    global_vars = train(False)

    chunks = [synthetic_chunk(100, seed=100 + i, noise_std=0.03)
              for i in range(n_chunks)]
    chunks_dev = [TestChunk(*(jax.device_put(jnp.asarray(a)) for a in c))
                  for c in chunks]
    wins = num_windows(100) * n_chunks

    def measure(label, **cfg_kw):
        prior = PriorConfig(latent_dim=2048, seq_len=10)
        cfg = OptimizeConfig(prior=prior, sampling_impl="gather", **cfg_kw)
        model = build_model(cfg)
        opt = SequenceOptimizer(model, local_vars, global_vars, cfg)

        outs = [opt.optimize_chunk(c) for c in chunks_dev]  # compile
        for o in outs:
            jax.block_until_ready(o.optimized)
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            outs = [opt.optimize_chunk(c) for c in chunks_dev]
            for o in outs:
                jax.block_until_ready(o.optimized)
            times.append(time.perf_counter() - t0)

        # quality over all chunks
        keys = ("original_global_mpjpe", "optimized_global_mpjpe",
                "aligned_original_mpjpe", "aligned_optimized_mpjpe")
        sums = {k: 0.0 for k in keys}
        for o in outs:
            e = calculate_errors(o.estimated, o.mid, o.optimized, o.gt)
            for k in keys:
                sums[k] += float(e[k])
        avg = {k: round(v / len(outs), 5) for k, v in sums.items()}
        rec = {"label": label, "windows_per_sec": round(wins / min(times), 1),
               **avg}
        print(json.dumps(rec), flush=True)
        return rec

    results = [
        measure("lbfgs_adaptive_25",
                solver=SolverConfig(method="lbfgs")),
        measure("fixed_25_K4",
                solver=SolverConfig(method="lbfgs_fixed")),
        measure("fixed_25_K2",
                solver=SolverConfig(method="lbfgs_fixed",
                                    step_candidates=(1.0, 0.1))),
        measure("fixed_15_K4",
                solver=SolverConfig(method="lbfgs_fixed", max_iter=15)),
        measure("fixed_25_K4_bf16",
                solver=SolverConfig(method="lbfgs_fixed"),
                compute_dtype="bfloat16"),
        measure("adam_150",
                solver=SolverConfig(method="adam")),
    ]
    with open(os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "quality_speed.json"), "w") as f:
        json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
