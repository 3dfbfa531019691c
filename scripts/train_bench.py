"""Measured training throughput of the full-size prior trainer.

The reference trains each prior with a torch loop (reference:
train_global_vae.py / seq_vae_trainer.py); this rebuild's sync-free
device loop (metrics accumulate on device, host readback only at
log_step boundaries) is the other half of the performance story next to
the optimization bench.

Run on the TPU: python scripts/train_bench.py
Writes train_bench.json:  windows/s, steps/s, epoch_s at the headline
recipe (latent 2048, batch 64, synthetic AMASS corpus).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main():
    import jax

    from globalegomocap_tpu.config import TrainConfig
    from globalegomocap_tpu.data.amass import AmassWindows
    from globalegomocap_tpu.data.synthetic import synthetic_amass
    from globalegomocap_tpu.models.conv_vae import ConvVAE
    from globalegomocap_tpu.train.train_vae import Trainer

    epochs = int(os.environ.get("TRAIN_BENCH_EPOCHS", "64"))
    warmup = int(os.environ.get("TRAIN_BENCH_WARMUP", "8"))
    epoch_scan = os.environ.get("TRAIN_BENCH_EPOCH_SCAN", "0") == "1"
    eval_every = int(os.environ.get("TRAIN_BENCH_EVAL_EVERY", "1"))

    seqs = synthetic_amass(n_sequences=10, frames_per_seq=250, seed=5)
    ds = AmassWindows.from_sequences(seqs, frame_num=10, local_pose=True)
    cfg = TrainConfig(latent_dim=2048, seq_length=10, epochs=warmup,
                      batch_size=64, kl_weight=0.0, learning_rate=1e-3,
                      lr_schedule="cosine", lr_final=3e-5,
                      logvar_init_bias=-6.0, log_step=0,
                      epoch_scan=epoch_scan, eval_every=eval_every)
    tr = Trainer(cfg, ds, AmassWindows(ds.windows[::17]),
                 ConvVAE(latent_dim=2048, seq_len=10))

    n_windows = len(ds.windows)
    steps_per_epoch = (n_windows + cfg.batch_size - 1) // cfg.batch_size

    tr.train(log_fn=lambda *_: None)          # warmup incl. compile
    from dataclasses import replace
    tr.cfg = replace(cfg, epochs=epochs)      # timed run, warm program
    t0 = time.perf_counter()
    tr.train(log_fn=lambda *_: None)
    dt = time.perf_counter() - t0

    out = {
        "epochs_timed": epochs,
        "steps_per_epoch": steps_per_epoch,
        "train_windows": n_windows,
        "epoch_s": round(dt / epochs, 4),
        "steps_per_s": round(epochs * steps_per_epoch / dt, 1),
        "windows_per_s": round(epochs * n_windows / dt, 1),
        "batch_size": cfg.batch_size,
        "latent_dim": 2048,
        "epoch_scan": epoch_scan,
        "eval_every": eval_every,
    }
    print(json.dumps(out, indent=1), flush=True)
    name = "train_bench_scan.json" if epoch_scan else "train_bench.json"
    with open(os.path.join(REPO, name), "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
