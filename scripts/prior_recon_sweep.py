"""Diagnose the headline prior's reconstruction floor (VERDICT r1 item 2).

The headline regression traces to prior under-training: on the 10x250
synthetic corpus a CONSTANT Adam lr oscillates around a ~0.07-0.11 recon
MPJPE plateau (first sweep round: 0.076 -> 0.111 -> 0.094 -> 0.073 over
64 epochs at lr 1e-3) — far above the injected estimation noise (~0.048),
so decoding through the prior cannot improve raw-global metrics.  This
sweep compares lr SCHEDULES to pick the headline's training recipe.

Run on the TPU:  python scripts/prior_recon_sweep.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    from globalegomocap_tpu.config import TrainConfig
    from globalegomocap_tpu.data.amass import AmassWindows
    from globalegomocap_tpu.data.synthetic import synthetic_amass
    from globalegomocap_tpu.models.conv_vae import ConvVAE
    from globalegomocap_tpu.train.train_vae import Trainer

    seqs = synthetic_amass(n_sequences=10, frames_per_seq=250, seed=5)
    ds = AmassWindows.from_sequences(seqs, frame_num=10, local_pose=False)
    results = []

    configs = [
        {"lr_schedule": "cosine", "learning_rate": 1e-3, "epochs": 128},
        {"lr_schedule": "cosine", "learning_rate": 3e-3, "epochs": 128,
         "lr_warmup_steps": 100},
        {"lr_schedule": "constant", "learning_rate": 1e-4, "epochs": 128},
    ]
    for over in configs:
        cfg = TrainConfig(latent_dim=2048, seq_length=10, batch_size=64,
                          kl_weight=0.05, log_step=0, **over)
        trainer = Trainer(cfg, ds, AmassWindows(ds.windows[::17]),
                          ConvVAE(latent_dim=2048, seq_len=10))
        t0 = time.time()
        traj = []

        def log(msg, _traj=traj, _t0=t0, _over=over):
            if "eval reconstruction" in str(msg):
                r = float(str(msg).split("MPJPE")[1].split("(")[0])
                _traj.append(r)
                if len(_traj) % 8 == 0:
                    print(json.dumps({**_over, "epoch": len(_traj),
                                      "recon_mpjpe": round(r, 5),
                                      "elapsed_s": round(
                                          time.time() - _t0, 1)}),
                          flush=True)

        trainer.train(log_fn=log)
        results.append({**over, "best": round(min(traj), 5),
                        "final": round(traj[-1], 5),
                        "every8": [round(v, 5) for v in traj[::8]]})
        print(json.dumps(results[-1]), flush=True)

    with open(os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "prior_recon_sweep.json"),
            "w") as f:
        json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
