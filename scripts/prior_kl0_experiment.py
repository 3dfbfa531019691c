"""The clean headline recipe test: kl_weight = 0 EXACTLY + logvar -6.

Root cause chain (prior_recon_sweep / prior_floor_experiment /
prior_bn_experiment): on the small synthetic corpus every arm with
kl_weight > 0 was poisoned by the KLD itself — at logvar_bias=-6 the
-0.5*log_var term contributes ~ +3/dim * 2048 dims ~ 6100 raw, so even
M_N = 2.7e-5 weighs it at ~0.16 against a recon MSE of ~0.002, and the
optimizer buys KLD by wrecking recon.  BN is NOT the problem (no-BN is
worse; batch-vs-running-stat eval differs by 2%).

Arms (both kl=0, logvar -6, cosine 1e-3, 96 epochs):
  global / local — the two headline priors.

Run on the TPU:  python scripts/prior_kl0_experiment.py
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
    from globalegomocap_tpu.train.train_vae import Trainer

    seqs = synthetic_amass(n_sequences=10, frames_per_seq=250, seed=5)
    results = []

    for local_pose in (False, True):
        ds = AmassWindows.from_sequences(seqs, frame_num=10,
                                         local_pose=local_pose)
        cfg = TrainConfig(latent_dim=2048, seq_length=10, batch_size=64,
                          kl_weight=0.0, learning_rate=1e-3,
                          lr_schedule="cosine", epochs=96,
                          logvar_init_bias=-6.0, log_step=0)
        trainer = Trainer(cfg, ds, AmassWindows(ds.windows[::17]))
        t0 = time.time()
        traj = []

        def log(msg, _traj=traj):
            if "eval reconstruction" in str(msg):
                _traj.append(float(str(msg).split("MPJPE")[1].split("(")[0]))

        trainer.train(log_fn=log)
        rec = {"arm": "local" if local_pose else "global",
               "kl": 0.0, "logvar_bias": -6.0, "epochs": 96,
               "best": round(min(traj), 5), "final": round(traj[-1], 5),
               "every8": [round(v, 5) for v in traj[::8]],
               "elapsed_s": round(time.time() - t0, 1)}
        print(json.dumps(rec), flush=True)
        results.append(rec)

    with open(os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "prior_kl0_experiment.json"),
            "w") as f:
        json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
