"""Isolate BatchNorm's role in the prior's fitting floor (~0.065).

prior_combo_experiment.json shows the near-deterministic-AE combo still
floors at ~0.065 TRAINING recon on the 10x250 corpus despite a 2048-dim
latent — an optimization pathology, not capacity.  Two arms:

  nobn   — ConvVAE(use_bn=False): same architecture minus BatchNorm,
           trained with the combo recipe.  If recon dives, BN's batch-stat
           churn (37 steps/epoch on 2410 windows) IS the floor.
  bnmode — the BN model evaluated with batch stats (train-mode BN, z=mu)
           vs running stats: isolates eval-time stat mismatch from
           optimization noise.

Run on the TPU:  python scripts/prior_bn_experiment.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax.numpy as jnp

    from globalegomocap_tpu.config import TrainConfig
    from globalegomocap_tpu.data.amass import AmassWindows
    from globalegomocap_tpu.data.synthetic import synthetic_amass
    from globalegomocap_tpu.models.conv_vae import ConvVAE
    from globalegomocap_tpu.train.train_vae import Trainer

    seqs = synthetic_amass(n_sequences=10, frames_per_seq=250, seed=5)
    ds = AmassWindows.from_sequences(seqs, frame_num=10, local_pose=False)
    cfg = TrainConfig(latent_dim=2048, seq_length=10, batch_size=64,
                      kl_weight=0.001, learning_rate=1e-3,
                      lr_schedule="cosine", epochs=96,
                      logvar_init_bias=-6.0, log_step=0)
    results = []

    # ---- arm 1: no BatchNorm -------------------------------------------
    model = ConvVAE(latent_dim=2048, seq_len=10, use_bn=False,
                    logvar_bias_init=-6.0)
    trainer = Trainer(cfg, ds, AmassWindows(ds.windows[::17]), model)
    t0 = time.time()
    traj = []

    def log(msg):
        if "eval reconstruction" in str(msg):
            traj.append(float(str(msg).split("MPJPE")[1].split("(")[0]))

    trainer.train(log_fn=log)
    rec = {"arm": "nobn", "best": round(min(traj), 5),
           "final": round(traj[-1], 5),
           "every8": [round(v, 5) for v in traj[::8]],
           "elapsed_s": round(time.time() - t0, 1)}
    print(json.dumps(rec), flush=True)
    results.append(rec)

    # ---- arm 2: BN model, eval with batch stats vs running stats -------
    model = ConvVAE(latent_dim=2048, seq_len=10, logvar_bias_init=-6.0)
    trainer = Trainer(cfg, ds, AmassWindows(ds.windows[::17]), model)
    trainer.train(log_fn=lambda *_: None)
    eval_running = trainer.evaluate()

    # train-mode BN (batch statistics), deterministic z=mu
    import jax
    test = ds.windows[::17]
    errs = []
    for i in range(0, len(test), 64):
        batch = jnp.asarray(test[i:i + 64])
        out, _ = model.apply(
            {"params": trainer.state.params,
             "batch_stats": trainer.state.batch_stats},
            batch, True, None, mutable=["batch_stats"])
        pred = out.reconstruction.reshape(batch.shape[0], -1, 15, 3)
        gt = batch.reshape(batch.shape[0], -1, 15, 3)
        errs.append(jax.device_get(jnp.mean(
            jnp.linalg.norm(pred - gt, axis=-1), axis=(1, 2))))
    import numpy as np
    eval_batchstats = float(np.mean(np.concatenate(errs)))
    rec = {"arm": "bnmode", "eval_running_stats": round(eval_running, 5),
           "eval_batch_stats": round(eval_batchstats, 5)}
    print(json.dumps(rec), flush=True)
    results.append(rec)

    with open(os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "prior_bn_experiment.json"),
            "w") as f:
        json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
