"""Discriminate WHAT binds the prior's recon floor (~0.07) on the small
synthetic corpus: capacity, BatchNorm eval mismatch, or the stochastic
bottleneck (std starts at exp(0/2)=1, so early training is swamped by
z-noise and the run converges before log_var shrinks).

Three arms, same corpus/budget (64 epochs, cosine lr 1e-3, kl 0.05):
  control    — as-is
  logvar-6   — fc_var bias initialized to -6 (std ~= 0.05) by surgery
  kl0        — kl_weight = 0 (still sampling): isolates the KLD term

Run on the TPU:  python scripts/prior_floor_experiment.py
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
    results = []

    def run(name, kl, logvar_bias):
        cfg = TrainConfig(latent_dim=2048, seq_length=10, batch_size=64,
                          kl_weight=kl, learning_rate=1e-3,
                          lr_schedule="cosine", epochs=64, log_step=0)
        trainer = Trainer(cfg, ds, AmassWindows(ds.windows[::17]),
                          ConvVAE(latent_dim=2048, seq_len=10))
        if logvar_bias is not None:
            p = trainer.state.params
            p["fc_var"]["bias"] = jnp.full_like(p["fc_var"]["bias"],
                                                logvar_bias)
            trainer.state = trainer.state.replace(params=p)
        t0 = time.time()
        traj = []

        def log(msg):
            if "eval reconstruction" in str(msg):
                traj.append(float(str(msg).split("MPJPE")[1].split("(")[0]))

        trainer.train(log_fn=log)
        rec = {"arm": name, "kl": kl, "logvar_bias": logvar_bias,
               "best": round(min(traj), 5), "final": round(traj[-1], 5),
               "every8": [round(v, 5) for v in traj[::8]],
               "elapsed_s": round(time.time() - t0, 1)}
        print(json.dumps(rec), flush=True)
        return rec

    results.append(run("logvar-6", 0.05, -6.0))
    results.append(run("kl0", 0.0, None))
    results.append(run("control64", 0.05, None))

    with open(os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "prior_floor_experiment.json"),
            "w") as f:
        json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
