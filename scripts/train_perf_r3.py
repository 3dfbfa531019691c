"""Training-side perf pass (VERDICT r2 #6): bf16 conv compute + batch
scaling on the full-size prior, each with a recon-quality gate, plus
training MFU from XLA cost analysis.

All configs train the full-size ConvVAE (latent 2048, seq 10) on the
standard synthetic corpus with the headline recipe (kl0 / logvar -6 /
cosine 1e-3 -> 3e-5) and epoch-as-one-scan, for TP_EPOCHS epochs
(default 256 — enough for the recon ordering to be meaningful; the
headline's 768-epoch run is the quality anchor).

Run on TPU: python scripts/train_perf_r3.py  ->  train_perf_r3.json
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

PEAK_TFLOPS = 197.0  # v5e bf16


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from globalegomocap_tpu.config import TrainConfig
    from globalegomocap_tpu.data.amass import AmassWindows
    from globalegomocap_tpu.data.synthetic import synthetic_amass
    from globalegomocap_tpu.train.train_vae import Trainer

    epochs = int(os.environ.get("TP_EPOCHS", "256"))
    seqs = synthetic_amass(n_sequences=10, frames_per_seq=250, seed=5)
    ds = AmassWindows.from_sequences(seqs, frame_num=10, local_pose=True)
    test = AmassWindows(ds.windows[::17])
    n_windows = len(ds)

    configs = [
        ("b64_f32", 64, "float32"),
        ("b64_bf16", 64, "bfloat16"),
        ("b256_f32", 256, "float32"),
        ("b256_bf16", 256, "bfloat16"),
        ("b1024_f32", 1024, "float32"),
    ]

    results = []
    anchor_recon = None
    for label, batch, dt in configs:
        cfg = TrainConfig(latent_dim=2048, seq_length=10, epochs=epochs,
                          batch_size=batch, kl_weight=0.0,
                          learning_rate=1e-3, lr_schedule="cosine",
                          lr_final=3e-5, logvar_init_bias=-6.0,
                          compute_dtype=dt, log_step=0,
                          epoch_scan=True, eval_every=epochs)
        tr = Trainer(cfg, ds, test)
        skip_train = os.environ.get("TP_SKIP_TRAIN", "0") == "1"
        rec = {"label": label, "batch_size": batch, "compute_dtype": dt,
               "epochs": epochs}
        if not skip_train:
            t0 = time.time()
            tr.train(log_fn=lambda *_: None)
            wall = time.time() - t0   # includes the first compile
            recon = float(tr.evaluate())
            rec.update({
                "wall_s_incl_compile": round(wall, 1),
                "s_per_epoch_incl_compile": round(wall / epochs, 4),
                "recon_mpjpe": round(recon, 5)})
        # MFU from the compiled epoch-scan step (best-effort)
        try:
            steps = max(1, n_windows // batch)
            # time ONE warm epoch launch precisely
            batches = np.stack([np.asarray(ds.windows[i % n_windows])
                                for i in range(batch * steps)])
            arr = jax.device_put(
                jnp.asarray(batches.reshape(steps, batch, 10, 45)),
                tr._scan_sh)
            rng = jax.random.PRNGKey(9)
            st, _ = tr._epoch_step(tr.state, arr, rng)
            jax.block_until_ready(st.params)
            # chain N epochs through the state and block ONCE: chained
            # launches cannot reorder, so total/N is the true per-epoch
            # wall (single timed launches mis-read through the tunnel's
            # async dispatch — all batch sizes 'measured' 0.8 ms)
            n_rep = 20
            t1 = time.perf_counter()
            s = tr.state
            for _ in range(n_rep):
                s, _ = tr._epoch_step(s, arr, rng)
            jax.block_until_ready(s.params)
            best = (time.perf_counter() - t1) / n_rep
            ca = tr._epoch_step.lower(tr.state, arr, rng).compile(
                ).cost_analysis()
            if isinstance(ca, (list, tuple)):
                ca = ca[0]
            flops = float(ca.get("flops", 0.0))
            byt = float(ca.get("bytes accessed", 0.0))
            rec["epoch_launch_s"] = round(best, 4)
            if flops > 0:
                rec["tflops_per_s"] = round(flops / best / 1e12, 2)
                rec["mfu_vs_bf16_peak"] = round(
                    flops / best / (PEAK_TFLOPS * 1e12), 4)
            if byt > 0:
                rec["hbm_gb_per_s"] = round(byt / best / 1e9, 1)
        except Exception as e:  # noqa: BLE001
            rec["mfu_error"] = repr(e)
        if "recon_mpjpe" in rec:
            if anchor_recon is None:
                anchor_recon = rec["recon_mpjpe"]
            # quality gate: within 25% of the b64/f32 anchor, equal epochs
            rec["recon_gate_vs_b64_f32"] = bool(
                rec["recon_mpjpe"] <= anchor_recon * 1.25)
        if "epoch_launch_s" in rec:
            rec["warm_windows_per_sec"] = round(
                batch * max(1, n_windows // batch) / rec["epoch_launch_s"],
                0)
        results.append(rec)
        print(json.dumps(rec), flush=True)
        out_name = os.environ.get("TP_OUT", "train_perf_r3.json")
        with open(os.path.join(REPO, out_name), "w") as f:
            json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
