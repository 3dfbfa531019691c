"""Train the motion-VAE prior (global relative-pose or local-pose variant).

CLI covering the reference's training surface (networks/config.py flags and
the four launch scripts train_global.sh / train_local.sh /
train_*_mo2cap2.sh: latent 2048, kl 0.5, seq 10, batch 64, fps 25):

    python -m globalegomocap_tpu.cli.train \
        --train_data_path <amass_pkl_dir> --latent_dim 2048 \
        --seq_length 10 --kl_weight 0.5 [--local_pose true] \
        [--with_mo2cap2_names <names.txt>] [--data_balance true]
"""

from __future__ import annotations

import argparse
import datetime
import os


def str2bool(x: str) -> bool:
    return str(x).lower() == "true"


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--train_data_path", required=True, type=str)
    p.add_argument("--latent_dim", default=2048, type=int)
    p.add_argument("--seq_length", default=10, type=int)
    p.add_argument("--fps", default=25, type=int)
    p.add_argument("--kl_weight", default=0.5, type=float)
    p.add_argument("--epoch", default=20, type=int)
    p.add_argument("--batch_size", default=64, type=int)
    p.add_argument("--learning_rate", default=1e-4, type=float)
    p.add_argument("--lr_schedule", default="constant",
                   choices=["constant", "cosine"],
                   help="'cosine': warmup + cosine decay to --lr_final "
                        "over the whole run (stabilizes long runs on "
                        "small corpora; the reference only has constant)")
    p.add_argument("--lr_warmup_steps", default=0, type=int)
    p.add_argument("--lr_final", default=0.0, type=float)
    p.add_argument("--logvar_init_bias", default=0.0, type=float,
                   help="initial bias of the VAE log-variance head; "
                        "negative (e.g. -6) starts the posterior "
                        "near-deterministic (faster convergence on small "
                        "corpora)")
    p.add_argument("--weight_decay", default=0.0, type=float)
    p.add_argument("--compute_dtype", default="float32",
                   choices=["float32", "bfloat16"],
                   help="conv-stack compute dtype (bf16 MXU matmuls; "
                        "params/optimizer/loss stay f32)")
    p.add_argument("--slide_window_step", default=1, type=int)
    p.add_argument("--data_balance", default=False, type=str2bool)
    p.add_argument("--local_pose", default=False, type=str2bool,
                   help="train the local-pose prior (train_local.py "
                        "equivalent) instead of the relative-global prior")
    p.add_argument("--with_mo2cap2_names", default=None, type=str,
                   help="path to a text/npy file of sequence names to "
                        "restrict training to (mo2cap2 subset)")
    p.add_argument("--log_dir", default=None, type=str)
    p.add_argument("--log_step", default=100, type=int)
    p.add_argument("--epoch_scan", default=False, type=str2bool,
                   help="run each epoch as ONE device launch "
                        "(lax.scan; 4.2x faster epochs on TPU, "
                        "train_bench_scan.json)")
    p.add_argument("--eval_every", default=1, type=int,
                   help="evaluate/checkpoint every N epochs "
                        "(always on the last)")
    p.add_argument("--resume", default=None, type=str,
                   help="path to an epoch .msgpack checkpoint to resume")
    p.add_argument("--num_devices", default=0, type=int,
                   help="devices for data parallelism (0 = all)")
    p.add_argument("--hdf5", default=False, type=str2bool,
                   help="train_data_path is a packed HDF5 file")
    p.add_argument("--hdf5_stream", default=False, type=str2bool,
                   help="stream batches from the HDF5 file instead of "
                        "materializing all windows (AMASS scale)")
    p.add_argument("--checkpoint_format", default="msgpack",
                   choices=["msgpack", "orbax"])
    return p


def load_mo2cap2_names(path: str | None):
    if path is None:
        return None
    if path.endswith(".npy"):
        import numpy as np
        return [str(x) for x in np.load(path, allow_pickle=True).tolist()]
    with open(path) as f:
        return [line.strip() for line in f if line.strip()]


def main(argv=None):
    args = build_parser().parse_args(argv)

    from globalegomocap_tpu.config import TrainConfig
    from globalegomocap_tpu.data.amass import AmassWindows
    from globalegomocap_tpu.train.train_vae import Trainer

    cfg = TrainConfig(
        train_data_path=args.train_data_path,
        latent_dim=args.latent_dim, seq_length=args.seq_length,
        fps=args.fps, kl_weight=args.kl_weight, epochs=args.epoch,
        batch_size=args.batch_size, learning_rate=args.learning_rate,
        lr_schedule=args.lr_schedule,
        lr_warmup_steps=args.lr_warmup_steps, lr_final=args.lr_final,
        logvar_init_bias=args.logvar_init_bias,
        compute_dtype=args.compute_dtype,
        weight_decay=args.weight_decay,
        slide_window_step=args.slide_window_step,
        data_balance=args.data_balance, local_pose=args.local_pose,
        log_step=args.log_step, num_devices=args.num_devices,
        epoch_scan=args.epoch_scan, eval_every=args.eval_every)

    names = load_mo2cap2_names(args.with_mo2cap2_names)
    if args.hdf5_stream:
        from globalegomocap_tpu.data.hdf5 import HDF5WindowStream
        probe = HDF5WindowStream(args.train_data_path,
                                 local_pose=args.local_pose)
        n_test = max(1, len(probe) // 20)
        probe.close()
        train_ds = HDF5WindowStream(args.train_data_path,
                                    local_pose=args.local_pose,
                                    stop=-n_test)
        test_ds = HDF5WindowStream(args.train_data_path,
                                   local_pose=args.local_pose,
                                   start=-n_test)
    elif args.hdf5:
        from globalegomocap_tpu.data.hdf5 import load_hdf5_windows
        full = load_hdf5_windows(args.train_data_path,
                                 local_pose=args.local_pose)
        n_test = max(1, len(full.windows) // 20)
        train_ds = AmassWindows(full.windows[:-n_test])
        test_ds = AmassWindows(full.windows[-n_test:])
    else:
        train_ds = AmassWindows.from_dir(
            args.train_data_path, frame_num=args.seq_length, fps=args.fps,
            is_train=True, local_pose=args.local_pose,
            balance_walking=args.data_balance, mo2cap2_names=names,
            dilation=args.slide_window_step)
        test_ds = AmassWindows.from_dir(
            args.train_data_path, frame_num=args.seq_length, fps=args.fps,
            is_train=False, local_pose=args.local_pose,
            balance_walking=args.data_balance, mo2cap2_names=names,
            dilation=args.slide_window_step)

    print(f"train windows: {len(train_ds)}, test windows: {len(test_ds)}")

    trainer = Trainer(cfg, train_ds, test_ds)
    if args.resume:
        trainer.load_checkpoint(args.resume)

    log_dir = args.log_dir or datetime.datetime.now().strftime(
        "%m.%d-%H.%M.%S")
    ckpt_dir = os.path.join("logs", log_dir, "checkpoints")
    trainer.train(checkpoint_dir=ckpt_dir,
                  checkpoint_format=args.checkpoint_format)
    return trainer


if __name__ == "__main__":
    main()
