"""Prior introspection CLI: sample / interpolate / latent-stats.

Covers the reference's model tools (networks/sample.py,
networks/interpolant.py, networks/get_latent.py) behind one entry point:

    python -m globalegomocap_tpu.cli.introspect sample \
        --ckpt <prior> --out out/sample --num 10
    python -m globalegomocap_tpu.cli.introspect interpolate \
        --ckpt <prior> --data <windows.pkl> --i 0 --j 5 --out out/interp
    python -m globalegomocap_tpu.cli.introspect latent-stats \
        --ckpt <prior> --data <windows.pkl>
"""

from __future__ import annotations

import argparse
import pickle

import numpy as np


def build_parser():
    p = argparse.ArgumentParser(description=__doc__)
    sub = p.add_subparsers(dest="cmd", required=True)
    for name in ("sample", "interpolate", "latent-stats"):
        s = sub.add_parser(name)
        s.add_argument("--ckpt", required=True, type=str)
        s.add_argument("--latent_dim", default=2048, type=int)
        s.add_argument("--seq_len", default=10, type=int)
        if name == "sample":
            s.add_argument("--out", required=True, type=str)
            s.add_argument("--num", default=10, type=int)
            s.add_argument("--seed", default=0, type=int)
        else:
            s.add_argument("--data", required=True, type=str,
                           help="pickle of (W, T, 45) windows")
        if name == "interpolate":
            s.add_argument("--i", required=True, type=int)
            s.add_argument("--j", required=True, type=int)
            s.add_argument("--steps", default=4, type=int)
            s.add_argument("--out", required=True, type=str)
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)

    from globalegomocap_tpu.models.checkpoint import load_prior_variables
    from globalegomocap_tpu.models.conv_vae import ConvVAE

    model = ConvVAE(latent_dim=args.latent_dim, seq_len=args.seq_len)
    variables = load_prior_variables(args.ckpt, args.seq_len)

    if args.cmd == "sample":
        from globalegomocap_tpu.tools.prior_tools import (
            export_sample_meshes)
        export_sample_meshes(model, variables, args.out, args.num,
                             args.seed)
        print(f"wrote {args.num} sampled motions to {args.out}")
        return

    with open(args.data, "rb") as f:
        windows = np.asarray(pickle.load(f), dtype=np.float32)
    windows = windows.reshape(len(windows), args.seq_len, 45)

    if args.cmd == "interpolate":
        from globalegomocap_tpu.tools.prior_tools import interpolate_latents
        from globalegomocap_tpu.tools.ply import save_skeleton_sequence
        out = interpolate_latents(model, variables, windows[args.i],
                                  windows[args.j], args.steps)
        import os
        for k, motion in enumerate(out):
            save_skeleton_sequence(motion, os.path.join(args.out, str(k)))
        print(f"wrote {len(out)} interpolated motions to {args.out}")
        return

    from globalegomocap_tpu.tools.prior_tools import latent_statistics
    stats = latent_statistics(model, variables, windows)
    print(f"mean ||mu||^2: {stats['mean_mu_sq_norm']:.4f}")
    print(f"mean ||std - 1||^2: {stats['mean_std_dist']:.4f}")


if __name__ == "__main__":
    main()
