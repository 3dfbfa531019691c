"""CLI smoke tests: optimize_sequence and evaluate_all run end-to-end from
checkpoint files on disk."""

import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from globalegomocap_tpu.data.synthetic import synthetic_chunk
from globalegomocap_tpu.data.test_data import save_test_chunk
from globalegomocap_tpu.models.conv_vae import ConvVAE
from globalegomocap_tpu.models.checkpoint import save_msgpack


HIDDEN = (8, 8, 16, 16, 32)
LATENT = 16


@pytest.fixture(scope="module")
def assets(tmp_path_factory):
    root = tmp_path_factory.mktemp("cli")
    data_root = root / "data"
    for seq in ("seqA", "seqB"):
        for start in (0, 100):
            chunk = synthetic_chunk(n_frames=26, seed=start)
            save_test_chunk(chunk, str(data_root / seq /
                                       f"data_start_{start}_end_{start+26}"))
    model = ConvVAE(latent_dim=LATENT, seq_len=10, hidden_dims=HIDDEN)
    v = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 10, 45)), False)
    local_ckpt = str(root / "local.msgpack")
    global_ckpt = str(root / "global.msgpack")
    save_msgpack(v, local_ckpt)
    save_msgpack(v, global_ckpt)
    return str(data_root), local_ckpt, global_ckpt, str(root)


def _common_args(assets, data_arg, seq=None):
    data_root, local_ckpt, global_ckpt, root = assets
    path = data_root if seq is None else os.path.join(data_root, seq)
    return [
        data_arg, path,
        "--local_ckpt", local_ckpt, "--global_ckpt", global_ckpt,
        "--latent_dim", str(LATENT), "--solver", "lbfgs_fixed",
        "--hidden_dims", ",".join(map(str, HIDDEN)),
    ]


def test_optimize_sequence_cli(assets, capsys):
    from globalegomocap_tpu.cli.optimize_sequence import main
    averages = main(_common_args(assets, "--data_path", "seqA") +
                    ["--save_pose", "true",
                     "--out_dir", os.path.join(assets[3], "out")])
    assert np.isfinite(averages["optimized_global_mpjpe"])
    out = capsys.readouterr().out
    assert "Average optimized global pose mpjpe" in out
    # result_pose.pkl written per chunk
    pkls = []
    for dirpath, _, files in os.walk(os.path.join(assets[3], "out")):
        pkls += [f for f in files if f == "result_pose.pkl"]
    assert len(pkls) == 2


def test_evaluate_all_cli(assets, capsys):
    from globalegomocap_tpu.cli.evaluate_all import main
    per_seq = main(_common_args(assets, "--data_root"))
    assert set(per_seq) == {"seqA", "seqB"}
    out = capsys.readouterr().out
    assert "overall averages" in out


def test_evaluate_all_cli_from_torch_payload(assets, tmp_path, capsys):
    """The real-data on-ramp (VERDICT r2 #8): a checkpoint in the
    reference's released format — torch.save of
    {'epoch','args','state_dict','eval_result','optimizer'}
    (reference: networks/train.py:102-108) — drives cli.evaluate_all
    end-to-end, so the moment real weights land the parity run is one
    command."""
    import torch
    from tests.torch_vae_harness import TorchConvVAE
    from globalegomocap_tpu.cli.evaluate_all import main

    torch.manual_seed(3)
    tmodel = TorchConvVAE(latent_dim=LATENT, seq_len=10,
                          hidden_dims=HIDDEN).eval()
    ckpt = str(tmp_path / "19.pth.tar")
    torch.save({"epoch": 19, "args": {"latent_dim": LATENT},
                "state_dict": tmodel.state_dict(),
                "eval_result": 0.05,
                "optimizer": {"state": {}, "param_groups": []}}, ckpt)

    data_root = assets[0]
    per_seq = main([
        "--data_root", data_root,
        "--local_ckpt", ckpt, "--global_ckpt", ckpt,
        "--latent_dim", str(LATENT), "--solver", "lbfgs_fixed",
        "--hidden_dims", ",".join(map(str, HIDDEN)),
    ])
    assert set(per_seq) == {"seqA", "seqB"}
    for avg in per_seq.values():
        assert np.isfinite(avg["optimized_global_mpjpe"])
    assert "overall averages" in capsys.readouterr().out
