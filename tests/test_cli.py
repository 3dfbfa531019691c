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
