"""Train CLI smoke test: runs a tiny training job from AMASS pkls on disk
through the full argparse surface, incl. checkpointing and the HDF5 mode."""

import os
import pickle

import numpy as np
import pytest

from globalegomocap_tpu.data.synthetic import synthetic_amass


@pytest.fixture(scope="module")
def amass_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("amass")
    seqs = synthetic_amass(n_sequences=12, frames_per_seq=40, seed=9)
    for i, s in enumerate(seqs):
        with open(d / f"seq_{i:02d}.pkl", "wb") as f:
            pickle.dump(s, f)
    return str(d)


def test_train_cli(amass_dir, tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)  # logs/ go under tmp
    from globalegomocap_tpu.cli.train import main
    trainer = main([
        "--train_data_path", amass_dir,
        "--latent_dim", "16", "--seq_length", "10", "--kl_weight", "0.1",
        "--epoch", "1", "--batch_size", "16", "--local_pose", "true",
        "--log_dir", "t1",
    ])
    assert np.isfinite(trainer.evaluate())
    ckpts = os.listdir(tmp_path / "logs" / "t1" / "checkpoints")
    assert "0.msgpack" in ckpts and "0.json" in ckpts


def test_train_cli_hdf5_and_resume(amass_dir, tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    from globalegomocap_tpu.data.hdf5 import pack_amass_dir
    h5 = str(tmp_path / "packed.h5")
    pack_amass_dir(amass_dir, h5, frame_num=10)

    from globalegomocap_tpu.cli.train import main
    trainer = main([
        "--train_data_path", h5, "--hdf5", "true",
        "--latent_dim", "16", "--seq_length", "10", "--kl_weight", "0.1",
        "--epoch", "1", "--batch_size", "16", "--log_dir", "t2",
    ])
    ckpt = str(tmp_path / "logs" / "t2" / "checkpoints" / "0.msgpack")
    assert os.path.exists(ckpt)

    trainer2 = main([
        "--train_data_path", h5, "--hdf5", "true",
        "--latent_dim", "16", "--seq_length", "10", "--kl_weight", "0.1",
        "--epoch", "1", "--batch_size", "16", "--log_dir", "t3",
        "--resume", ckpt,
    ])
    # resumed training continues from the checkpointed step count
    assert int(trainer2.state.step) > int(trainer.state.step)
