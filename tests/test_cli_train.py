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


@pytest.mark.slow
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


def test_hdf5_stream_epoch_batches(amass_dir, tmp_path):
    """The streaming loader must cover every window exactly once per epoch
    (modulo the dropped tail), honor start/stop splits, and shuffle."""
    from globalegomocap_tpu.data.hdf5 import (
        pack_amass_dir, load_hdf5_windows, HDF5WindowStream)
    h5 = str(tmp_path / "stream.h5")
    pack_amass_dir(amass_dir, h5, frame_num=10)

    full = load_hdf5_windows(h5).windows          # (W, 10, 45) materialized
    n = len(full)
    stream = HDF5WindowStream(h5, slab_size=7)
    assert len(stream) == n

    rng = np.random.default_rng(0)
    batches = list(stream.epoch_batches(rng, 16))
    got = np.concatenate(batches)
    assert len(got) == n - n % 16
    # every emitted row is a real window, each at most once
    flat_full = {full[i].tobytes(): i for i in range(n)}
    seen = [flat_full[row.tobytes()] for row in got]
    assert len(set(seen)) == len(seen)
    # shuffled (not the identity order)
    assert seen != sorted(seen)

    # drop_last=False emits everything
    rows = sum(len(b) for b in stream.epoch_batches(rng, 16,
                                                    drop_last=False))
    assert rows == n

    # start/stop split partitions the file
    a = HDF5WindowStream(h5, slab_size=7, stop=-5)
    b = HDF5WindowStream(h5, slab_size=7, start=-5)
    assert len(a) == n - 5 and len(b) == 5
    got_b = np.concatenate(list(b.epoch_batches(rng, 5, shuffle=False)))
    np.testing.assert_array_equal(
        got_b, full[-5:].reshape(5, 10, 45))
    a.close(); b.close(); stream.close()


@pytest.mark.slow
def test_train_cli_hdf5_stream_orbax(amass_dir, tmp_path, monkeypatch):
    """Streaming HDF5 training with Orbax epoch checkpoints + resume."""
    monkeypatch.chdir(tmp_path)
    from globalegomocap_tpu.data.hdf5 import pack_amass_dir
    h5 = str(tmp_path / "packed2.h5")
    pack_amass_dir(amass_dir, h5, frame_num=10)

    from globalegomocap_tpu.cli.train import main
    trainer = main([
        "--train_data_path", h5, "--hdf5_stream", "true",
        "--latent_dim", "16", "--seq_length", "10", "--kl_weight", "0.1",
        "--epoch", "1", "--batch_size", "16", "--log_dir", "t4",
        "--checkpoint_format", "orbax",
    ])
    assert np.isfinite(trainer.evaluate())
    ckpt = str(tmp_path / "logs" / "t4" / "checkpoints" / "0.orbax")
    assert os.path.isdir(ckpt)

    trainer2 = main([
        "--train_data_path", h5, "--hdf5_stream", "true",
        "--latent_dim", "16", "--seq_length", "10", "--kl_weight", "0.1",
        "--epoch", "1", "--batch_size", "16", "--log_dir", "t5",
        "--resume", ckpt,
    ])
    assert int(trainer2.state.step) > int(trainer.state.step)
