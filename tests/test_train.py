"""Training pipeline tests: AMASS windowing semantics, a short data-parallel
training run on the 8-device CPU mesh, and checkpoint save/resume."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from globalegomocap_tpu.config import TrainConfig
from globalegomocap_tpu.data.amass import (
    AmassWindows, window_sequences, load_amass_pkls)
from globalegomocap_tpu.data.synthetic import synthetic_amass
from globalegomocap_tpu.models.conv_vae import ConvVAE
from globalegomocap_tpu.train.train_vae import Trainer


@pytest.fixture(scope="module")
def amass_data():
    return synthetic_amass(n_sequences=3, frames_per_seq=80, seed=1)


class TestAmassWindows:
    def test_windowing_shapes(self, amass_data):
        w = window_sequences(amass_data, frame_num=10, fps=25,
                             slide_window=True, local_pose=True)
        # each sequence: frames 80, stride_t 1, span 10 -> 70 windows
        assert w.shape == (3 * 70, 10, 45)

    def test_fps_resampling(self, amass_data):
        # a 50 fps sequence at fps=25 strides by 2
        data = [dict(amass_data[0])]
        data[0]["frame_rate"] = 50
        w = window_sequences(data, frame_num=10, fps=25, local_pose=True)
        # span = 20 frames, windows = 80 - 20 = 60
        assert w.shape[0] == 60
        # stride-2 selection: window 0 = frames 0,2,...,18
        expected = np.asarray(
            data[0]["local_pose_list"][0:20:2]).reshape(10, 45)
        np.testing.assert_allclose(w[0], expected, rtol=1e-6)

    def test_dilation(self, amass_data):
        """dilation (the reference's windows_size) multiplies the temporal
        stride: a window spans frame_num*dilation frames keeping every
        dilation-th."""
        data = [amass_data[0]]
        w = window_sequences(data, frame_num=10, fps=25, local_pose=True,
                             dilation=2)
        # span = 20 frames -> 80 - 20 = 60 windows
        assert w.shape[0] == 60
        expected = np.asarray(
            data[0]["local_pose_list"][0:20:2]).reshape(10, 45)
        np.testing.assert_allclose(w[0], expected, rtol=1e-6)

    def test_disjoint_windows(self, amass_data):
        w = window_sequences(amass_data, frame_num=10, fps=25,
                             slide_window=False, local_pose=True)
        # interval = 10 -> 7 windows per 80-frame sequence
        assert w.shape[0] == 3 * 7

    def test_relative_global_vs_local(self, amass_data):
        wl = window_sequences(amass_data, frame_num=5, local_pose=True)
        wg = window_sequences(amass_data, frame_num=5, local_pose=False)
        assert wl.shape == wg.shape
        # frame 0 of each relative-global window is the local pose of its
        # first frame (camera-0 frame is the identity for frame 0)
        np.testing.assert_allclose(wg[0, 0], wl[0, 0], atol=1e-4)
        # later frames differ (camera moves)
        assert not np.allclose(wg[0, 4], wl[0, 4], atol=1e-4)

    def test_load_pkls_split_and_filters(self, tmp_path, amass_data):
        import pickle
        # 12 files: name half of them walk-*
        for i in range(12):
            name = f"{'walk' if i % 2 else 'run'}_{i:02d}.pkl"
            with open(tmp_path / name, "wb") as f:
                pickle.dump(amass_data[i % len(amass_data)], f)
        train = load_amass_pkls(str(tmp_path), is_train=True)
        test = load_amass_pkls(str(tmp_path), is_train=False)
        assert len(train) == 2 and len(test) == 10
        balanced = load_amass_pkls(str(tmp_path), is_train=False,
                                   balance_walking=True)
        # sorted: run_00..run_10 (6) then walk_* (6); test split keeps the
        # last 10 -> 4 runs + 6 walks; int(4/20)=0 walking kept
        assert len(balanced) == 4


class TestTrainer:
    @pytest.fixture(scope="class")
    def trainer(self, amass_data):
        cfg = TrainConfig(latent_dim=32, seq_length=10, epochs=10,
                          batch_size=32, kl_weight=0.5, log_step=0,
                          learning_rate=2e-3)
        model = ConvVAE(latent_dim=32, seq_len=10,
                        hidden_dims=(16, 16, 32, 32, 64))
        train_ds = AmassWindows.from_sequences(amass_data, frame_num=10,
                                               local_pose=True)
        test_ds = AmassWindows(train_ds.windows[:64])
        return Trainer(cfg, train_ds, test_ds, model)

    def test_uses_all_virtual_devices(self, trainer):
        assert trainer.mesh.size == len(jax.devices())
        assert trainer.mesh.size == 8  # conftest forces 8 CPU devices

    def test_training_reduces_loss(self, trainer):
        before = trainer.evaluate()
        logs = []
        trainer.train(log_fn=logs.append)
        after = trainer.evaluate()
        assert np.isfinite(after)
        assert after < before, (before, after)

    def test_checkpoint_roundtrip(self, trainer, tmp_path):
        path = trainer.save_checkpoint(str(tmp_path), epoch=0,
                                       eval_result=1.0)
        eval_before = trainer.evaluate()
        # clobber the params, then restore
        trainer.state = trainer.state.replace(
            params=jax.tree_util.tree_map(jnp.zeros_like,
                                          trainer.state.params))
        assert trainer.evaluate() != pytest.approx(eval_before)
        trainer.load_checkpoint(path)
        assert trainer.evaluate() == pytest.approx(eval_before, rel=1e-5)

    def test_cosine_schedule_trains_and_decays(self, amass_data):
        """lr_schedule='cosine' must decay the step size to lr_final and
        still reduce the loss (the headline's training recipe)."""
        import optax
        from globalegomocap_tpu.train.train_vae import make_optimizer
        cfg = TrainConfig(latent_dim=32, seq_length=10, epochs=10,
                          batch_size=32, kl_weight=0.5, log_step=0,
                          learning_rate=2e-3, lr_schedule="cosine",
                          lr_warmup_steps=3, lr_final=1e-5)
        model = ConvVAE(latent_dim=32, seq_len=10,
                        hidden_dims=(16, 16, 32, 32, 64))
        train_ds = AmassWindows.from_sequences(amass_data, frame_num=10,
                                               local_pose=True)
        trainer = Trainer(cfg, train_ds, AmassWindows(train_ds.windows[:64]),
                          model)
        before = trainer.evaluate()
        trainer.train(log_fn=lambda *_: None)
        after = trainer.evaluate()
        assert np.isfinite(after) and after < before, (before, after)
        # the schedule inside the optimizer must end at ~lr_final
        total = (len(train_ds) // 32) * 10
        sched = make_optimizer(cfg, total_steps=total)
        del sched  # construction path covered; verify the raw schedule:
        lr_fn = optax.warmup_cosine_decay_schedule(
            0.0, cfg.learning_rate, 3, total, cfg.lr_final)
        assert abs(float(lr_fn(total)) - cfg.lr_final) < 1e-8
        assert float(lr_fn(3)) == pytest.approx(cfg.learning_rate)


def test_epoch_scan_matches_eager_loop(amass_data):
    """cfg.epoch_scan runs each epoch as one lax.scan launch.  The
    computation is semantically identical to the eager per-step loop
    (same shuffles from the same np seed, same per-step rng): after one
    step the BN batch_stats — a pure function of the forward pass — must
    be EXACTLY equal, and params may differ only by Adam's first-step
    bound (the normalized update turns compilation-level fp noise on
    near-zero gradients into +-lr flips; |update| <= ~lr per component).
    Over several epochs both must train to equivalent quality, and
    eval_every must skip intermediate evals while keeping the final."""
    from globalegomocap_tpu.config import with_overrides

    def make(cfg):
        model = ConvVAE(latent_dim=32, seq_len=10,
                        hidden_dims=(16, 16, 32, 32, 64))
        train_ds = AmassWindows.from_sequences(amass_data, frame_num=10,
                                               local_pose=True)
        test_ds = AmassWindows(train_ds.windows[:64])
        return Trainer(cfg, train_ds, test_ds, model)

    lr = 2e-3
    n = len(AmassWindows.from_sequences(amass_data, frame_num=10,
                                        local_pose=True))
    one_batch = n - n % 8  # one full step; batch axis divides the mesh
    one = TrainConfig(latent_dim=32, seq_length=10, epochs=1,
                      batch_size=one_batch,
                      kl_weight=0.5, log_step=0, learning_rate=lr)
    e1 = make(one)
    e1.train(log_fn=lambda *_: None)
    s1 = make(with_overrides(one, epoch_scan=True))
    s1.train(log_fn=lambda *_: None)
    assert int(e1.state.step) == int(s1.state.step) == 1
    for a, b in zip(jax.tree_util.tree_leaves(e1.state.batch_stats),
                    jax.tree_util.tree_leaves(s1.state.batch_stats)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree_util.tree_leaves(e1.state.params),
                    jax.tree_util.tree_leaves(s1.state.params)):
        assert float(np.max(np.abs(np.asarray(a) - np.asarray(b)))) \
            <= 2.5 * lr

    cfg = TrainConfig(latent_dim=32, seq_length=10, epochs=4,
                      batch_size=32, kl_weight=0.5, log_step=0,
                      learning_rate=lr)
    eager = make(cfg)
    before = eager.evaluate()
    eager.train(log_fn=lambda *_: None)

    logs = []
    scan = make(with_overrides(cfg, epoch_scan=True, eval_every=4))
    scan.train(log_fn=logs.append)

    ee, se = eager.evaluate(), scan.evaluate()
    assert np.isfinite(se) and se < before
    assert abs(ee - se) / ee < 0.3, (ee, se)
    # eval_every=4 over 4 epochs -> exactly one eval log line
    assert sum("eval reconstruction" in str(x) for x in logs) == 1


def test_epoch_scan_block_bounds_memory(amass_data):
    """scan_block smaller than the epoch: the epoch runs as several scan
    launches + a scanned trailing block (bounded host memory for
    streaming corpora) with the same step count and equivalent result."""
    from globalegomocap_tpu.config import with_overrides

    def make(cfg):
        model = ConvVAE(latent_dim=32, seq_len=10,
                        hidden_dims=(16, 16, 32, 32, 64))
        train_ds = AmassWindows.from_sequences(amass_data, frame_num=10,
                                               local_pose=True)
        test_ds = AmassWindows(train_ds.windows[:64])
        return Trainer(cfg, train_ds, test_ds, model)

    cfg = TrainConfig(latent_dim=32, seq_length=10, epochs=2,
                      batch_size=32, kl_weight=0.5, log_step=0,
                      learning_rate=2e-3)
    big = make(with_overrides(cfg, epoch_scan=True))
    big.train(log_fn=lambda *_: None)
    small = make(with_overrides(cfg, epoch_scan=True, scan_block=2))
    small.train(log_fn=lambda *_: None)
    assert int(big.state.step) == int(small.state.step) > 0
    be, se = big.evaluate(), small.evaluate()
    assert np.isfinite(se)
    assert abs(be - se) / be < 0.3, (be, se)
