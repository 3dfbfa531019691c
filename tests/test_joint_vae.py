"""Joint local+global prior tests: training decreases all loss components
and the split branches drive the two-stage optimizer."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from globalegomocap_tpu.config import (
    TrainConfig, OptimizeConfig, SolverConfig, PriorConfig)
from globalegomocap_tpu.data.synthetic import synthetic_amass, synthetic_chunk
from globalegomocap_tpu.data.hdf5 import sequence_windows_with_cameras
from globalegomocap_tpu.models.joint_vae import JointLocalGlobalVAE
from globalegomocap_tpu.train.train_joint import JointTrainer


HIDDEN = (8, 8, 16, 16, 32)
LATENT = 32


@pytest.fixture(scope="module")
def windows_with_cameras():
    seqs = synthetic_amass(n_sequences=2, frames_per_seq=70, seed=3)
    rel, local, cams = zip(*[
        sequence_windows_with_cameras(s, frame_num=10, fps=25,
                                      slide_window=True) for s in seqs])
    poses = np.concatenate(local).reshape(-1, 10, 45)
    cameras = np.concatenate(cams)
    return poses, cameras


@pytest.mark.slow
def test_joint_training_decreases_loss(windows_with_cameras):
    poses, cameras = windows_with_cameras
    cfg = TrainConfig(latent_dim=LATENT, seq_length=10, epochs=6,
                      batch_size=32, kl_weight=0.05, learning_rate=2e-3)
    model = JointLocalGlobalVAE(latent_dim=LATENT, seq_len=10,
                                hidden_dims=HIDDEN)
    trainer = JointTrainer(cfg, poses, cameras, model)
    history = trainer.train(log_fn=lambda *_: None)
    assert history[-1]["loss"] < history[0]["loss"]
    assert np.isfinite(history[-1]["consistency"])

    # split branches plug into the two-stage optimizer
    local_v, global_v = trainer.branch_variables()
    from globalegomocap_tpu.optimize.driver import (
        SequenceOptimizer, build_model)
    ocfg = OptimizeConfig(
        prior=PriorConfig(latent_dim=LATENT, seq_len=10,
                          hidden_dims=HIDDEN),
        solver=SolverConfig(method="lbfgs_fixed", max_iter=3,
                            history_size=3))
    opt = SequenceOptimizer(build_model(ocfg), local_v, global_v, ocfg)
    errors, *_ = opt.run(synthetic_chunk(26, seed=5))
    assert np.isfinite(errors["optimized_global_mpjpe"])


def test_forward_shapes(windows_with_cameras):
    poses, cameras = windows_with_cameras
    model = JointLocalGlobalVAE(latent_dim=LATENT, seq_len=10,
                                hidden_dims=HIDDEN)
    v = model.init(jax.random.PRNGKey(0), jnp.asarray(poses[:2]),
                   jnp.asarray(cameras[:2]), False)
    out = model.apply(v, jnp.asarray(poses[:4]), jnp.asarray(cameras[:4]),
                      False)
    assert out.local_recon.shape == (4, 10, 45)
    assert out.global_recon.shape == (4, 10, 45)
    assert out.lifted_local.shape == (4, 10, 45)
    # frame 0 of the lifted local recon equals the local recon (camera-0
    # relative frame is the identity at frame 0)
    np.testing.assert_allclose(np.asarray(out.lifted_local[:, 0]),
                               np.asarray(out.local_recon[:, 0]),
                               atol=1e-5)
