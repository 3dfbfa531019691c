"""Prior-regime matching (optimize/prior_bank.py, VERDICT r3 #7): the
motion statistic separates the corpus regimes, the bank selects the
nearest prior in log space, the driver auto-selects per staged batch,
and a mismatch warns when no bank is available.

The reference's only answer to prior/corpus mismatch is "train the prior
on matching data" (reference: networks/train.py:35-129); nothing in its
production surface detects the mismatch.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from globalegomocap_tpu.config import (
    OptimizeConfig, PriorConfig, SolverConfig)
from globalegomocap_tpu.data.synthetic import (
    synthetic_chunk, synthetic_chunk_v2, synthetic_motion,
    synthetic_motion_contacts)
from globalegomocap_tpu.optimize.driver import (
    SequenceOptimizer, build_model)
from globalegomocap_tpu.optimize.prior_bank import (
    PriorBank, motion_accel_stat, windows_accel_stat)


def _cfg():
    return OptimizeConfig(
        prior=PriorConfig(latent_dim=16, seq_len=10,
                          hidden_dims=(8, 8, 16, 16, 32)),
        solver=SolverConfig(method="lbfgs_fixed", max_iter=2,
                            history_size=2),
        heatmap_crop=8)


def test_accel_stat_separates_regimes():
    """The statistic must order the corpora: smooth v1 < jerky v2 <
    contact v3 motion (it is the thing the regimes differ in)."""
    m1 = synthetic_motion(100, seed=0)
    m2 = synthetic_motion(100, seed=0, motion_scale=0.10,
                          freq_range=(0.5, 2.5))
    m3 = synthetic_motion_contacts(100, seed=0)
    a1, a2, a3 = (motion_accel_stat(m) for m in (m1, m2, m3))
    assert a2 > 2.0 * a1
    assert a3 > 2.0 * a1


def test_windows_accel_stat_matches_pose_stat():
    m = synthetic_motion(40, seed=1)
    w = m.reshape(1, 40, 45)
    np.testing.assert_allclose(windows_accel_stat(w),
                               motion_accel_stat(m), rtol=1e-6)


def test_bank_selects_nearest_in_log_space():
    bank = PriorBank()
    bank.add("smooth", "L1", "G1", 1e-3)
    bank.add("jerky", "L2", "G2", 8e-3)
    assert bank.select(1.2e-3).name == "smooth"
    assert bank.select(6e-3).name == "jerky"
    # log-space midpoint of 1e-3 and 8e-3 is ~2.83e-3
    assert bank.select(2.5e-3).name == "smooth"
    assert bank.select(3.2e-3).name == "jerky"
    with pytest.raises(ValueError):
        PriorBank().select(1e-3)
    with pytest.raises(ValueError):
        PriorBank().add("bad", None, None, 0.0)


def test_driver_auto_selects_matched_prior():
    """Staging measures the batch statistic and the solve uses the bank
    entry nearest to it — the v1 batch gets the 'smooth' prior, the v2
    batch the 'jerky' one.  The selected pair's variables are the ones
    the program actually consumes (distinct inits -> distinct outputs)."""
    cfg = _cfg()
    model = build_model(cfg)
    va = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 10, 45)), False)
    vb = model.init(jax.random.PRNGKey(9), jnp.zeros((1, 10, 45)), False)

    c1 = synthetic_chunk(26, seed=3)
    c2 = synthetic_chunk_v2(26, seed=3)
    # bank stats come from the CLEAN training motion (as the Trainer
    # records them), measured at the prior's window resolution — the
    # noise-robust estimator keeps them commensurable with the noisy
    # deployment batches
    from globalegomocap_tpu.data.synthetic import synthetic_motion
    a1 = motion_accel_stat(synthetic_motion(100, seed=0), window=10)
    a2 = motion_accel_stat(
        synthetic_motion(100, seed=0, motion_scale=0.10,
                         freq_range=(0.5, 2.5)), window=10)
    bank = (PriorBank().add("smooth", va, va, a1)
            .add("jerky", vb, vb, a2))

    opt = SequenceOptimizer(model, va, va, cfg, prior_bank=bank)
    s1 = opt.stage([c1])
    assert s1.accel_mean is not None
    r1 = opt.optimize_chunks_batched(s1, mode="flat")
    assert opt.last_prior_name == "smooth"

    s2 = opt.stage([c2])
    opt.optimize_chunks_batched(s2, mode="flat")
    assert opt.last_prior_name == "jerky"

    # selection is live: solving the v1 batch with a bank holding ONLY
    # the jerky prior gives a different trajectory
    opt2 = SequenceOptimizer(model, va, va, cfg, prior_bank=PriorBank()
                             .add("jerky", vb, vb, a2))
    r1b = opt2.optimize_chunks_batched(opt2.stage([c1]), mode="flat")
    assert not np.allclose(np.asarray(r1.optimized),
                           np.asarray(r1b.optimized))


def test_mismatch_warns_without_bank():
    cfg = _cfg()
    model = build_model(cfg)
    v = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 10, 45)), False)
    c2 = synthetic_chunk_v2(26, seed=3)
    a1 = motion_accel_stat(synthetic_motion(100, seed=0), window=10)

    opt = SequenceOptimizer(model, v, v, cfg, prior_accel_mean=a1)
    staged = opt.stage([c2])
    with pytest.warns(UserWarning, match="motion-regime mismatch"):
        opt.optimize_chunks_batched(staged, mode="flat")

    # matched input: no warning
    opt2 = SequenceOptimizer(model, v, v, cfg, prior_accel_mean=a1)
    import warnings as _w
    with _w.catch_warnings():
        _w.simplefilter("error")
        opt2.optimize_chunks_batched(
            opt2.stage([synthetic_chunk(26, seed=5)]), mode="flat")


def test_stage_skips_stat_when_unconfigured():
    """No bank, no recorded stat -> staging must not pay the extra
    readback (accel_mean stays None)."""
    cfg = _cfg()
    model = build_model(cfg)
    v = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 10, 45)), False)
    opt = SequenceOptimizer(model, v, v, cfg)
    assert opt.stage([synthetic_chunk(26, seed=3)]).accel_mean is None


def test_trainer_records_motion_stats(tmp_path):
    from globalegomocap_tpu.config import TrainConfig
    from globalegomocap_tpu.data.amass import AmassWindows
    from globalegomocap_tpu.data.synthetic import synthetic_amass
    from globalegomocap_tpu.models.conv_vae import ConvVAE
    from globalegomocap_tpu.train.train_vae import Trainer
    import json
    import os

    seqs = synthetic_amass(n_sequences=2, frames_per_seq=40, seed=0)
    ds = AmassWindows.from_sequences(seqs, frame_num=10, local_pose=True)
    cfg = TrainConfig(latent_dim=16, seq_length=10, epochs=1,
                      batch_size=8, log_step=0)
    tr = Trainer(cfg, ds, ds,
                 ConvVAE(latent_dim=16, seq_len=10,
                         hidden_dims=(8, 8, 16, 16, 32)))
    assert tr.motion_stats is not None \
        and tr.motion_stats["accel_mean"] > 0
    tr.save_checkpoint(str(tmp_path), 0, 0.5)
    with open(os.path.join(str(tmp_path), "0.json")) as f:
        meta = json.load(f)
    assert meta["motion_stats"]["accel_mean"] == pytest.approx(
        tr.motion_stats["accel_mean"])
