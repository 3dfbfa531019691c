"""Full-stack quality test: train local + global priors on synthetic AMASS
motion, then run the two-stage optimization on a noisy synthetic chunk and
verify it improves pose accuracy — the acceptance criterion of the whole
framework (reference parity is defined by 'optimization reduces MPJPE',
optimize_whole_sequence.py:87-88)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

# trained-prior e2e: minutes of prior training on the 1-core box
pytestmark = pytest.mark.slow

from globalegomocap_tpu.config import (
    OptimizeConfig, SolverConfig, PriorConfig, TrainConfig, EnergyConfig,
    with_overrides)
from globalegomocap_tpu.data.amass import AmassWindows
from globalegomocap_tpu.data.synthetic import synthetic_amass, synthetic_chunk
from globalegomocap_tpu.models.conv_vae import ConvVAE
from globalegomocap_tpu.optimize.driver import SequenceOptimizer, build_model
from globalegomocap_tpu.train.train_vae import Trainer


PRIOR = PriorConfig(latent_dim=128, seq_len=10,
                    hidden_dims=(32, 32, 64, 64, 128))


def train_prior(local_pose: bool, seqs, epochs=12) -> dict:
    cfg = TrainConfig(latent_dim=PRIOR.latent_dim, seq_length=10,
                      epochs=epochs, batch_size=64, kl_weight=0.05,
                      learning_rate=2e-3, log_step=0)
    model = ConvVAE(latent_dim=PRIOR.latent_dim, seq_len=10,
                    hidden_dims=PRIOR.hidden_dims)
    train_ds = AmassWindows.from_sequences(seqs, frame_num=10,
                                           local_pose=local_pose)
    test_ds = AmassWindows(train_ds.windows[::10])
    trainer = Trainer(cfg, train_ds, test_ds, model)
    trainer.train(log_fn=lambda *_: None)
    final = trainer.evaluate()
    return trainer.variables, final


@pytest.fixture(scope="module")
def trained_priors():
    seqs = synthetic_amass(n_sequences=8, frames_per_seq=200, seed=7)
    local_vars, local_mpjpe = train_prior(True, seqs)
    global_vars, global_mpjpe = train_prior(False, seqs)
    return local_vars, global_vars, local_mpjpe, global_mpjpe


class TestEndToEndQuality:
    def test_priors_reconstruct(self, trained_priors):
        """The briefly-trained priors must reconstruct held-out motion at
        roughly the motion amplitude scale (full training drives this far
        lower; the hard acceptance criterion is the improvement test)."""
        _, _, local_mpjpe, global_mpjpe = trained_priors
        assert local_mpjpe < 0.12, local_mpjpe
        assert global_mpjpe < 0.15, global_mpjpe

    def test_optimization_improves_pose(self, trained_priors):
        local_vars, global_vars, *_ = trained_priors
        cfg = OptimizeConfig(
            prior=PRIOR,
            solver=SolverConfig(max_iter=20, history_size=20,
                                max_ls_evals=15),
        )
        model = build_model(cfg)
        opt = SequenceOptimizer(model, local_vars, global_vars, cfg)

        chunk = synthetic_chunk(n_frames=60, seed=11, noise_std=0.03)
        errors, est, mid_local, optimized, gt = opt.run(chunk)

        # the bone-length + per-frame-aligned MPJPE must improve, and the
        # reference's regression tripwire must not fire
        assert errors["aligned_optimized_mpjpe"] < \
            errors["aligned_original_mpjpe"], errors
        assert errors["optimized_global_mpjpe"] < \
            errors["original_global_mpjpe"], errors
        # sanity: starting error is the noise level
        assert 0.01 < errors["original_global_mpjpe"] < 0.1

    def test_production_config_quality(self, trained_priors):
        """The exact benchmark configuration (fixed solver with fused
        probes + dense MXU sampling + peak-cropped heatmaps + BN folding +
        banded-matmul decoder + flat multi-chunk batch) must match the
        plain configuration's quality."""
        local_vars, global_vars, *_ = trained_priors
        chunks = [synthetic_chunk(n_frames=40, seed=31 + i,
                                  noise_std=0.03) for i in range(2)]

        base_cfg = OptimizeConfig(
            prior=PRIOR,
            solver=SolverConfig(method="lbfgs_fixed", max_iter=20,
                                history_size=20))
        prod_cfg = with_overrides(
            base_cfg, fold_bn=True, dense_decoder=True,
            decoder_impl="shift",   # bench default since round 2
            sampling_impl="dense", heatmap_crop=16,
            solver=SolverConfig(method="lbfgs_fixed", max_iter=15,
                                history_size=10, fused_probes=True))

        from globalegomocap_tpu.evaluation.metrics import calculate_errors

        def quality(cfg, flat):
            model = build_model(cfg)
            opt = SequenceOptimizer(model, local_vars, global_vars, cfg)
            if flat:
                res = opt.optimize_chunks_batched(chunks, mode="flat")
                errs = [calculate_errors(res.estimated[i], res.mid[i],
                                         res.optimized[i], res.gt[i])
                        for i in range(len(chunks))]
            else:
                errs = [opt.run(c)[0] for c in chunks]
            return float(np.mean([e["aligned_optimized_mpjpe"]
                                  for e in errs]))

        plain = quality(base_cfg, flat=False)
        prod = quality(prod_cfg, flat=True)
        assert prod < plain * 1.05 + 1e-4, (prod, plain)

    def test_fixed_solver_matches_adaptive_quality(self, trained_priors):
        """The TPU-fast fixed-iteration solver must achieve the same
        quality as the torch-parity adaptive solver (within noise)."""
        local_vars, global_vars, *_ = trained_priors
        chunk = synthetic_chunk(n_frames=60, seed=11, noise_std=0.03)

        results = {}
        for method in ("lbfgs", "lbfgs_fixed"):
            cfg = OptimizeConfig(
                prior=PRIOR,
                solver=SolverConfig(method=method, max_iter=20,
                                    history_size=20, max_ls_evals=15))
            model = build_model(cfg)
            opt = SequenceOptimizer(model, local_vars, global_vars, cfg)
            errors, *_ = opt.run(chunk)
            results[method] = errors

        a = float(results["lbfgs"]["optimized_global_mpjpe"])
        f = float(results["lbfgs_fixed"]["optimized_global_mpjpe"])
        assert f < float(results["lbfgs_fixed"]["original_global_mpjpe"])
        assert f <= a * 1.15 + 1e-4, (f, a)
