"""Config-surface tests: remat and bfloat16 pipeline options must run and
stay finite (their perf characteristics are measured on hardware; these
guard the code paths)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from globalegomocap_tpu.config import (
    OptimizeConfig, SolverConfig, PriorConfig, with_overrides)
from globalegomocap_tpu.data.synthetic import synthetic_chunk
from globalegomocap_tpu.optimize.driver import SequenceOptimizer, build_model


PRIOR = PriorConfig(latent_dim=16, seq_len=10, hidden_dims=(8, 8, 16, 16, 32))


def _run(cfg):
    model = build_model(cfg)
    v = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 10, 45)), False)
    opt = SequenceOptimizer(model, v, v, cfg)
    errors, *_ = opt.run(synthetic_chunk(26, seed=1))
    assert np.isfinite(errors["optimized_global_mpjpe"])
    return errors


def test_remat_runs():
    _run(OptimizeConfig(prior=PRIOR,
                        solver=SolverConfig(method="lbfgs_fixed",
                                            max_iter=3, history_size=3,
                                            remat=True)))


def test_bfloat16_decoder_runs():
    _run(OptimizeConfig(prior=PRIOR, compute_dtype="bfloat16",
                        solver=SolverConfig(method="lbfgs_fixed",
                                            max_iter=3, history_size=3)))


def test_one_euro_final_smoother():
    cfg = OptimizeConfig(prior=PRIOR, final_smooth_method="one_euro",
                         solver=SolverConfig(method="lbfgs_fixed",
                                             max_iter=3, history_size=3))
    errors = _run(cfg)
    cfg_g = with_overrides(cfg, final_smooth_method="gaussian")
    errors_g = _run(cfg_g)
    # both filters produce finite, different results
    assert errors["optimized_global_mpjpe"] != \
        errors_g["optimized_global_mpjpe"]


@pytest.mark.slow
def test_remat_matches_plain():
    cfg_plain = OptimizeConfig(prior=PRIOR,
                               solver=SolverConfig(method="lbfgs_fixed",
                                                   max_iter=3,
                                                   history_size=3))
    cfg_remat = with_overrides(
        cfg_plain, solver=SolverConfig(method="lbfgs_fixed", max_iter=3,
                                       history_size=3, remat=True))
    model = build_model(cfg_plain)
    v = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 10, 45)), False)
    chunk = synthetic_chunk(26, seed=2)
    a = SequenceOptimizer(model, v, v, cfg_plain).optimize_chunk(chunk)
    b = SequenceOptimizer(model, v, v, cfg_remat).optimize_chunk(chunk)
    # remat changes only the backward-pass schedule, not the math
    np.testing.assert_allclose(np.asarray(a.optimized),
                               np.asarray(b.optimized), rtol=1e-4,
                               atol=1e-5)
