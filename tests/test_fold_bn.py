"""BatchNorm folding must be exact for eval-mode encode/decode."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from globalegomocap_tpu.models.conv_vae import ConvVAE
from globalegomocap_tpu.models.fold_bn import fold_batchnorm


def test_folding_exact():
    model = ConvVAE(latent_dim=24, seq_len=10,
                    hidden_dims=(8, 8, 16, 16, 32))
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(4, 10, 45)).astype(np.float32))
    v = model.init(jax.random.PRNGKey(0), x, False)

    # move the BN stats off their init so folding is non-trivial
    _, updates = model.apply(v, x, True, jax.random.PRNGKey(1),
                             mutable=["batch_stats"])
    v = {"params": v["params"], "batch_stats": updates["batch_stats"]}

    folded = fold_batchnorm(v)
    model_nb = ConvVAE(latent_dim=24, seq_len=10,
                       hidden_dims=(8, 8, 16, 16, 32), use_bn=False)

    mu0, lv0 = model.apply(v, x, False, method=ConvVAE.encode)
    mu1, lv1 = model_nb.apply(folded, x, False, method=ConvVAE.encode)
    np.testing.assert_allclose(np.asarray(mu1), np.asarray(mu0),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(lv1), np.asarray(lv0),
                               rtol=1e-4, atol=1e-5)

    z = jnp.asarray(rng.normal(size=(3, 24)).astype(np.float32))
    d0 = model.apply(v, z, False, method=ConvVAE.decode)
    d1 = model_nb.apply(folded, z, False, method=ConvVAE.decode)
    np.testing.assert_allclose(np.asarray(d1), np.asarray(d0),
                               rtol=1e-4, atol=1e-5)


@pytest.mark.slow
def test_fold_bn_in_pipeline():
    """cfg.fold_bn=True produces near-identical chunk results."""
    from globalegomocap_tpu.config import (
        OptimizeConfig, SolverConfig, PriorConfig)
    from globalegomocap_tpu.data.synthetic import synthetic_chunk
    from globalegomocap_tpu.optimize.driver import (
        SequenceOptimizer, build_model)

    prior = PriorConfig(latent_dim=16, seq_len=10,
                        hidden_dims=(8, 8, 16, 16, 32))
    solver = SolverConfig(method="lbfgs_fixed", max_iter=3, history_size=3)
    cfg0 = OptimizeConfig(prior=prior, solver=solver, fold_bn=False)
    cfg1 = OptimizeConfig(prior=prior, solver=solver, fold_bn=True)

    model = build_model(cfg0)
    x = jnp.zeros((1, 10, 45))
    v = model.init(jax.random.PRNGKey(0), x, False)
    # warm BN stats so folding is non-trivial
    rng = np.random.default_rng(5)
    xb = jnp.asarray(rng.normal(size=(8, 10, 45)).astype(np.float32))
    _, upd = model.apply(v, xb, True, jax.random.PRNGKey(1),
                         mutable=["batch_stats"])
    v = {"params": v["params"], "batch_stats": upd["batch_stats"]}

    chunk = synthetic_chunk(26, seed=8)
    a = SequenceOptimizer(model, v, v, cfg0).optimize_chunk(chunk)
    b = SequenceOptimizer(model, v, v, cfg1).optimize_chunk(chunk)
    np.testing.assert_allclose(np.asarray(b.optimized),
                               np.asarray(a.optimized), rtol=5e-3,
                               atol=5e-4)
