"""The banded-matmul decoder must reproduce ConvVAE.decode exactly (it is a
re-association of the same linear layers), value AND gradient, and drop into
the pipeline without changing results."""

import numpy as np
import jax
import jax.numpy as jnp

from globalegomocap_tpu.models.conv_vae import ConvVAE
from globalegomocap_tpu.models.dense_decoder import make_dense_decoder
from globalegomocap_tpu.models.fold_bn import fold_batchnorm

HIDDEN = (8, 8, 16, 16, 32)


def _warmed_variables(model, seed=0):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.normal(size=(8, model.seq_len, 45))
                    .astype(np.float32))
    v = model.init(jax.random.PRNGKey(0), x, False)
    # move BN stats off init so folding is non-trivial
    _, upd = model.apply(v, x, True, jax.random.PRNGKey(1),
                         mutable=["batch_stats"])
    return {"params": v["params"], "batch_stats": upd["batch_stats"]}


def test_dense_decode_matches_conv():
    model = ConvVAE(latent_dim=24, seq_len=10, hidden_dims=HIDDEN)
    v = _warmed_variables(model)
    rng = np.random.default_rng(1)
    z = jnp.asarray(rng.normal(size=(5, 24)).astype(np.float32))

    ref = model.apply(v, z, False, method=ConvVAE.decode_to_bodypose)
    dense = make_dense_decoder(model, v)(z)
    np.testing.assert_allclose(np.asarray(dense), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)

    # also from pre-folded variables paired with use_bn=False
    folded = fold_batchnorm(v)
    model_nb = ConvVAE(latent_dim=24, seq_len=10, hidden_dims=HIDDEN,
                       use_bn=False)
    dense2 = make_dense_decoder(model_nb, folded)(z)
    np.testing.assert_allclose(np.asarray(dense2), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)


def test_shift_decode_matches_conv():
    """The shift-matmul decoder is exact vs the conv stack (values), from
    both raw-BN and pre-folded variables."""
    from globalegomocap_tpu.models.dense_decoder import make_shift_decoder
    model = ConvVAE(latent_dim=24, seq_len=10, hidden_dims=HIDDEN)
    v = _warmed_variables(model, seed=7)
    rng = np.random.default_rng(8)
    z = jnp.asarray(rng.normal(size=(5, 24)).astype(np.float32))

    ref = model.apply(v, z, False, method=ConvVAE.decode_to_bodypose)
    shift = make_shift_decoder(model, v)(z)
    np.testing.assert_allclose(np.asarray(shift), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)

    folded = fold_batchnorm(v)
    model_nb = ConvVAE(latent_dim=24, seq_len=10, hidden_dims=HIDDEN,
                       use_bn=False)
    shift2 = make_shift_decoder(model_nb, folded)(z)
    np.testing.assert_allclose(np.asarray(shift2), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)

    # bf16 weight storage stays within bf16 rounding of the f32 result
    bf = make_shift_decoder(model, v, jnp.bfloat16)(z)
    assert bf.dtype == jnp.float32
    np.testing.assert_allclose(np.asarray(bf), np.asarray(ref),
                               rtol=0.05, atol=0.05)


def test_shift_decoder_in_pipeline():
    """cfg.decoder_impl='shift' produces near-identical chunk results."""
    from globalegomocap_tpu.config import (
        OptimizeConfig, SolverConfig, PriorConfig)
    from globalegomocap_tpu.data.synthetic import synthetic_chunk
    from globalegomocap_tpu.optimize.driver import (
        SequenceOptimizer, build_model)

    prior = PriorConfig(latent_dim=16, seq_len=10, hidden_dims=HIDDEN)
    solver = SolverConfig(method="lbfgs_fixed", max_iter=3, history_size=3)
    cfg0 = OptimizeConfig(prior=prior, solver=solver)
    cfg1 = OptimizeConfig(prior=prior, solver=solver, fold_bn=True,
                          decoder_impl="shift")

    model = build_model(cfg0)
    v = _warmed_variables(
        ConvVAE(latent_dim=16, seq_len=10, hidden_dims=HIDDEN), seed=9)
    chunk = synthetic_chunk(n_frames=26, seed=2)
    r0 = SequenceOptimizer(model, v, v, cfg0).optimize_chunk(chunk)
    r1 = SequenceOptimizer(model, v, v, cfg1).optimize_chunk(chunk)
    np.testing.assert_allclose(np.asarray(r1.optimized),
                               np.asarray(r0.optimized),
                               rtol=1e-2, atol=2e-4)


def test_dense_decode_gradient_matches():
    model = ConvVAE(latent_dim=16, seq_len=10, hidden_dims=HIDDEN)
    v = _warmed_variables(model, seed=2)
    dense = make_dense_decoder(model, v)

    def loss_conv(z):
        p = model.apply(v, z[None], False,
                        method=ConvVAE.decode_to_bodypose)[0]
        return jnp.sum(jnp.sin(p) * p)

    def loss_dense(z):
        return jnp.sum(jnp.sin(dense(z[None])[0]) * dense(z[None])[0])

    rng = np.random.default_rng(3)
    z = jnp.asarray(rng.normal(size=(16,)).astype(np.float32))
    g0 = jax.grad(loss_conv)(z)
    g1 = jax.grad(loss_dense)(z)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g0),
                               rtol=1e-3, atol=1e-5)


def test_dense_decoder_in_pipeline():
    """cfg.dense_decoder=True produces near-identical chunk results."""
    from globalegomocap_tpu.config import (
        OptimizeConfig, SolverConfig, PriorConfig)
    from globalegomocap_tpu.data.synthetic import synthetic_chunk
    from globalegomocap_tpu.optimize.driver import (
        SequenceOptimizer, build_model)

    prior = PriorConfig(latent_dim=16, seq_len=10, hidden_dims=HIDDEN)
    solver = SolverConfig(method="lbfgs_fixed", max_iter=3, history_size=3)
    cfg0 = OptimizeConfig(prior=prior, solver=solver)
    cfg1 = OptimizeConfig(prior=prior, solver=solver, fold_bn=True,
                          dense_decoder=True)

    model = build_model(cfg0)
    v = _warmed_variables(
        ConvVAE(latent_dim=16, seq_len=10, hidden_dims=HIDDEN), seed=5)

    chunk = synthetic_chunk(n_frames=26, seed=0)
    r0 = SequenceOptimizer(model, v, v, cfg0).optimize_chunk(chunk)
    r1 = SequenceOptimizer(model, v, v, cfg1).optimize_chunk(chunk)
    np.testing.assert_allclose(np.asarray(r1.optimized),
                               np.asarray(r0.optimized),
                               rtol=1e-2, atol=2e-4)
    np.testing.assert_allclose(np.asarray(r1.mid), np.asarray(r0.mid),
                               rtol=1e-2, atol=2e-4)
