"""ConvVAE tests: shape contracts, loss, and torch-checkpoint conversion
parity (encode + decode must match a torch model loaded from the same
weights, including BatchNorm running stats)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from globalegomocap_tpu.models import ConvVAE, reparameterize, vae_loss
from globalegomocap_tpu.models.conv_vae import sample_prior
from globalegomocap_tpu.models.torch_convert import (
    torch_state_dict_to_flax, flax_to_torch_state_dict)


SEQ = 10
LATENT = 32  # small latent for fast tests; architecture identical otherwise


def make_model(latent=LATENT, seq=SEQ):
    return ConvVAE(latent_dim=latent, seq_len=seq)


def init_variables(model, rng=0):
    x = jnp.zeros((2, model.seq_len, 45))
    return model.init(jax.random.PRNGKey(rng), x, False)


class TestShapes:
    def test_forward_shapes(self):
        model = make_model()
        variables = init_variables(model)
        x = jnp.asarray(np.random.default_rng(0).normal(
            size=(4, SEQ, 45)).astype(np.float32))
        out = model.apply(variables, x, False)
        assert out.reconstruction.shape == (4, SEQ, 45)
        assert out.mu.shape == (4, LATENT)
        assert out.log_var.shape == (4, LATENT)
        assert out.z.shape == (4, LATENT)
        # deterministic without rng: z == mu
        np.testing.assert_array_equal(out.z, out.mu)

    def test_decode_to_bodypose(self):
        model = make_model()
        variables = init_variables(model)
        z = jnp.zeros((3, LATENT))
        pose = model.apply(variables, z, False,
                           method=ConvVAE.decode_to_bodypose)
        assert pose.shape == (3, SEQ, 15, 3)

    def test_train_mode_updates_batch_stats(self):
        model = make_model()
        variables = init_variables(model)
        x = jnp.asarray(np.random.default_rng(1).normal(
            size=(8, SEQ, 45)).astype(np.float32))
        out, updates = model.apply(
            variables, x, True, jax.random.PRNGKey(1),
            mutable=["batch_stats"])
        # running stats must have moved
        before = jax.tree_util.tree_leaves(variables["batch_stats"])
        after = jax.tree_util.tree_leaves(updates["batch_stats"])
        assert any(not np.allclose(b, a) for b, a in zip(before, after))

    def test_sample_prior(self):
        model = make_model()
        variables = init_variables(model)
        s = sample_prior(model, variables, 5, jax.random.PRNGKey(2))
        assert s.shape == (5, SEQ, 15, 3)

    def test_reparameterize_statistics(self):
        mu = jnp.ones((1, 512)) * 2.0
        log_var = jnp.zeros((1, 512))
        z = reparameterize(mu, log_var, jax.random.PRNGKey(0))
        assert abs(float(jnp.mean(z)) - 2.0) < 0.2
        assert abs(float(jnp.std(z)) - 1.0) < 0.2


class TestLoss:
    def test_vae_loss_mean_matches_manual(self):
        rng = np.random.default_rng(0)
        rec = jnp.asarray(rng.normal(size=(4, SEQ, 45)))
        tgt = jnp.asarray(rng.normal(size=(4, SEQ, 45)))
        mu = jnp.asarray(rng.normal(size=(4, LATENT)))
        lv = jnp.asarray(rng.normal(size=(4, LATENT)) * 0.1)
        loss, recon, kld = vae_loss(rec, tgt, mu, lv, kld_weight=0.05)
        exp_recon = np.mean((np.asarray(rec) - np.asarray(tgt)) ** 2)
        exp_kld = np.mean(-0.5 * np.sum(
            1 + np.asarray(lv) - np.asarray(mu) ** 2 - np.exp(np.asarray(lv)),
            axis=1))
        np.testing.assert_allclose(float(recon), exp_recon, rtol=1e-5)
        np.testing.assert_allclose(float(kld), exp_kld, rtol=1e-5)
        np.testing.assert_allclose(float(loss), exp_recon + 0.05 * exp_kld,
                                   rtol=1e-5)


class TestTorchParity:
    @pytest.fixture(scope="class")
    def torch_pair(self):
        """A torch model with warmed-up (non-trivial) BN stats and the
        converted flax variables."""
        import torch
        from tests.torch_vae_harness import TorchConvVAE

        torch.manual_seed(0)
        tmodel = TorchConvVAE(latent_dim=LATENT, seq_len=SEQ)
        # a few train-mode passes to move BN running stats off init
        tmodel.train()
        with torch.no_grad():
            for _ in range(3):
                x = torch.randn(16, SEQ, 45)
                mu, _ = tmodel.encode(x)
                tmodel.decode(mu)
        tmodel.eval()

        sd = {k: v.detach().numpy() for k, v in tmodel.state_dict().items()}
        variables = torch_state_dict_to_flax(sd, seq_len=SEQ)
        variables = jax.tree_util.tree_map(jnp.asarray, variables)
        return tmodel, variables

    def test_encode_parity(self, torch_pair):
        import torch
        tmodel, variables = torch_pair
        model = make_model()
        x = np.random.default_rng(3).normal(size=(5, SEQ, 45)).astype(
            np.float32)
        with torch.no_grad():
            tmu, tlv = tmodel.encode(torch.tensor(x))
        fmu, flv = model.apply(variables, jnp.asarray(x), False,
                               method=ConvVAE.encode)
        np.testing.assert_allclose(np.asarray(fmu), tmu.numpy(),
                                   rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(flv), tlv.numpy(),
                                   rtol=1e-4, atol=1e-5)

    def test_decode_parity(self, torch_pair):
        import torch
        tmodel, variables = torch_pair
        model = make_model()
        z = np.random.default_rng(4).normal(size=(5, LATENT)).astype(
            np.float32)
        with torch.no_grad():
            tout = tmodel.decode(torch.tensor(z))
        fout = model.apply(variables, jnp.asarray(z), False,
                           method=ConvVAE.decode)
        np.testing.assert_allclose(np.asarray(fout), tout.numpy(),
                                   rtol=1e-4, atol=1e-5)

    def test_roundtrip_export(self, torch_pair):
        """flax -> torch state_dict -> flax keeps decode output identical."""
        tmodel, variables = torch_pair
        model = make_model()
        sd = flax_to_torch_state_dict(variables, seq_len=SEQ)
        variables2 = torch_state_dict_to_flax(sd, seq_len=SEQ)
        z = jnp.asarray(np.random.default_rng(5).normal(
            size=(2, LATENT)).astype(np.float32))
        out1 = model.apply(variables, z, False, method=ConvVAE.decode)
        out2 = model.apply(jax.tree_util.tree_map(jnp.asarray, variables2),
                           z, False, method=ConvVAE.decode)
        np.testing.assert_allclose(np.asarray(out1), np.asarray(out2),
                                   rtol=1e-6, atol=1e-7)


def test_logvar_bias_init():
    """logvar_bias_init seeds the fc_var bias (near-deterministic start);
    default 0 keeps the reference-equivalent init."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from globalegomocap_tpu.models.conv_vae import ConvVAE

    m = ConvVAE(latent_dim=8, seq_len=10, hidden_dims=(8, 8, 16, 16, 32),
                logvar_bias_init=-6.0)
    v = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 10, 45)), False)
    np.testing.assert_allclose(np.asarray(v["params"]["fc_var"]["bias"]),
                               -6.0)
    m0 = ConvVAE(latent_dim=8, seq_len=10, hidden_dims=(8, 8, 16, 16, 32))
    v0 = m0.init(jax.random.PRNGKey(0), jnp.zeros((1, 10, 45)), False)
    np.testing.assert_allclose(np.asarray(v0["params"]["fc_var"]["bias"]),
                               0.0)
    # the mu head is untouched by the option
    np.testing.assert_allclose(np.asarray(v["params"]["fc_mu"]["kernel"]),
                               np.asarray(v0["params"]["fc_mu"]["kernel"]))
