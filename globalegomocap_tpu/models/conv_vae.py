"""Convolutional sequence motion-VAE (Flax).

Architectural parity with the reference prior
(reference: networks/models/SeqConvVAE.py:9-245):

  encoder: 5 x [Conv1d(k=3, s=1, SAME) -> BatchNorm -> LeakyReLU(0.01)]
           with channels (64, 64, 128, 256, 512), then flatten and two
           Linear heads fc_mu / fc_var -> latent (default 2048).
  decoder: Linear latent -> 512*T, reshaped to a length-T sequence, then
           4 x [ConvT(k=3, s=1) -> BN -> LeakyReLU], a final
           [ConvT -> BN -> LeakyReLU] block and a Conv1d projection to 45
           channels.

With stride 1 a ConvTranspose1d(k=3, p=1) is mathematically a Conv1d with
the kernel flipped along time, so the decoder uses plain convolutions here;
the torch-checkpoint converter (models/torch_convert.py) performs the flip,
making released PyTorch weights bit-compatible.

TPU notes: data layout is channels-last (B, T, C) — XLA's native conv
layout — and the compute dtype is configurable so training can run the conv
stacks in bfloat16 on the MXU while optimization-time decoding keeps
float32.

The optional bone-length encoder branch of the reference
(SeqConvVAE.py:47-57, off in every released configuration) is supported via
`with_bone_length`.
"""

from __future__ import annotations

from typing import Any, NamedTuple, Protocol, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from globalegomocap_tpu.ops.skeleton import KINEMATIC_PARENTS


class VAEOutput(NamedTuple):
    reconstruction: jnp.ndarray  # (B, T, C)
    mu: jnp.ndarray              # (B, latent)
    log_var: jnp.ndarray         # (B, latent)
    z: jnp.ndarray               # (B, latent)


class BaseVAE(Protocol):
    """The VAE interface contract (the reference's abstract BaseVAE,
    networks/models/BaseVAE.py:6-29): any motion prior exposing these
    methods plugs into the optimizer and trainer."""

    def encode(self, pose: jnp.ndarray, train: bool = False): ...
    def decode(self, z: jnp.ndarray, train: bool = False): ...
    def decode_to_bodypose(self, z: jnp.ndarray,
                           train: bool = False): ...
    def __call__(self, pose: jnp.ndarray, train: bool = False,
                 rng=None): ...


class ConvBNAct(nn.Module):
    """Conv1d -> BatchNorm -> LeakyReLU block (channels-last).

    use_bn=False skips the BatchNorm call entirely — used with
    `models.fold_bn.fold_batchnorm`-ed variables at optimization time,
    where BN is a frozen affine map that folds exactly into the conv (the
    objective evaluation is op-latency-bound, so removing the runtime BN
    op matters; XLA cannot eliminate it itself because the BN parameters
    are runtime inputs, not literals)."""
    features: int
    dtype: Any = jnp.float32
    use_bn: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool) -> jnp.ndarray:
        x = nn.Conv(self.features, kernel_size=(3,), strides=(1,),
                    padding="SAME", dtype=self.dtype, name="conv")(x)
        if self.use_bn:
            x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-5, dtype=self.dtype, name="bn")(x)
        return nn.leaky_relu(x, negative_slope=0.01)


class ConvVAE(nn.Module):
    """The sequence motion prior.

    Call signatures (via `.apply` with `method=`):
      __call__(pose, train, rng) -> VAEOutput      full fwd with sampling
      encode(pose, train) -> (mu, log_var)
      decode(z, train) -> (B, T, C) sequences
      decode_to_bodypose(z, train) -> (B, T, 15, 3)
    """
    in_channels: int = 45
    out_channels: int = 45
    latent_dim: int = 2048
    seq_len: int = 10
    hidden_dims: Sequence[int] = (64, 64, 128, 256, 512)
    with_bone_length: bool = False
    dtype: Any = jnp.float32
    # False = BN structurally skipped (pair with fold_batchnorm'd variables)
    use_bn: bool = True
    # compute dtype of the fc_mu head only (None = `dtype`).  The
    # optimizer's "bfloat16_f32head" tier sets this to float32 on an
    # otherwise-bf16 model: the solver-init mu is the ONE bf16 value whose
    # rounding measurably shifts where a 12-iteration L-BFGS lands
    # (bench_gap_probe.json localized the pure-bf16 tier's +0.0007
    # bone-aligned cost to the bf16-encoded init mu), and an f32 fc_mu is
    # a single 5120x2048 matmul per launch vs the full f32 encode the
    # mixed tier pays (~12% of launch time).  fc_var stays at `dtype` —
    # log_var only feeds the optional init='sample' reparameterization.
    head_dtype: Any = None
    # initial bias of the log-variance head.  The default (0, like the
    # reference's torch Linear init) starts the posterior at std ~= 1, so
    # early training is swamped by z-noise and reconstruction improves only
    # as fast as recon gradients shrink log_var; a negative value (e.g. -6
    # -> std ~= 0.05) starts near-deterministic, which converges much
    # faster on small corpora (prior_floor_experiment.json).  Loaded torch
    # checkpoints overwrite it, so parity is unaffected.
    logvar_bias_init: float = 0.0

    def setup(self):
        self.encoder_blocks = [
            ConvBNAct(h, dtype=self.dtype, use_bn=self.use_bn,
                      name=f"enc_{i}")
            for i, h in enumerate(self.hidden_dims)
        ]
        hd = self.head_dtype if self.head_dtype is not None else self.dtype
        self.fc_mu = nn.Dense(self.latent_dim, dtype=hd)
        self.fc_var = nn.Dense(
            self.latent_dim, dtype=self.dtype,
            bias_init=nn.initializers.constant(self.logvar_bias_init))

        if self.with_bone_length:
            self.bone_dense = nn.Dense(512, dtype=self.dtype)
            self.bone_bn = nn.BatchNorm(momentum=0.9, epsilon=1e-5,
                                        dtype=self.dtype)
            self.fusion_dense = nn.Dense(
                self.hidden_dims[-1] * self.seq_len, dtype=self.dtype)
            self.fusion_bn = nn.BatchNorm(momentum=0.9, epsilon=1e-5,
                                          dtype=self.dtype)

        rev = tuple(reversed(self.hidden_dims))
        self.decoder_input = nn.Dense(rev[0] * self.seq_len,
                                      dtype=self.dtype)
        self.decoder_blocks = [
            ConvBNAct(rev[i + 1], dtype=self.dtype, use_bn=self.use_bn,
                      name=f"dec_{i}")
            for i in range(len(rev) - 1)
        ]
        self.final_block = ConvBNAct(rev[-1], dtype=self.dtype,
                                     use_bn=self.use_bn,
                                     name="final_block")
        self.final_conv = nn.Conv(self.out_channels, kernel_size=(3,),
                                  padding="SAME", dtype=self.dtype,
                                  name="final_conv")

    def encode(self, pose: jnp.ndarray, train: bool = False):
        """pose: (B, T, C) -> (mu, log_var), each (B, latent)."""
        h = pose.astype(self.dtype)
        for blk in self.encoder_blocks:
            h = blk(h, train)
        # NOTE: flattening order is (T, C); the torch converter permutes the
        # Linear weights to account for torch's (C, T) flatten order.
        h = h.reshape(h.shape[0], -1)
        if self.with_bone_length:
            bl = self._bone_length_encoding(pose, train)
            h = self.fusion_dense(jnp.concatenate([h, bl], axis=-1))
            h = nn.leaky_relu(self.fusion_bn(
                h, use_running_average=not train), 0.01)
        return self.fc_mu(h), self.fc_var(h)

    def _bone_length_encoding(self, pose: jnp.ndarray, train: bool):
        b = pose.shape[0]
        sk = pose.reshape(b, self.seq_len, 15, 3)
        bones = sk - sk[:, :, jnp.asarray(KINEMATIC_PARENTS), :]
        lengths = jnp.linalg.norm(bones, axis=-1).reshape(b, -1)
        h = self.bone_dense(lengths)
        return nn.leaky_relu(self.bone_bn(
            h, use_running_average=not train), 0.01)

    def decode(self, z: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        """z: (B, latent) -> (B, T, out_channels)."""
        rev0 = tuple(reversed(self.hidden_dims))[0]
        h = self.decoder_input(z.astype(self.dtype))
        h = h.reshape(-1, self.seq_len, rev0)
        for blk in self.decoder_blocks:
            h = blk(h, train)
        h = self.final_block(h, train)
        return self.final_conv(h)

    def decode_to_bodypose(self, z: jnp.ndarray,
                           train: bool = False) -> jnp.ndarray:
        """z: (B, latent) -> (B, T, 15, 3) joint sequences
        (reference: SeqConvVAE.py:131-140)."""
        out = self.decode(z, train)
        return out.reshape(-1, self.seq_len, 15, 3)

    def __call__(self, pose: jnp.ndarray, train: bool = False,
                 rng: jax.Array | None = None) -> VAEOutput:
        """Full forward pass: encode, reparameterize, decode.

        pose: (B, T, C).  When `rng` is None the latent is the mean mu
        (deterministic); training passes a PRNG key for the
        reparameterization sample.
        """
        mu, log_var = self.encode(pose, train)
        z = reparameterize(mu, log_var, rng)
        return VAEOutput(self.decode(z, train), mu, log_var, z)


def reparameterize(mu: jnp.ndarray, log_var: jnp.ndarray,
                   rng: jax.Array | None) -> jnp.ndarray:
    """z = mu + eps * exp(0.5 log_var); deterministic (z = mu) without rng.

    The reference always samples (SeqConvVAE.py:159-169) — including at
    optimizer init, which makes its runs stochastic; passing rng=None gives
    the deterministic mu-init this rebuild prefers (SURVEY.md §7 risks).
    """
    if rng is None:
        return mu
    std = jnp.exp(0.5 * log_var)
    return mu + jax.random.normal(rng, mu.shape, mu.dtype) * std


def vae_loss(reconstruction: jnp.ndarray, target: jnp.ndarray,
             mu: jnp.ndarray, log_var: jnp.ndarray,
             kld_weight: float, reduction: str = "mean"):
    """ELBO loss of the reference (SeqConvVAE.py:191-219).

    reduction='mean': recon = MSE-mean and `kld_weight` plays the role of
    the reference's M_N (kl_weight * batch / dataset_len).
    reduction='sum':  recon = summed squared error with a plain kl_weight.
    Returns (loss, recon_loss, kld_loss).
    """
    diff = reconstruction - target
    if reduction == "mean":
        recon = jnp.mean(jnp.square(diff))
    else:
        recon = jnp.sum(jnp.square(diff))
    kld = jnp.mean(
        -0.5 * jnp.sum(1 + log_var - jnp.square(mu) - jnp.exp(log_var),
                       axis=1))
    return recon + kld_weight * kld, recon, kld


def sample_prior(model: ConvVAE, variables, num_samples: int,
                 rng: jax.Array) -> jnp.ndarray:
    """Decode N(0, I) latents into (N, T, 15, 3) motion sequences
    (reference: SeqConvVAE.py:221-235 / networks/sample.py)."""
    z = jax.random.normal(rng, (num_samples, model.latent_dim))
    out = model.apply(variables, z, False, method=ConvVAE.decode)
    return out.reshape(num_samples, model.seq_len, 15, 3)
