"""Joint local+global sequence VAE.

The reference ships a joint trainer (networks/train_local_global.py) whose
model `LocalGlobalSeqVAE` is missing from the repo (bit-rotted imports,
SURVEY.md §2.2); this module implements the capability that trainer
intended: a LOCAL motion VAE and a GLOBAL motion VAE trained jointly, tied
by the camera geometry — the local decoder's output, lifted through the
window's camera matrices into the relative-global frame, must agree with
the global branch's reconstruction.

Total loss = local ELBO + global ELBO + consistency * || lift(local_recon)
- global_recon ||², so the two priors the optimizer consumes (stage 1
local, stage 2 global) are trained to be geometrically compatible instead
of independently.
"""

from __future__ import annotations

from typing import Any, NamedTuple, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from globalegomocap_tpu.models.conv_vae import ConvVAE, reparameterize, vae_loss
from globalegomocap_tpu.ops.transforms import relative_global_pose


class JointVAEOutput(NamedTuple):
    local_recon: jnp.ndarray    # (B, T, 45)
    global_recon: jnp.ndarray   # (B, T, 45)
    local_mu: jnp.ndarray
    local_log_var: jnp.ndarray
    global_mu: jnp.ndarray
    global_log_var: jnp.ndarray
    lifted_local: jnp.ndarray   # (B, T, 45) local recon in rel-global frame


class JointLocalGlobalVAE(nn.Module):
    """Two ConvVAE branches tied by camera geometry."""
    latent_dim: int = 2048
    seq_len: int = 10
    hidden_dims: Sequence[int] = (64, 64, 128, 256, 512)
    dtype: Any = jnp.float32

    def setup(self):
        self.local_vae = ConvVAE(latent_dim=self.latent_dim,
                                 seq_len=self.seq_len,
                                 hidden_dims=self.hidden_dims,
                                 dtype=self.dtype, name="local")
        self.global_vae = ConvVAE(latent_dim=self.latent_dim,
                                  seq_len=self.seq_len,
                                  hidden_dims=self.hidden_dims,
                                  dtype=self.dtype, name="global")

    def __call__(self, local_pose: jnp.ndarray, cameras: jnp.ndarray,
                 train: bool = False, rng: jax.Array | None = None
                 ) -> JointVAEOutput:
        """local_pose: (B, T, 45) camera-frame windows;
        cameras: (B, T, 4, 4) cam->world matrices."""
        b, t = local_pose.shape[0], local_pose.shape[1]
        rngs = (None, None) if rng is None else tuple(
            jax.random.split(rng))

        lmu, llv = self.local_vae.encode(local_pose, train)
        lz = reparameterize(lmu, llv, rngs[0])
        local_recon = self.local_vae.decode(lz, train)

        rel_global = relative_global_pose(
            local_pose.reshape(b, t, 15, 3), cameras).reshape(b, t, 45)
        gmu, glv = self.global_vae.encode(rel_global, train)
        gz = reparameterize(gmu, glv, rngs[1])
        global_recon = self.global_vae.decode(gz, train)

        lifted = relative_global_pose(
            local_recon.reshape(b, t, 15, 3).astype(jnp.float32),
            cameras).reshape(b, t, 45)

        return JointVAEOutput(local_recon, global_recon, lmu, llv,
                              gmu, glv, lifted)

    def branch_variables(self, variables):
        """Split joint variables into the two per-branch variable dicts the
        optimizer consumes."""
        out = []
        for name in ("local", "global"):
            out.append({
                "params": variables["params"][name],
                "batch_stats": variables["batch_stats"][name],
            })
        return tuple(out)


def joint_loss(out: JointVAEOutput, local_pose: jnp.ndarray,
               cameras: jnp.ndarray, kld_weight: float,
               consistency_weight: float = 1.0):
    """local ELBO + global ELBO + geometric consistency."""
    b, t = local_pose.shape[0], local_pose.shape[1]
    rel_global = relative_global_pose(
        local_pose.reshape(b, t, 15, 3), cameras).reshape(b, t, 45)

    l_loss, l_recon, l_kld = vae_loss(out.local_recon, local_pose,
                                      out.local_mu, out.local_log_var,
                                      kld_weight)
    g_loss, g_recon, g_kld = vae_loss(out.global_recon, rel_global,
                                      out.global_mu, out.global_log_var,
                                      kld_weight)
    consistency = jnp.mean(jnp.square(out.lifted_local - out.global_recon))
    total = l_loss + g_loss + consistency_weight * consistency
    return total, {"local_recon": l_recon, "global_recon": g_recon,
                   "local_kld": l_kld, "global_kld": g_kld,
                   "consistency": consistency}


def split_branches(model: JointLocalGlobalVAE, variables):
    """Standalone helper mirroring `JointLocalGlobalVAE.branch_variables`
    for use without a bound module."""
    return (
        {"params": variables["params"]["local"],
         "batch_stats": variables["batch_stats"]["local"]},
        {"params": variables["params"]["global"],
         "batch_stats": variables["batch_stats"]["global"]},
    )
