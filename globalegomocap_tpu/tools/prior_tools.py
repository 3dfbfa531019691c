"""Prior introspection tools: sampling, latent interpolation, latent stats.

Rebuilds of the reference's model tools — `networks/sample.py` (decode
N(0,1) latents to motion + meshes), `networks/interpolant.py:94-138` (linear
latent interpolation between two windows), and `networks/get_latent.py`
(latent statistics ||mu||², ||std-1||²) — on the Flax prior, with the
bit-rotted import paths of the originals replaced by working APIs.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

from globalegomocap_tpu.models.conv_vae import ConvVAE


def sample_motions(model: ConvVAE, variables, num_samples: int,
                   seed: int = 0) -> np.ndarray:
    """Decode N(0, I) latents -> (num_samples, T, 15, 3) motion windows
    (reference: sample.py:32-45)."""
    z = jax.random.normal(jax.random.PRNGKey(seed),
                          (num_samples, model.latent_dim))
    out = model.apply(variables, z, False, method=ConvVAE.decode)
    return np.asarray(out.reshape(num_samples, model.seq_len, 15, 3))


def export_sample_meshes(model: ConvVAE, variables, out_dir: str,
                         num_samples: int = 10, seed: int = 0):
    """Sample and write each window as a directory of PLY skeleton meshes
    (the reference's sample.py output format)."""
    from globalegomocap_tpu.tools.ply import save_skeleton_sequence
    motions = sample_motions(model, variables, num_samples, seed)
    for i, motion in enumerate(motions):
        save_skeleton_sequence(motion, os.path.join(out_dir, f"sample_{i}"))
    return motions


def interpolate_latents(model: ConvVAE, variables, window_a: np.ndarray,
                        window_b: np.ndarray, steps: int = 4) -> np.ndarray:
    """Encode two (T, 45) windows, linearly interpolate their latent means
    in `steps` interior points, decode all of them.

    Returns (steps + 2, T, 15, 3): endpoints' reconstructions plus the
    interpolants (reference: interpolant.py:94-138, which uses 4 interior
    steps of a 5-way split)."""
    batch = jnp.stack([jnp.asarray(window_a), jnp.asarray(window_b)])
    mu, _ = model.apply(variables, batch, False, method=ConvVAE.encode)
    za, zb = mu[0], mu[1]
    alphas = jnp.linspace(0.0, 1.0, steps + 2)
    zs = za[None] + alphas[:, None] * (zb - za)[None]
    out = model.apply(variables, zs, False, method=ConvVAE.decode)
    return np.asarray(out.reshape(steps + 2, model.seq_len, 15, 3))


def latent_statistics(model: ConvVAE, variables,
                      windows: np.ndarray) -> dict:
    """||mu||² and ||std - 1||² statistics over a batch of (T, 45) windows
    (reference: get_latent.py:46-66) — how far the data sits from the
    prior's N(0, I)."""
    x = jnp.asarray(windows)
    mu, log_var = model.apply(variables, x, False, method=ConvVAE.encode)
    std = jnp.exp(0.5 * log_var)
    return {
        "mu_sq_norm": np.asarray(jnp.sum(jnp.square(mu), axis=1)),
        "std_dist": np.asarray(jnp.sum(jnp.square(std - 1.0), axis=1)),
        "mean_mu_sq_norm": float(jnp.mean(jnp.sum(jnp.square(mu), axis=1))),
        "mean_std_dist": float(jnp.mean(jnp.sum(jnp.square(std - 1.0),
                                                axis=1))),
    }
