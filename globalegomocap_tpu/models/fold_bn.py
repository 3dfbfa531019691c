"""Fold eval-mode BatchNorm into the adjacent convolution weights.

At optimization time the priors run with frozen running statistics
(use_running_average=True), so each BN is a fixed per-channel affine map
that folds EXACTLY into the preceding conv/dense:

    y = gamma * (W x + b - mu) / sqrt(var + eps) + beta
      = (gamma/sqrt(var+eps)) W x + (gamma (b - mu)/sqrt(var+eps) + beta)

Folding removes one normalize op per block from every objective evaluation
of the latent solver — and the solver's cost is op-latency-bound
(solver_floor.json), so fewer ops per eval is the lever that matters.

The folded variables keep the same tree structure (BN params become the
identity), so they drop into the unchanged ConvVAE.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-5


def _fold_block(block_params, block_stats):
    """Fold one ConvBNAct block; returns (params, stats) with BN = id."""
    kernel = block_params["conv"]["kernel"]      # (k, in, out)
    bias = block_params["conv"]["bias"]          # (out,)
    gamma = block_params["bn"]["scale"]
    beta = block_params["bn"]["bias"]
    mu = block_stats["bn"]["mean"]
    var = block_stats["bn"]["var"]

    inv = gamma / jnp.sqrt(var + _EPS)           # (out,)
    new_kernel = kernel * inv                    # broadcast over out axis
    new_bias = (bias - mu) * inv + beta
    return {"conv": {"kernel": new_kernel, "bias": new_bias}}


def fold_batchnorm(variables):
    """Fold every ConvBNAct block's BN of a ConvVAE variable tree and DROP
    the BN entries — the result pairs with a `ConvVAE(use_bn=False)` model
    (same names, BN submodules structurally absent).

    Only the conv blocks carry BN (enc_*, dec_*, final_block); the dense
    heads have none.  Exact for eval-mode inference; do NOT train with
    folded variables."""
    params = dict(variables["params"])
    stats = dict(variables.get("batch_stats", {}))
    out_params = {}
    for name in params:
        if name in stats and "bn" in stats[name]:
            out_params[name] = _fold_block(params[name], stats[name])
        else:
            out_params[name] = params[name]
    return {"params": out_params, "batch_stats": {}}
