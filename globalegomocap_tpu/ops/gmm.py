"""Gaussian-mixture pose prior scoring in jnp.

Rebuild of the reference's torch GMM wrappers
(reference: utils/pytorch_gmm_from_scipy.py:10-74, utils/pytorch_gmm.py),
which port a pickled sklearn `GaussianMixture` to the device for
log-likelihood scoring.  Supports 'full' and 'diag' covariances.

Note: the reference's `score_samples` omits the mixture log-weights from
the logsumexp (pytorch_gmm_from_scipy.py:38-40), which only matches sklearn
for a single component.  `include_weights=True` (default) gives the correct
sklearn-equivalent score; pass False for bug-compatibility.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class GMMParams:
    means: jnp.ndarray                 # (K, D)
    precisions_cholesky: jnp.ndarray   # full: (K, D, D); diag: (K, D)
    log_weights: jnp.ndarray           # (K,)
    covariance_type: str = "full"      # static


def from_sklearn(gmm) -> GMMParams:
    """Build from a fitted (or unpickled) sklearn GaussianMixture."""
    return GMMParams(
        means=jnp.asarray(gmm.means_, dtype=jnp.float32),
        precisions_cholesky=jnp.asarray(gmm.precisions_cholesky_,
                                        dtype=jnp.float32),
        log_weights=jnp.asarray(np.log(gmm.weights_), dtype=jnp.float32),
        covariance_type=gmm.covariance_type,
    )


def load_sklearn_pickle(path: str) -> GMMParams:
    import pickle
    with open(path, "rb") as f:
        return from_sklearn(pickle.load(f))


def _log_det_cholesky(params: GMMParams, n_features: int) -> jnp.ndarray:
    chol = params.precisions_cholesky
    if params.covariance_type == "full":
        diag = jnp.diagonal(chol, axis1=-2, axis2=-1)
        return jnp.sum(jnp.log(diag), axis=-1)
    return jnp.sum(jnp.log(chol), axis=-1)


def log_prob_components(params: GMMParams, X: jnp.ndarray) -> jnp.ndarray:
    """(N, D) -> (N, K) per-component log densities (sklearn's
    `_estimate_log_gaussian_prob`)."""
    n_features = X.shape[-1]
    log_det = _log_det_cholesky(params, n_features)
    if params.covariance_type == "full":
        # y_k = X @ L_k - mu_k @ L_k
        y = jnp.einsum("nd,kde->nke", X, params.precisions_cholesky) - \
            jnp.einsum("kd,kde->ke", params.means,
                       params.precisions_cholesky)[None]
        maha = jnp.sum(jnp.square(y), axis=-1)
    else:
        prec = jnp.square(params.precisions_cholesky)  # (K, D)
        maha = (jnp.sum(params.means ** 2 * prec, 1)[None]
                - 2.0 * X @ (params.means * prec).T
                + X ** 2 @ prec.T)
    return -0.5 * (n_features * jnp.log(2 * jnp.pi) + maha) + log_det


def score_samples(params: GMMParams, X: jnp.ndarray,
                  include_weights: bool = True) -> jnp.ndarray:
    """(N, D) -> (N,) log p(x) under the mixture."""
    lp = log_prob_components(params, X)
    if include_weights:
        lp = lp + params.log_weights[None]
    return jax.scipy.special.logsumexp(lp, axis=1)
