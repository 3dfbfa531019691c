"""Fused L-BFGS two-loop recursion as ONE Pallas kernel.

The fixed solver's direction computation (`optimize.lbfgs._two_loop_direction`,
the TPU rebuild of the torch-C++ L-BFGS direction step the reference relies
on via `torch.optim.LBFGS`, reference: optimizer.py:261-262) lowers under
`vmap` to ~2*m sequential batched dot/axpy kernels per iteration — at the
production batch (240 lanes, m=10, d=2048) that is 0.614 ms of every
1.73 ms solver iteration spent on kernel-launch latency for trivially
small reductions (intercept_probe.json).

Here the WHOLE recursion runs inside one kernel instance per lane: the
(m, d) S/Y histories are pulled into VMEM once (~180 KB/lane at m=10,
d=2048, well under the 16 MB scoped budget) and all 2m dot/axpy steps are
VMEM-resident loop iterations — one kernel launch instead of ~40.  The
math is bit-for-bit the two-loop recursion including the `valid` slot
masking and the gamma = s·y/y·y initial Hessian scaling.

Used under `jax.vmap` (the solver is written per-lane): the Pallas
batching rule turns the lane axis into the kernel grid.  Falls back to
interpreter mode off-TPU so CPU tests exercise the same code path.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _dir_kernel(g_ref, s_ref, y_ref, rho_ref, valid_ref, out_ref):
    m = s_ref.shape[0]
    g = g_ref[...]            # (1, d)
    s = s_ref[...]            # (m, d)
    y = y_ref[...]            # (m, d)
    rho = rho_ref[...]        # (1, m)
    vmask = valid_ref[...]    # (1, m) 0/1 in the compute dtype

    # backward pass, newest (m-1) -> oldest (0); static unroll over m
    q = g
    alphas = [None] * m
    for i in range(m - 1, -1, -1):
        a = vmask[0, i] * rho[0, i] * jnp.sum(s[i] * q[0])
        q = q - a * y[i][None]
        alphas[i] = a

    # initial Hessian scale from the newest pair
    sy = jnp.sum(s[m - 1] * y[m - 1])
    yy = jnp.sum(y[m - 1] * y[m - 1])
    gamma = jnp.where((vmask[0, m - 1] > 0) & (yy > 0), sy / yy, 1.0)
    r = gamma * q

    # forward pass, oldest -> newest
    for i in range(m):
        b = rho[0, i] * jnp.sum(y[i] * r[0])
        r = r + (vmask[0, i] * (alphas[i] - b)) * s[i][None]

    out_ref[...] = -r


def lbfgs_direction_pallas(grad: jnp.ndarray, s_hist: jnp.ndarray,
                           y_hist: jnp.ndarray, rho_hist: jnp.ndarray,
                           valid: jnp.ndarray) -> jnp.ndarray:
    """Drop-in replacement for `_two_loop_direction` (same signature and
    masking semantics; histories ordered oldest..newest).

    grad (d,), s_hist/y_hist (m, d), rho_hist (m,), valid (m,) bool.
    Returns the descent direction (d,).
    """
    m, d = s_hist.shape
    dtype = grad.dtype
    out = pl.pallas_call(
        _dir_kernel,
        out_shape=jax.ShapeDtypeStruct((1, d), dtype),
        interpret=_interpret(),
    )(grad[None], s_hist, y_hist, rho_hist[None].astype(dtype),
      valid[None].astype(dtype))
    return out[0]
