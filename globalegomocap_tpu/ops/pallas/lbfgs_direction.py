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


LANE_BLOCK = 8  # lanes per kernel instance in the batched rule


def _dir_kernel_block(g_ref, s_ref, y_ref, rho_ref, valid_ref, out_ref):
    """Lane-blocked two-loop: all arrays carry a leading (LB,) lane axis,
    so every dot is a (LB, d) reduction — proper VPU shapes, unlike the
    one-lane-per-instance variant vmap produces (measured 30% SLOWER
    than XLA, perf_levers_r2d.json)."""
    m = s_ref.shape[1]
    g = g_ref[...]            # (LB, d)
    s = s_ref[...]            # (LB, m, d)
    y = y_ref[...]            # (LB, m, d)
    rho = rho_ref[...]        # (LB, m)
    vmask = valid_ref[...]    # (LB, m)

    q = g
    alphas = [None] * m
    for i in range(m - 1, -1, -1):
        a = vmask[:, i] * rho[:, i] * jnp.sum(s[:, i, :] * q, axis=-1)
        q = q - a[:, None] * y[:, i, :]
        alphas[i] = a

    sy = jnp.sum(s[:, m - 1, :] * y[:, m - 1, :], axis=-1)
    yy = jnp.sum(y[:, m - 1, :] * y[:, m - 1, :], axis=-1)
    gamma = jnp.where((vmask[:, m - 1] > 0) & (yy > 0),
                      sy / jnp.where(yy > 0, yy, 1.0), 1.0)
    r = gamma[:, None] * q

    for i in range(m):
        b = rho[:, i] * jnp.sum(y[:, i, :] * r, axis=-1)
        r = r + (vmask[:, i] * (alphas[i] - b))[:, None] * s[:, i, :]

    out_ref[...] = -r


def lbfgs_direction_pallas_batched(grad, s_hist, y_hist, rho_hist,
                                   valid) -> jnp.ndarray:
    """Natively batched fused two-loop: grad (B, d), s/y (B, m, d),
    rho/valid (B, m) -> (B, d).  Grid over lane blocks of LANE_BLOCK;
    B is padded up to a block multiple (padded lanes compute garbage
    that is sliced off)."""
    b, m, d = s_hist.shape
    dtype = grad.dtype
    lb = min(LANE_BLOCK, b)
    pad = (-b) % lb
    if pad:
        grad = jnp.concatenate([grad, jnp.zeros((pad, d), dtype)])
        s_hist = jnp.concatenate(
            [s_hist, jnp.zeros((pad, m, d), s_hist.dtype)])
        y_hist = jnp.concatenate(
            [y_hist, jnp.zeros((pad, m, d), y_hist.dtype)])
        rho_hist = jnp.concatenate(
            [rho_hist, jnp.zeros((pad, m), rho_hist.dtype)])
        valid = jnp.concatenate([valid, jnp.zeros((pad, m), valid.dtype)])
    bp = b + pad
    out = pl.pallas_call(
        _dir_kernel_block,
        grid=(bp // lb,),
        in_specs=[
            pl.BlockSpec((lb, d), lambda i: (i, 0)),
            pl.BlockSpec((lb, m, d), lambda i: (i, 0, 0)),
            pl.BlockSpec((lb, m, d), lambda i: (i, 0, 0)),
            pl.BlockSpec((lb, m), lambda i: (i, 0)),
            pl.BlockSpec((lb, m), lambda i: (i, 0)),
        ],
        out_specs=pl.BlockSpec((lb, d), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((bp, d), dtype),
        interpret=_interpret(),
    )(grad, s_hist, y_hist, rho_hist.astype(dtype), valid.astype(dtype))
    return out[:b]


@jax.custom_batching.custom_vmap
def lbfgs_direction_pallas(grad: jnp.ndarray, s_hist: jnp.ndarray,
                           y_hist: jnp.ndarray, rho_hist: jnp.ndarray,
                           valid: jnp.ndarray) -> jnp.ndarray:
    """Drop-in replacement for `_two_loop_direction` (same signature and
    masking semantics; histories ordered oldest..newest).

    grad (d,), s_hist/y_hist (m, d), rho_hist (m,), valid (m,) bool.
    Returns the descent direction (d,).

    Under `jax.vmap` (the solver's production use) a custom batching rule
    dispatches to the LANE-BLOCKED kernel instead of the one-lane-per-
    grid-instance batching vmap would derive.
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


@lbfgs_direction_pallas.def_vmap
def _direction_vmap_rule(axis_size, in_batched, grad, s_hist, y_hist,
                         rho_hist, valid):
    def bcast(x, batched, extra_dims):
        if batched:
            return x
        return jnp.broadcast_to(x[None], (axis_size,) + x.shape)
    g = bcast(grad, in_batched[0], 1)
    s = bcast(s_hist, in_batched[1], 2)
    y = bcast(y_hist, in_batched[2], 2)
    rho = bcast(rho_hist, in_batched[3], 1)
    v = bcast(valid, in_batched[4], 1)
    return lbfgs_direction_pallas_batched(g, s, y, rho, v), True
