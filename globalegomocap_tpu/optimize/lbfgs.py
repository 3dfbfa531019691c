"""Batched L-BFGS with strong-Wolfe line search, jit/vmap-native.

The reference relies on torch.optim.LBFGS (C++/ATen) with
lr=2, max_iter=25, tolerance_change=1e-6, line_search_fn='strong_wolfe'
(reference: optimizer.py:261-270).  TPU-native rebuild: the full optimizer —
two-loop recursion over a fixed-size circular history, cubic-interpolating
bracket+zoom strong-Wolfe line search, and the same convergence rules — is
expressed with `lax.while_loop` over fixed-shape state, so the whole solver
jit-compiles once and `vmap`s across thousands of independent window
problems in a single device launch (JAX's while-loop batching keeps
converged lanes frozen while the rest iterate).

Also provides `adam_minimize`, a fixed-step fallback with trivially static
control flow.
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp


class LBFGSResult(NamedTuple):
    x: jnp.ndarray
    f: jnp.ndarray
    grad_norm: jnp.ndarray
    n_iter: jnp.ndarray
    n_evals: jnp.ndarray


def _cubic_minimizer(x1, f1, g1, x2, f2, g2, lo, hi):
    """Minimizer of the cubic Hermite interpolant through (x1,f1,g1),
    (x2,f2,g2), safeguarded to [lo, hi]; falls back to bisection when the
    interpolation is degenerate (coincident points, non-finite values)."""
    dx = x1 - x2
    safe_dx = jnp.where(jnp.abs(dx) > 1e-20, dx, 1.0)
    d1 = g1 + g2 - 3.0 * (f1 - f2) / safe_dx
    d2_sq = d1 * d1 - g1 * g2
    ok = (d2_sq >= 0.0) & (jnp.abs(dx) > 1e-20)
    d2 = jnp.sqrt(jnp.maximum(d2_sq, 0.0))
    denom = g2 - g1 + 2.0 * d2
    safe_denom = jnp.where(jnp.abs(denom) > 1e-20, denom, 1.0)
    cand = x2 - (x2 - x1) * ((g2 + d2 - d1) / safe_denom)
    ok = ok & (jnp.abs(denom) > 1e-20) & jnp.isfinite(cand)
    cand = jnp.where(ok, cand, 0.5 * (lo + hi))
    return jnp.clip(cand, lo, hi)


def _two_loop_direction(grad, s_hist, y_hist, rho_hist, valid):
    """L-BFGS two-loop recursion over an (m, d) circular history.

    valid: (m,) bool mask of filled slots, ordered oldest..newest by the
    caller (we pass history already rolled so index m-1 is newest).

    Deliberately a lax.fori_loop: measured on v5e at the production batch,
    both the unrolled straight-line variant (902 windows/s) and the
    compact-representation reformulation (865) are SLOWER than this loop
    (1122) — the device-side loop is cheaper than the bloated unrolled
    program or batched triangular solves (perf_levers_r1.json).
    """
    m = s_hist.shape[0]

    def backward(i, carry):
        q, alphas = carry
        idx = m - 1 - i  # newest first
        a = rho_hist[idx] * jnp.dot(s_hist[idx], q)
        a = jnp.where(valid[idx], a, 0.0)
        q = q - a * y_hist[idx]
        return q, alphas.at[idx].set(a)

    q, alphas = jax.lax.fori_loop(
        0, m, backward, (grad, jnp.zeros((m,), grad.dtype)))

    # initial Hessian scaling gamma = s·y / y·y of the newest pair
    sy = jnp.sum(s_hist[m - 1] * y_hist[m - 1])
    yy = jnp.sum(y_hist[m - 1] * y_hist[m - 1])
    gamma = jnp.where(valid[m - 1] & (yy > 0), sy / yy, 1.0)
    r = gamma * q

    def forward(i, r):
        b = rho_hist[i] * jnp.dot(y_hist[i], r)
        upd = s_hist[i] * (alphas[i] - b)
        return r + jnp.where(valid[i], upd, 0.0)

    r = jax.lax.fori_loop(0, m, forward, r)
    return -r


def _two_loop_direction_circular(grad, s_hist, y_hist, rho_hist, valid,
                                 ptr):
    """Two-loop recursion over a pointer-indexed circular history.

    Identical math to `_two_loop_direction` but the history buffers are
    never rotated: `ptr` is the next write slot, so the newest pair lives
    at (ptr-1) mod m and iteration order is recovered with modular
    indexing.  This turns the per-iteration history update from three
    O(m*d) roll copies into one O(d) dynamic row write (see
    `lbfgs_minimize_fixed(circular_history=True)`).  Invalid (unwritten)
    slots are masked by `valid` exactly as in the rolled variant.
    """
    m = s_hist.shape[0]

    def backward(i, carry):
        q, alphas = carry
        idx = (ptr - 1 - i) % m  # newest first
        a = rho_hist[idx] * jnp.dot(s_hist[idx], q)
        a = jnp.where(valid[idx], a, 0.0)
        q = q - a * y_hist[idx]
        return q, alphas.at[idx].set(a)

    q, alphas = jax.lax.fori_loop(
        0, m, backward, (grad, jnp.zeros((m,), grad.dtype)))

    newest = (ptr - 1) % m
    sy = jnp.sum(s_hist[newest] * y_hist[newest])
    yy = jnp.sum(y_hist[newest] * y_hist[newest])
    gamma = jnp.where(valid[newest] & (yy > 0), sy / yy, 1.0)
    r = gamma * q

    def forward(i, r):
        idx = (ptr + i) % m  # oldest first (invalid slots masked)
        b = rho_hist[idx] * jnp.dot(y_hist[idx], r)
        upd = s_hist[idx] * (alphas[idx] - b)
        return r + jnp.where(valid[idx], upd, 0.0)

    r = jax.lax.fori_loop(0, m, forward, r)
    return -r


def _compact_direction(grad, s_hist, y_hist, valid):
    """L-BFGS direction via the compact representation (Byrd, Nocedal &
    Schnabel 1994) — algebraically identical to the two-loop recursion but
    expressed as a handful of batched matmuls and two (m, m) triangular
    solves instead of 2m SEQUENTIAL fori_loop steps (tests assert equality
    with `_two_loop_direction`).

    MEASURED NEGATIVE on v5e at batch 240 (865 vs 1122 windows/s,
    perf_levers_r1.json): the batched (m, m) triangular solves lower
    poorly on TPU and cost more than the two-loop's tiny kernels save.
    Kept as an option for hardware where batched solves are cheap.

    With H0 = gamma*I:
        H g = gamma*g + [S  gamma*Y] W [S^T g; gamma*Y^T g]
        W   = [[R^-T (D + gamma*Y^T Y) R^-1, -R^-T], [-R^-1, 0]]
    where R = upper-triangular(S^T Y), D = diag(S^T Y).  Invalid history
    slots carry zero s/y rows; their R/D diagonal is patched to 1 so the
    solves stay well-posed while their contributions vanish.
    """
    from jax.scipy.linalg import solve_triangular

    dtype = grad.dtype
    v = valid.astype(dtype)
    s = s_hist * v[:, None]
    y = y_hist * v[:, None]

    sy = s @ y.T                                   # (m, m)  s_i . y_j
    d = jnp.diag(sy)
    r = jnp.triu(sy) + jnp.diag(jnp.where(valid, 0.0, 1.0))
    yy = y @ y.T

    # gamma = s.y / y.y of the newest pair (slot m-1 by construction)
    gamma = jnp.where(valid[-1] & (yy[-1, -1] > 0),
                      sy[-1, -1] / yy[-1, -1], 1.0)

    a = s @ grad                                   # (m,)
    b = y @ grad
    p1 = solve_triangular(r, a, lower=False)       # R^-1 a
    q = (jnp.where(valid, d, 1.0) * p1) + gamma * (yy @ p1)
    alpha = solve_triangular(r.T, q - gamma * b, lower=True)   # R^-T (...)
    beta = -p1
    hg = gamma * grad + alpha @ s + gamma * (beta @ y)
    return -hg


class _LineSearchState(NamedTuple):
    stage: jnp.ndarray        # 0 bracket, 1 zoom, 2 done
    nev: jnp.ndarray
    t: jnp.ndarray
    t_prev: jnp.ndarray
    f_prev: jnp.ndarray
    dphi_prev: jnp.ndarray
    # bracket endpoints (lo is the side with lower f)
    t_lo: jnp.ndarray
    f_lo: jnp.ndarray
    d_lo: jnp.ndarray
    t_hi: jnp.ndarray
    f_hi: jnp.ndarray
    d_hi: jnp.ndarray
    # accepted point
    t_star: jnp.ndarray


def _strong_wolfe(value_and_grad: Callable, x: jnp.ndarray, d: jnp.ndarray,
                  t0: jnp.ndarray, f0: jnp.ndarray, g0: jnp.ndarray,
                  c1: float = 1e-4, c2: float = 0.9, max_evals: int = 25):
    """Strong-Wolfe line search along direction d from x.

    Returns (t, f_t, g_t_fullgrad, n_evals).  Bounded by `max_evals`
    objective evaluations; if no Wolfe point is found the best seen point is
    returned (matching torch's pragmatic fallback).
    """
    dphi0 = jnp.dot(g0, d)

    def phi(t):
        f, g = value_and_grad(x + t * d)
        return f, g, jnp.dot(g, d)

    init = _LineSearchState(
        stage=jnp.asarray(0), nev=jnp.asarray(0),
        t=t0, t_prev=jnp.asarray(0.0, x.dtype),
        f_prev=f0, dphi_prev=dphi0,
        t_lo=jnp.asarray(0.0, x.dtype), f_lo=f0, d_lo=dphi0,
        t_hi=jnp.asarray(0.0, x.dtype), f_hi=f0, d_hi=dphi0,
        t_star=jnp.asarray(0.0, x.dtype),
    )

    def cond(s: _LineSearchState):
        return (s.stage < 2) & (s.nev < max_evals)

    def body(s: _LineSearchState):
        f_t, g_t, dphi_t = phi(s.t)
        nev = s.nev + 1

        def bracket_step(s):
            # a non-finite evaluation means the step overshot: treat it as
            # an Armijo failure so the search brackets and shrinks instead
            # of expanding further (NaN comparisons would otherwise all be
            # False and the expansion would diverge).
            bad = ~jnp.isfinite(f_t)
            armijo_fail = bad | (f_t > f0 + c1 * s.t * dphi0) | \
                          ((nev > 1) & (f_t >= s.f_prev))
            wolfe_ok = jnp.abs(dphi_t) <= -c2 * dphi0
            ascending = dphi_t >= 0.0

            # case 1: bracket [prev, t]
            to_zoom1 = armijo_fail
            # case 2: accept
            accept = (~armijo_fail) & wolfe_ok
            # case 3: bracket [t, prev]
            to_zoom2 = (~armijo_fail) & (~wolfe_ok) & ascending

            # expansion: next trial by extrapolating cubic, capped at 10t
            lo_b = s.t + 0.01 * (s.t - s.t_prev)
            hi_b = s.t * 10.0
            t_next = _cubic_minimizer(s.t_prev, s.f_prev, s.dphi_prev,
                                      s.t, f_t, dphi_t, lo_b, hi_b)

            stage = jnp.where(accept, 2, jnp.where(to_zoom1 | to_zoom2, 1, 0))
            # zoom bracket assignment
            t_lo = jnp.where(to_zoom1, s.t_prev, jnp.where(to_zoom2, s.t, s.t_lo))
            f_lo = jnp.where(to_zoom1, s.f_prev, jnp.where(to_zoom2, f_t, s.f_lo))
            d_lo = jnp.where(to_zoom1, s.dphi_prev, jnp.where(to_zoom2, dphi_t, s.d_lo))
            t_hi = jnp.where(to_zoom1, s.t, jnp.where(to_zoom2, s.t_prev, s.t_hi))
            f_hi = jnp.where(to_zoom1, f_t, jnp.where(to_zoom2, s.f_prev, s.f_hi))
            d_hi = jnp.where(to_zoom1, dphi_t, jnp.where(to_zoom2, s.dphi_prev, s.d_hi))

            # first zoom trial: a cubic candidate strictly inside the bracket
            zb_lo = jnp.minimum(t_lo, t_hi)
            zb_hi = jnp.maximum(t_lo, t_hi)
            zw = zb_hi - zb_lo
            t_zoom = _cubic_minimizer(t_lo, f_lo, d_lo, t_hi, f_hi, d_hi,
                                      zb_lo + 0.1 * zw, zb_hi - 0.1 * zw)

            return s._replace(
                stage=stage, nev=nev,
                t=jnp.where(stage == 0, t_next,
                            jnp.where(stage == 1, t_zoom, s.t)),
                t_prev=jnp.where(stage == 0, s.t, s.t_prev),
                f_prev=jnp.where(stage == 0, f_t, s.f_prev),
                dphi_prev=jnp.where(stage == 0, dphi_t, s.dphi_prev),
                t_lo=t_lo, f_lo=f_lo, d_lo=d_lo,
                t_hi=t_hi, f_hi=f_hi, d_hi=d_hi,
                t_star=jnp.where(accept, s.t, s.t_star),
            )

        def zoom_step(s):
            # evaluated point is s.t (set when entering/continuing zoom)
            armijo_fail = (~jnp.isfinite(f_t)) | \
                (f_t > f0 + c1 * s.t * dphi0) | (f_t >= s.f_lo)
            wolfe_ok = jnp.abs(dphi_t) <= -c2 * dphi0
            accept = (~armijo_fail) & wolfe_ok
            # standard zoom bracket update (Nocedal & Wright alg. 3.6):
            # if armijo fails: hi = t
            # else: if dphi_t*(t_hi - t_lo) >= 0: hi = lo; then lo = t
            new_hi_t = jnp.where(armijo_fail, s.t,
                                 jnp.where(dphi_t * (s.t_hi - s.t_lo) >= 0,
                                           s.t_lo, s.t_hi))
            new_hi_f = jnp.where(armijo_fail, f_t,
                                 jnp.where(dphi_t * (s.t_hi - s.t_lo) >= 0,
                                           s.f_lo, s.f_hi))
            new_hi_d = jnp.where(armijo_fail, dphi_t,
                                 jnp.where(dphi_t * (s.t_hi - s.t_lo) >= 0,
                                           s.d_lo, s.d_hi))
            new_lo_t = jnp.where(armijo_fail, s.t_lo, s.t)
            new_lo_f = jnp.where(armijo_fail, s.f_lo, f_t)
            new_lo_d = jnp.where(armijo_fail, s.d_lo, dphi_t)

            # next trial point inside the new bracket
            lo_b = jnp.minimum(new_lo_t, new_hi_t)
            hi_b = jnp.maximum(new_lo_t, new_hi_t)
            width = hi_b - lo_b
            t_next = _cubic_minimizer(new_lo_t, new_lo_f, new_lo_d,
                                      new_hi_t, new_hi_f, new_hi_d,
                                      lo_b + 0.1 * width, hi_b - 0.1 * width)
            # bracket collapse => accept best endpoint
            collapsed = width <= 1e-9 * jnp.maximum(1.0, jnp.abs(hi_b))

            stage = jnp.where(accept | collapsed, 2, 1)
            return s._replace(
                stage=stage, nev=nev,
                t=jnp.where(stage == 1, t_next, s.t),
                t_lo=new_lo_t, f_lo=new_lo_f, d_lo=new_lo_d,
                t_hi=new_hi_t, f_hi=new_hi_f, d_hi=new_hi_d,
                t_star=jnp.where(accept, s.t,
                                 jnp.where(collapsed, new_lo_t, s.t_star)),
            )

        return jax.lax.cond(s.stage == 0, bracket_step, zoom_step, s)

    out = jax.lax.while_loop(cond, body, init)

    # Final evaluation at the accepted step (guarantees the returned f/grad
    # belong to the returned point).  When the eval budget ran out without a
    # Wolfe point, fall back to the best bracketed low point if it improves
    # on f0, else stay at t=0 (a zero step makes the outer loop's
    # tolerance_change rule fire, matching torch's conservative behaviour).
    unfinished = out.stage < 2
    t_star = jnp.where(
        unfinished,
        jnp.where(out.f_lo < f0, out.t_lo, jnp.asarray(0.0, x.dtype)),
        out.t_star)
    f_star, g_star = value_and_grad(x + t_star * d)
    return t_star, f_star, g_star, out.nev + 1


class _LBFGSState(NamedTuple):
    x: jnp.ndarray
    f: jnp.ndarray
    g: jnp.ndarray
    d: jnp.ndarray
    s_hist: jnp.ndarray
    y_hist: jnp.ndarray
    rho_hist: jnp.ndarray
    valid: jnp.ndarray
    n_iter: jnp.ndarray
    n_evals: jnp.ndarray
    done: jnp.ndarray


def lbfgs_minimize(loss_fn: Callable[[jnp.ndarray], jnp.ndarray],
                   x0: jnp.ndarray,
                   max_iter: int = 25,
                   history_size: int = 25,
                   lr: float = 2.0,
                   tolerance_change: float = 1e-6,
                   tolerance_grad: float = 1e-7,
                   c1: float = 1e-4,
                   c2: float = 0.9,
                   max_ls_evals: int = 25) -> LBFGSResult:
    """Minimize `loss_fn` from `x0` (a flat (d,) vector) with L-BFGS +
    strong-Wolfe line search.

    Hyperparameter defaults replicate the reference's torch configuration
    (optimizer.py:261-262): lr=2, max_iter=25, tolerance_change=1e-6,
    strong-Wolfe.  Convergence rules: max|g| <= tolerance_grad, or
    max|t·d| <= tolerance_change, or |Δf| < tolerance_change.

    vmap over a batch of problems:  `jax.vmap(lambda x: lbfgs_minimize(f, x))`.
    """
    value_and_grad = jax.value_and_grad(loss_fn)
    dim = x0.shape[-1]
    dtype = x0.dtype

    f0, g0 = value_and_grad(x0)

    init = _LBFGSState(
        x=x0, f=f0, g=g0, d=-g0,
        s_hist=jnp.zeros((history_size, dim), dtype),
        y_hist=jnp.zeros((history_size, dim), dtype),
        rho_hist=jnp.zeros((history_size,), dtype),
        valid=jnp.zeros((history_size,), bool),
        n_iter=jnp.asarray(0), n_evals=jnp.asarray(1),
        done=jnp.max(jnp.abs(g0)) <= tolerance_grad,
    )

    def cond(s: _LBFGSState):
        return (~s.done) & (s.n_iter < max_iter)

    def body(s: _LBFGSState):
        # step length init: torch uses min(1, 1/|g|_1)*lr on the first
        # iteration, lr afterwards.
        t0 = jnp.where(
            s.n_iter == 0,
            jnp.minimum(1.0, 1.0 / jnp.sum(jnp.abs(s.g))) * lr,
            jnp.asarray(lr, dtype))

        t, f_new, g_new, nev = _strong_wolfe(
            value_and_grad, s.x, s.d, t0, s.f, s.g, c1, c2, max_ls_evals)

        step = t * s.d
        x_new = s.x + step
        y = g_new - s.g
        ys = jnp.dot(y, step)

        # history update (skip near-singular curvature pairs, like torch)
        do_update = ys > 1e-10
        s_hist = jnp.where(do_update,
                           jnp.roll(s.s_hist, -1, axis=0).at[-1].set(step),
                           s.s_hist)
        y_hist = jnp.where(do_update,
                           jnp.roll(s.y_hist, -1, axis=0).at[-1].set(y),
                           s.y_hist)
        rho_hist = jnp.where(do_update,
                             jnp.roll(s.rho_hist, -1).at[-1].set(1.0 / ys),
                             s.rho_hist)
        valid = jnp.where(do_update,
                          jnp.roll(s.valid, -1).at[-1].set(True),
                          s.valid)

        d_new = _two_loop_direction(g_new, s_hist, y_hist, rho_hist, valid)
        # descent safeguard: if the quasi-Newton direction is not a descent
        # direction (numerical breakdown), restart with steepest descent.
        descent = jnp.dot(d_new, g_new) < 0
        d_new = jnp.where(descent & jnp.all(jnp.isfinite(d_new)),
                          d_new, -g_new)

        done = (jnp.max(jnp.abs(g_new)) <= tolerance_grad) | \
               (jnp.max(jnp.abs(step)) <= tolerance_change) | \
               (jnp.abs(f_new - s.f) < tolerance_change)

        return _LBFGSState(
            x=x_new, f=f_new, g=g_new, d=d_new,
            s_hist=s_hist, y_hist=y_hist, rho_hist=rho_hist, valid=valid,
            n_iter=s.n_iter + 1, n_evals=s.n_evals + nev, done=done)

    out = jax.lax.while_loop(cond, body, init)
    return LBFGSResult(x=out.x, f=out.f,
                       grad_norm=jnp.max(jnp.abs(out.g)),
                       n_iter=out.n_iter, n_evals=out.n_evals)


def lbfgs_minimize_fixed(loss_fn: Callable[[jnp.ndarray], jnp.ndarray],
                         x0: jnp.ndarray,
                         max_iter: int = 25,
                         history_size: int = 10,
                         lr: float = 2.0,
                         step_candidates=(1.0, 0.5, 0.1, 0.02),
                         c1: float = 1e-4,
                         fused_probes: bool = False,
                         compact_direction: bool = False,
                         circular_history: bool = False,
                         pallas_direction: bool = False,
                         unroll: int = 1) -> LBFGSResult:
    """L-BFGS with a PARALLEL Armijo line search and fully static control
    flow (lax.scan, no while loops).

    Designed for large vmapped batches on TPU: the adaptive strong-Wolfe
    solver's while-loops make every window in a batch step until the
    slowest one converges and serialize the device on per-iteration
    conditionals.  Here every iteration does exactly one value_and_grad at
    the current point plus `len(step_candidates)` value-only probes —
    evaluated as ONE batched call along a candidate axis (which multiplies
    the decoder's batch size, improving MXU utilization, instead of adding
    sequential steps).  The largest candidate step satisfying Armijo is
    taken (falling back to the lowest-loss candidate), and curvature pairs
    are still gated by the y·s > 0 rule, so the inverse-Hessian estimate
    stays positive definite.

    Runs exactly `max_iter` iterations for every lane — wall-clock is
    deterministic and identical across the batch.

    fused_probes=True evaluates value_and_grad at ALL candidates in the one
    batched call and selects (f, g) along with the step — removing the
    separate value_and_grad at the accepted point.  The trajectory is
    mathematically identical (the objective eval is latency-bound, so one
    K-wide vg call beats a K-wide value call plus a separate vg call;
    costs K x the backward FLOPs, which are nearly free at these sizes).

    circular_history=True keeps the (m, d) history buffers stationary and
    tracks a write pointer: each iteration does ONE O(d) dynamic row write
    instead of three O(m*d) `jnp.roll` buffer rotations (identical
    trajectories; tests/test_lbfgs.py asserts equality).
    """
    if circular_history and (pallas_direction or compact_direction):
        # pointer-order buffers vs rolled oldest..newest layout: the
        # pallas/compact direction readers assume the latter and would
        # silently produce wrong descent directions.
        raise ValueError(
            "circular_history is incompatible with pallas_direction / "
            "compact_direction (those readers assume rolled history "
            "layout, newest at m-1)")
    value_and_grad = jax.value_and_grad(loss_fn)
    dim = x0.shape[-1]
    dtype = x0.dtype
    cands = jnp.asarray(step_candidates, dtype) * lr
    k = len(step_candidates)

    f0, g0 = value_and_grad(x0)
    # first-step scale, as in torch: min(1, 1/|g|_1)
    first_scale = jnp.minimum(1.0, 1.0 / jnp.sum(jnp.abs(g0)))

    def step(carry, it):
        x, f, g, s_hist, y_hist, rho_hist, valid, ptr = carry
        if pallas_direction:
            # whole two-loop fused into one VMEM-resident kernel (the
            # sequential dots/axpys are launch-latency-bound under vmap;
            # see ops/pallas/lbfgs_direction.py)
            from globalegomocap_tpu.ops.pallas.lbfgs_direction import (
                lbfgs_direction_pallas)
            d = lbfgs_direction_pallas(g, s_hist, y_hist, rho_hist, valid)
        elif compact_direction:
            d = _compact_direction(g, s_hist, y_hist, valid)
        elif circular_history:
            d = _two_loop_direction_circular(g, s_hist, y_hist, rho_hist,
                                             valid, ptr)
        else:
            d = _two_loop_direction(g, s_hist, y_hist, rho_hist, valid)
        descent = jnp.dot(d, g) < 0
        d = jnp.where(descent & jnp.all(jnp.isfinite(d)), d, -g)
        dphi0 = jnp.dot(d, g)

        scale = jnp.where(it == 0, first_scale, 1.0)
        ts = cands * scale                                   # (K,)
        # one batched probe of all candidates
        xs = x[None] + ts[:, None] * d[None]                 # (K, dim)
        if fused_probes:
            fs_raw, gs = jax.vmap(value_and_grad)(xs)        # (K,), (K, dim)
        else:
            fs_raw = jax.vmap(loss_fn)(xs)                   # (K,)
        fs = jnp.where(jnp.isfinite(fs_raw), fs_raw, jnp.inf)

        armijo = fs <= f + c1 * ts * dphi0
        # largest admissible step; else the best probe; else stay
        first_ok = jnp.argmax(armijo)                # cands sorted desc
        any_ok = jnp.any(armijo)
        best = jnp.argmin(fs)
        idx = jnp.where(any_ok, first_ok, best)
        improved = fs[idx] < f
        t = jnp.where(improved, ts[idx], 0.0)

        step_vec = t * d
        x_new = x + step_vec
        if fused_probes:
            # the accepted candidate's value/grad were already computed in
            # the batched call; a zero step keeps the carried (f, g)
            f_new = jnp.where(improved, fs[idx], f)
            g_new = jnp.where(improved, gs[idx], g)
        else:
            f_new, g_new = value_and_grad(x_new)
        y = g_new - g
        ys = jnp.dot(y, step_vec)
        do_update = ys > 1e-10
        if circular_history:
            # one O(d) row write at the pointer slot (no-op row when the
            # curvature pair is skipped), instead of rotating the buffers
            s_hist = s_hist.at[ptr].set(
                jnp.where(do_update, step_vec, s_hist[ptr]))
            y_hist = y_hist.at[ptr].set(
                jnp.where(do_update, y, y_hist[ptr]))
            rho_hist = rho_hist.at[ptr].set(
                jnp.where(do_update, 1.0 / ys, rho_hist[ptr]))
            valid = valid.at[ptr].set(valid[ptr] | do_update)
            ptr = jnp.where(do_update, (ptr + 1) % history_size, ptr)
        else:
            s_hist = jnp.where(do_update,
                               jnp.roll(s_hist, -1, 0).at[-1].set(step_vec),
                               s_hist)
            y_hist = jnp.where(do_update,
                               jnp.roll(y_hist, -1, 0).at[-1].set(y), y_hist)
            rho_hist = jnp.where(do_update,
                                 jnp.roll(rho_hist, -1).at[-1].set(1.0 / ys),
                                 rho_hist)
            valid = jnp.where(do_update,
                              jnp.roll(valid, -1).at[-1].set(True), valid)
        return (x_new, f_new, g_new, s_hist, y_hist, rho_hist, valid,
                ptr), None

    init = (x0, f0, g0,
            jnp.zeros((history_size, dim), dtype),
            jnp.zeros((history_size, dim), dtype),
            jnp.zeros((history_size,), dtype),
            jnp.zeros((history_size,), bool),
            jnp.asarray(0, jnp.int32))
    (x, f, g, *_), _ = jax.lax.scan(step, init,
                                    jnp.arange(max_iter, dtype=jnp.int32),
                                    unroll=unroll)
    n_evals = max_iter * k + 1 if fused_probes else max_iter * (k + 1) + 1
    return LBFGSResult(x=x, f=f, grad_norm=jnp.max(jnp.abs(g)),
                       n_iter=jnp.asarray(max_iter),
                       n_evals=jnp.asarray(n_evals))


def lbfgs_minimize_fixed_batched(value_and_grad_batch, x0: jnp.ndarray,
                                 max_iter: int = 25,
                                 history_size: int = 10,
                                 lr: float = 2.0,
                                 step_candidates=(1.0, 0.5, 0.1, 0.02),
                                 c1: float = 1e-4,
                                 unroll: int = 1) -> LBFGSResult:
    """`lbfgs_minimize_fixed` with an EXPLICIT batch axis and fused probes.

    value_and_grad_batch: (R, B, d) -> ((R, B), (R, B, d)), row-independent
    — the B columns are separate optimization problems, R is the candidate
    (probe) axis (R=1 for the init eval, R=K inside the line search; the
    candidate axis leads so the objective's per-window context stays
    loop-invariant in memory — no per-eval tiling).  Identical math to
    `jax.vmap(lbfgs_minimize_fixed(..., fused_probes=True))` column by
    column (tests/test_lbfgs_fixed.py asserts trajectory equality), but
    the objective sees the WHOLE batch in one call — which is what lets
    the fused Pallas energy kernel (ops/pallas/fused_energy.py) run as
    one kernel per eval instead of fighting nested vmap batching rules.
    x0: (B, d).
    """
    b, dim = x0.shape
    dtype = x0.dtype
    cands = jnp.asarray(step_candidates, dtype) * lr
    k = len(step_candidates)

    f0, g0 = value_and_grad_batch(x0[None])
    f0, g0 = f0[0], g0[0]
    first_scale = jnp.minimum(1.0, 1.0 / jnp.sum(jnp.abs(g0), axis=-1))

    dir_fn = jax.vmap(_two_loop_direction)

    def step(carry, it):
        x, f, g, s_hist, y_hist, rho_hist, valid = carry
        d = dir_fn(g, s_hist, y_hist, rho_hist, valid)        # (B, dim)
        descent = jnp.sum(d * g, axis=-1) < 0
        good = descent & jnp.all(jnp.isfinite(d), axis=-1)
        d = jnp.where(good[:, None], d, -g)
        dphi0 = jnp.sum(d * g, axis=-1)                       # (B,)

        scale = jnp.where(it == 0, first_scale, 1.0)          # (B,)
        ts = cands[:, None] * scale[None, :]                  # (K, B)
        xs = x[None] + ts[:, :, None] * d[None]               # (K, B, dim)
        fs_raw, gs = value_and_grad_batch(xs)                 # (K,B),(K,B,d)
        fs = jnp.where(jnp.isfinite(fs_raw), fs_raw, jnp.inf)

        armijo = fs <= f[None] + c1 * ts * dphi0[None]        # (K, B)
        first_ok = jnp.argmax(armijo, axis=0)
        any_ok = jnp.any(armijo, axis=0)
        best = jnp.argmin(fs, axis=0)
        idx = jnp.where(any_ok, first_ok, best)               # (B,)
        f_sel = jnp.take_along_axis(fs, idx[None], 0)[0]
        g_sel = jnp.take_along_axis(gs, idx[None, :, None], 0)[0]
        t_sel = jnp.take_along_axis(ts, idx[None], 0)[0]
        improved = f_sel < f
        t = jnp.where(improved, t_sel, 0.0)

        step_vec = t[:, None] * d
        x_new = x + step_vec
        f_new = jnp.where(improved, f_sel, f)
        g_new = jnp.where(improved[:, None], g_sel, g)
        y = g_new - g
        ys = jnp.sum(y * step_vec, axis=-1)
        do_update = ys > 1e-10                                # (B,)

        def roll_set(hist, new_row):
            rolled = jnp.roll(hist, -1, 1).at[:, -1].set(new_row)
            expand = (slice(None),) + (None,) * (hist.ndim - 1)
            return jnp.where(do_update[expand], rolled, hist)

        s_hist = roll_set(s_hist, step_vec)
        y_hist = roll_set(y_hist, y)
        rho_hist = roll_set(rho_hist, 1.0 / ys)
        valid = roll_set(valid, jnp.ones((b,), bool))
        return (x_new, f_new, g_new, s_hist, y_hist, rho_hist,
                valid), None

    init = (x0, f0, g0,
            jnp.zeros((b, history_size, dim), dtype),
            jnp.zeros((b, history_size, dim), dtype),
            jnp.zeros((b, history_size), dtype),
            jnp.zeros((b, history_size), bool))
    (x, f, g, *_), _ = jax.lax.scan(step, init,
                                    jnp.arange(max_iter, dtype=jnp.int32),
                                    unroll=unroll)
    return LBFGSResult(x=x, f=f,
                       grad_norm=jnp.max(jnp.abs(g), axis=-1),
                       n_iter=jnp.asarray(max_iter),
                       n_evals=jnp.asarray(max_iter * k + 1))


def adam_minimize(loss_fn: Callable[[jnp.ndarray], jnp.ndarray],
                  x0: jnp.ndarray,
                  steps: int = 150,
                  lr: float = 0.05,
                  b1: float = 0.9, b2: float = 0.999,
                  eps: float = 1e-8) -> LBFGSResult:
    """Fixed-step Adam on the latent — the fully static-control-flow
    fallback named in BASELINE.json.  Same calling convention as
    `lbfgs_minimize`."""
    value_and_grad = jax.value_and_grad(loss_fn)

    def step(carry, i):
        x, m, v = carry
        f, g = value_and_grad(x)
        m = b1 * m + (1 - b1) * g
        v = b2 * v + (1 - b2) * g * g
        mh = m / (1 - b1 ** (i + 1.0))
        vh = v / (1 - b2 ** (i + 1.0))
        x = x - lr * mh / (jnp.sqrt(vh) + eps)
        return (x, m, v), f

    (x, _, _), fs = jax.lax.scan(
        step, (x0, jnp.zeros_like(x0), jnp.zeros_like(x0)),
        jnp.arange(steps, dtype=x0.dtype))
    f, g = value_and_grad(x)
    return LBFGSResult(x=x, f=f, grad_norm=jnp.max(jnp.abs(g)),
                       n_iter=jnp.asarray(steps),
                       n_evals=jnp.asarray(steps + 1))
