"""Prior-regime matching (VERDICT r3 #7).

The VAE priors are motion models: a prior trained on slow smooth motion
actively hurts on jerky/contact-rich input (quality_iter_crop_v2.json
measured absolute quality degrading with the v1-trained prior on the v2
corpus; the hand-matched `_pv2` runs quantify the recovery).  The
reference's answer is "train the prior on matching data"
(reference: networks/train.py:35-129 — one trainer, whatever data you
point it at); nothing in its production surface detects or reacts to a
mismatch.

This module operationalizes that:

  * `motion_accel_stat` — the regime statistic: mean per-frame
    acceleration magnitude of a pose sequence (m/frame^2 at the corpus
    frame rate).  Cheap (one reduction), computed from the SAME input
    estimates the solver consumes, and it separates the regimes the
    corpora model (v1 smooth ~1e-3, v2 jerky ~4e-3, v3 contacts higher).
  * `PriorBank` — named (local, global) prior pairs each tagged with the
    accel stat of its training windows; `select` returns the entry
    nearest in log space.  The driver (SequenceOptimizer.prior_bank)
    measures each staged batch's stat and auto-selects, analogous to the
    crop-mass guard's map-statistics fallback.
  * Trainers record the stat in their checkpoint metadata
    (train_vae.Trainer.motion_stats) so banks can be assembled from
    checkpoints without re-reading the training corpus.
"""

from __future__ import annotations

import math
from typing import Any, NamedTuple

import numpy as np


FPS = 25.0           # the corpus frame rate (reference: frame_rate=25)
BAND = (0.2, 3.0)    # human-motion band (Hz)
NOISE_LO = 8.0       # flat-noise estimation band starts here (Hz)
NOISE_FACTOR = 3.0   # subtract this multiple of the noise floor


def _spec_accel(xp, pose, fps, lo, hi, noise_lo, nfac):
    """Shared numpy/jax.numpy body of the spectral statistic (see
    motion_accel_stat).  pose: (..., F, J, 3); returns a 0-d value."""
    n = pose.shape[-3]
    x = xp.moveaxis(pose, -3, -1)                   # (..., J, 3, F)
    x = x - x.mean(axis=-1, keepdims=True)
    psd = (xp.abs(xp.fft.rfft(x, axis=-1)) ** 2) / n ** 2 * 2
    f = np.fft.rfftfreq(n, d=1.0 / fps)             # static (host)
    nb = f >= noise_lo
    if nb.any():
        noise = psd[..., nb].mean(axis=-1, keepdims=True)
        psd = xp.clip(psd - nfac * noise, 0, None)
    band = (f >= lo) & (f <= hi)
    w = (2 * np.pi * f / fps) ** 4                  # |accel|^2 weight
    acc2 = (psd[..., band] * w[band]).sum(axis=-1)  # per (J, coord)
    return xp.sqrt(acc2.sum(axis=-1).mean())


def motion_accel_stat(pose, window: int | None = None,
                      fps: float = FPS) -> float:
    """Regime statistic of (..., F, J, 3) poses: rms acceleration in the
    human-motion band (0.2-3 Hz), with the flat white-noise floor
    (per-frame estimation error) measured in the >8 Hz band and
    subtracted BEFORE the omega^4 weighting.

    Noise robustness is the point: raw second differences of the noisy
    estimates are dominated by the white noise (std 0.03 noise
    contributes ~0.12 m/frame^2 — 100x the smooth corpus's true accel),
    so a time-domain statistic cannot compare a prior's CLEAN training
    motion against a batch's NOISY estimates.  This estimator measures
    within ~15% of the clean value on noisy input while separating the
    regimes ~6x (v1 vs v2).

    window: split the frame axis into length-`window` segments first —
    pass the prior's seq_len so deployment batches are measured at the
    SAME spectral resolution as the prior's training windows (both sides
    of the bank comparison must use one estimator).  None = whole
    sequence.  Returns a host float (units: m/frame^2 rms)."""
    p = np.asarray(pose, dtype=np.float32)
    if window and p.shape[-3] >= window:
        m = p.shape[-3] // window
        p = p[..., :m * window, :, :].reshape(
            p.shape[:-3] + (m, window) + p.shape[-2:])
    return float(_spec_accel(np, p, fps, BAND[0], BAND[1], NOISE_LO,
                             NOISE_FACTOR))


def motion_accel_stat_jax(pose, window: int | None = None,
                          fps: float = FPS):
    """jit-friendly twin of `motion_accel_stat` (same formula via
    jax.numpy) — the driver measures staged device batches with this,
    returning a scalar (4-byte readback instead of pulling the estimate
    stack through the tunnel)."""
    import jax.numpy as jnp
    p = pose.astype(jnp.float32)
    if window and p.shape[-3] >= window:
        m = p.shape[-3] // window
        p = p[..., :m * window, :, :].reshape(
            p.shape[:-3] + (m, window) + p.shape[-2:])
    return _spec_accel(jnp, p, fps, BAND[0], BAND[1], NOISE_LO,
                       NOISE_FACTOR)


def windows_accel_stat(windows: np.ndarray) -> float:
    """`motion_accel_stat` for flattened training windows (N, T, J*3) —
    the AmassWindows storage layout (T is already the window length, so
    the spectral resolution matches the driver's seq_len-windowed
    deployment measurement)."""
    w = np.asarray(windows, dtype=np.float32)
    if w.size == 0:
        return float("nan")
    n, t = w.shape[0], w.shape[1]
    return motion_accel_stat(w.reshape(n, t, -1, 3))


class PriorEntry(NamedTuple):
    name: str
    local_variables: Any
    global_variables: Any
    accel_mean: float


class PriorBank:
    """Named prior pairs tagged with their training-motion statistic.

    Selection is nearest-neighbour in log(accel_mean): acceleration
    scales multiplicatively between regimes (2x amplitude at 2x
    frequency = 8x accel), so ratios — not differences — are the right
    distance."""

    def __init__(self, entries: "list[PriorEntry] | None" = None):
        self.entries: list[PriorEntry] = list(entries or [])

    def add(self, name: str, local_variables, global_variables,
            accel_mean: float) -> "PriorBank":
        if accel_mean <= 0:
            raise ValueError(f"accel_mean must be positive, got "
                             f"{accel_mean} for prior '{name}'")
        self.entries.append(PriorEntry(name, local_variables,
                                       global_variables,
                                       float(accel_mean)))
        return self

    def select(self, accel_mean: float) -> PriorEntry:
        if not self.entries:
            raise ValueError("PriorBank is empty")
        target = math.log(max(float(accel_mean), 1e-12))
        return min(self.entries,
                   key=lambda e: abs(math.log(e.accel_mean) - target))
