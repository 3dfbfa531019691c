"""Native host-crop kernel (globalegomocap_tpu/native/hostcrop.c).

The C kernel must be bit-exact vs the numpy mirror for crops/origins
(pure gather + argmax with identical first-max tie-breaking); the
guard's mass sums may differ only in float summation order.
"""

import numpy as np
import pytest

from globalegomocap_tpu.energy.terms import crop_heatmaps_channels_last_np
from globalegomocap_tpu.native.hostcrop import (crop_peak_native,
                                                native_available)

pytestmark = pytest.mark.skipif(
    not native_available(),
    reason="no C compiler available for the native kernel")


def _compare(heat, k):
    cr, org, hw, box, total = crop_heatmaps_channels_last_np(heat, k)
    res = crop_peak_native(heat, k)
    assert res is not None
    ncr, norg, nhw, nbox, ntotal = res
    assert nhw == hw
    np.testing.assert_array_equal(norg, org, err_msg="origins")
    np.testing.assert_array_equal(ncr, cr.reshape(cr.shape[0], -1),
                                  err_msg="crops")
    np.testing.assert_allclose(nbox, box, rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(ntotal, total, rtol=1e-5, atol=1e-7)


def test_native_matches_numpy_random():
    rng = np.random.default_rng(0)
    heat = rng.normal(size=(7, 48, 40, 15)).astype(np.float32)
    _compare(heat, 8)
    _compare(heat, 16)


def test_native_matches_numpy_synthetic():
    from globalegomocap_tpu.data.synthetic import synthetic_chunk
    heat = np.asarray(synthetic_chunk(n_frames=20, seed=3).heatmaps)
    _compare(heat, 8)


def test_native_edge_peaks_and_ties():
    # peaks at map corners (origin clamping) and exact duplicate maxima
    # (first-max tie-breaking must match np.argmax)
    heat = np.zeros((3, 16, 16, 4), np.float32)
    heat[0, 0, 0, :] = 5.0                       # top-left corner
    heat[1, 15, 15, :] = 5.0                     # bottom-right corner
    heat[2, 3, 12, :] = 7.0                      # tie: same value twice
    heat[2, 9, 2, :] = 7.0
    heat += 0.01                                 # nonzero total mass
    _compare(heat, 8)


def test_native_negative_mass_clipped():
    rng = np.random.default_rng(1)
    heat = rng.normal(size=(4, 24, 24, 6)).astype(np.float32) - 0.5
    _compare(heat, 6)


def test_native_speed_advantage():
    """The point of the kernel: meaningfully faster than the numpy
    mirror on an ingest-sized chunk (generous 1.2x bound — CI boxes are
    noisy; host_ingest measurements carry the real number)."""
    import time
    rng = np.random.default_rng(2)
    heat = rng.random((100, 64, 64, 15), np.float32)
    crop_peak_native(heat, 8)                    # warm (build + cache)
    crop_heatmaps_channels_last_np(heat, 8)
    t0 = time.perf_counter()
    for _ in range(3):
        crop_peak_native(heat, 8)
    t_native = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(3):
        crop_heatmaps_channels_last_np(heat, 8)
    t_numpy = time.perf_counter() - t0
    assert t_native < t_numpy / 1.2, (t_native, t_numpy)
