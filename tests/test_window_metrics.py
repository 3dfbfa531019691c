"""Window slicing/merging and metric-suite tests."""

import numpy as np
import jax.numpy as jnp

from globalegomocap_tpu.optimize.window import (
    slice_windows, merge_windows, num_windows, covered_frames)
from globalegomocap_tpu.evaluation.metrics import (
    calculate_errors, METRIC_KEYS, mpjpe)
from globalegomocap_tpu.ops.umeyama import umeyama_align


rng = np.random.default_rng(0)


def reference_merge(windows: np.ndarray, overlap: int) -> np.ndarray:
    """The reference's merge_batches algorithm (optimizer.py:425-437),
    re-stated directly for cross-checking the scatter-mean."""
    if overlap == 0:
        return np.concatenate(list(windows))
    out = list(windows[0][:-overlap])
    for i in range(len(windows) - 1):
        first, second = windows[i], windows[i + 1]
        mid = (first[-overlap:] + second[:overlap]) / 2
        out.extend(mid)
        out.extend(second[overlap:-overlap])
    out.extend(windows[-1][-overlap:])
    return np.asarray(out)


class TestWindows:
    def test_num_windows(self):
        assert num_windows(100, 10, 8) == 12
        assert num_windows(10, 10, 8) == 1
        assert num_windows(9, 10, 8) == 0
        assert covered_frames(100, 10, 8) == 98

    def test_slice_shape_and_content(self):
        seq = rng.normal(size=(100, 15, 3)).astype(np.float32)
        win = slice_windows(jnp.asarray(seq), 10, 8)
        assert win.shape == (12, 10, 15, 3)
        np.testing.assert_array_equal(np.asarray(win[3]), seq[24:34])

    def test_merge_matches_reference_algorithm(self):
        for overlap in (2, 4):
            t = 10
            stride = t - overlap
            win = rng.normal(size=(7, t, 15, 3))
            ours = merge_windows(jnp.asarray(win), stride)
            ref = reference_merge(win, overlap)
            np.testing.assert_allclose(np.asarray(ours), ref, rtol=1e-5,
                                       atol=1e-6)

    def test_slice_then_merge_identity(self):
        seq = rng.normal(size=(98, 15, 3)).astype(np.float32)
        win = slice_windows(jnp.asarray(seq), 10, 8)
        merged = merge_windows(win, 8)
        np.testing.assert_allclose(np.asarray(merged), seq, rtol=1e-5,
                                   atol=1e-6)


class TestMetrics:
    def test_all_keys_present(self):
        n = 50
        est = rng.normal(size=(n, 15, 3))
        mid = rng.normal(size=(n, 15, 3))
        opt = rng.normal(size=(n, 15, 3))
        gt = rng.normal(size=(n, 15, 3))
        out = calculate_errors(*map(jnp.asarray, (est, mid, opt, gt)))
        assert set(out.keys()) == set(METRIC_KEYS)
        assert out["joints_error"].shape == (15,)
        for k in METRIC_KEYS:
            assert np.all(np.isfinite(np.asarray(out[k]))), k

    def test_perfect_prediction_is_zero(self):
        gt = rng.normal(size=(30, 15, 3))
        out = calculate_errors(*map(jnp.asarray, (gt, gt, gt, gt)))
        for k in ("original_global_mpjpe", "optimized_global_mpjpe",
                  "aligned_optimized_mpjpe",
                  "optimized_aligned_global_mpjpe",
                  "original_camera_pos_error"):
            assert float(out[k]) < 1e-5, k
        # bone-length metrics resize both sides identically -> still ~0
        assert float(out["bone_length_aligned_optimized_mpjpe"]) < 1e-4

    def test_global_alignment_removes_similarity(self):
        """A similarity-transformed copy of GT has zero aligned MPJPE but
        non-zero raw MPJPE."""
        from scipy.spatial.transform import Rotation
        gt = rng.normal(size=(40, 15, 3))
        R = Rotation.random(random_state=5).as_matrix()
        pred = gt.reshape(-1, 3) @ R * 1.3 + np.array([1.0, 2.0, 3.0])
        pred = pred.reshape(40, 15, 3)
        out = calculate_errors(*map(jnp.asarray, (pred, pred, pred, gt)))
        assert float(out["original_global_mpjpe"]) > 0.5
        assert float(out["optimized_aligned_global_mpjpe"]) < 1e-4
        assert float(out["aligned_optimized_mpjpe"]) < 1e-4

    def test_per_frame_beats_sequence_alignment(self):
        """Per-frame Procrustes can only be <= sequence-level alignment."""
        est = rng.normal(size=(30, 15, 3))
        gt = rng.normal(size=(30, 15, 3))
        out = calculate_errors(*map(jnp.asarray, (est, est, est, gt)))
        assert float(out["aligned_optimized_mpjpe"]) <= \
            float(out["optimized_aligned_global_mpjpe"]) + 1e-6

    def test_matches_numpy_loop_procrustes(self):
        """Batched per-frame alignment equals a per-frame numpy loop using
        the validated umeyama."""
        est = rng.normal(size=(12, 15, 3)).astype(np.float32)
        gt = rng.normal(size=(12, 15, 3)).astype(np.float32)
        batched = np.asarray(umeyama_align(jnp.asarray(est), jnp.asarray(gt)))
        for i in range(12):
            single = np.asarray(umeyama_align(jnp.asarray(est[i]),
                                              jnp.asarray(gt[i])))
            np.testing.assert_allclose(batched[i], single, rtol=1e-4,
                                       atol=1e-5)
