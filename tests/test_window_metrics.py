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


class TestMatmulMerge:
    """merge_windows_matmul must be an exact re-association of
    merge_windows (+ the optional folded gaussian smoothing)."""

    def test_matches_scatter_merge(self):
        from globalegomocap_tpu.optimize.window import merge_windows_matmul
        rng = np.random.default_rng(3)
        for w, t, stride in ((12, 10, 8), (5, 10, 5), (1, 10, 8),
                             (7, 6, 3)):
            x = jnp.asarray(rng.normal(size=(w, t, 15, 3)).astype(
                np.float32))
            ref = merge_windows(x, stride)
            got = merge_windows_matmul(x, stride)
            np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                       rtol=1e-5, atol=1e-6)

    def test_folded_smoothing_matches_sequential(self):
        from globalegomocap_tpu.optimize.window import merge_windows_matmul
        from globalegomocap_tpu.ops.filtering import gaussian_filter1d
        rng = np.random.default_rng(4)
        x = jnp.asarray(rng.normal(size=(12, 10, 15, 3)).astype(np.float32))
        ref = gaussian_filter1d(merge_windows(x, 8), 1.0, axis=0)
        got = merge_windows_matmul(x, 8, smooth_sigma=1.0)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-4, atol=1e-5)

    def test_pipeline_matmul_merge_equality(self):
        """The full two-stage pipeline with matmul_merge on/off and the
        direct-camera world lift must agree to float tolerance."""
        import jax
        from dataclasses import replace
        from globalegomocap_tpu.config import (
            OptimizeConfig, PriorConfig, SolverConfig)
        from globalegomocap_tpu.data.synthetic import synthetic_chunk
        from globalegomocap_tpu.optimize.driver import (
            SequenceOptimizer, build_model)
        from globalegomocap_tpu.data.test_data import TestChunk

        base = OptimizeConfig(
            prior=PriorConfig(latent_dim=16, seq_len=10,
                              hidden_dims=(8, 8, 16, 16, 32)),
            solver=SolverConfig(method="lbfgs_fixed", max_iter=3,
                                history_size=3, fused_probes=True),
            sampling_impl="dense", heatmap_crop=8, fold_bn=True,
            decoder_impl="shift")
        model = build_model(base)
        v = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 10, 45)),
                       False)
        chunk = TestChunk(*synthetic_chunk(26, seed=0))
        outs = {}
        for mm in (True, False):
            cfg = replace(base, matmul_merge=mm)
            opt = SequenceOptimizer(model, v, v, cfg)
            outs[mm] = opt.optimize_chunk(chunk)
        for field in ("estimated", "mid", "mid_local", "optimized", "gt"):
            np.testing.assert_allclose(
                np.asarray(getattr(outs[True], field)),
                np.asarray(getattr(outs[False], field)),
                rtol=1e-4, atol=1e-5, err_msg=field)
