"""Auxiliary subsystem tests: profiling meters, metric logging, checkpoint
formats, epipolar geometry, captury parser."""

import json
import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp


rng = np.random.default_rng(0)


class TestProfiling:
    def test_span_timer(self):
        from globalegomocap_tpu.utils.profiling import SpanTimer
        t = SpanTimer()
        with t.span("a"):
            pass
        with t.span("a"):
            pass
        s = t.summary()
        assert s["a"]["count"] == 2
        assert s["a"]["total_s"] >= 0

    def test_throughput_meter(self):
        from globalegomocap_tpu.utils.profiling import ThroughputMeter
        m = ThroughputMeter()
        with m.measure(10):
            pass
        assert m.total_units == 10
        assert m.rate > 0
        assert "windows/s" in m.report()


class TestMetricLogger:
    def test_jsonl_written(self, tmp_path):
        from globalegomocap_tpu.utils.logging import MetricLogger
        lg = MetricLogger(str(tmp_path), tensorboard=False)
        lg.scalar("loss", 1.5, 0)
        lg.scalar("loss", 1.2, 1)
        lg.close()
        lines = [json.loads(ln) for ln in
                 open(tmp_path / "metrics.jsonl")]
        assert len(lines) == 2
        assert lines[1]["value"] == 1.2


class TestCheckpointFormats:
    @pytest.fixture(scope="class")
    def variables(self):
        from globalegomocap_tpu.models.conv_vae import ConvVAE
        model = ConvVAE(latent_dim=16, seq_len=10,
                        hidden_dims=(8, 8, 16, 16, 32))
        return model, model.init(jax.random.PRNGKey(0),
                                 jnp.zeros((1, 10, 45)), False)

    def test_msgpack_roundtrip(self, variables, tmp_path):
        from globalegomocap_tpu.models.checkpoint import (
            save_msgpack, load_prior_variables)
        model, v = variables
        p = str(tmp_path / "prior.msgpack")
        save_msgpack(v, p)
        restored = load_prior_variables(p)
        a = jax.tree_util.tree_leaves(v["params"])
        b = jax.tree_util.tree_leaves(restored["params"])
        for x, y in zip(a, b):
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y))

    def test_orbax_roundtrip(self, variables, tmp_path):
        from globalegomocap_tpu.models.checkpoint import (
            save_orbax, load_prior_variables)
        model, v = variables
        p = str(tmp_path / "prior_orbax")
        save_orbax(v, p)
        restored = load_prior_variables(p)
        a = jax.tree_util.tree_leaves(v["params"])
        b = jax.tree_util.tree_leaves(restored["params"])
        for x, y in zip(a, b):
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


class TestEpipolar:
    def _synthetic_two_view(self, n=40):
        from scipy.spatial.transform import Rotation
        X = rng.uniform(-1, 1, size=(n, 3)) + np.array([0, 0, 4.0])
        R = Rotation.from_euler("xyz", [5, -8, 3],
                               degrees=True).as_matrix()
        t = np.array([1.0, 0.2, -0.1])
        t = t / np.linalg.norm(t)
        # camera 1 is [I|0], camera 2 is [R|t]: x2 = R x1 + t
        x1 = X
        x2 = (R @ X.T).T + t
        r1 = x1 / np.linalg.norm(x1, axis=1, keepdims=True)
        r2 = x2 / np.linalg.norm(x2, axis=1, keepdims=True)
        return r1, r2, R, t, X

    def test_recover_pose(self):
        from globalegomocap_tpu.ops.epipolar import recover_pose
        r1, r2, R_true, t_true, X = self._synthetic_two_view()
        R, t, points = recover_pose(jnp.asarray(r1), jnp.asarray(r2))
        np.testing.assert_allclose(np.asarray(R), R_true, atol=1e-3)
        # translation up to sign convention is fixed by cheirality
        np.testing.assert_allclose(np.asarray(t), t_true, atol=1e-3)
        # triangulated structure matches up to the unit-baseline scale
        np.testing.assert_allclose(np.asarray(points), X, atol=1e-2)

    def test_rays_roundtrip_through_fisheye(self):
        from globalegomocap_tpu.ops import fisheye
        from globalegomocap_tpu.ops.epipolar import pixels_to_rays
        cam = fisheye.default_camera("egosyn")
        px = jnp.asarray([[700.0, 500.0], [500.0, 600.0]])
        rays = pixels_to_rays(cam, px)
        np.testing.assert_allclose(np.linalg.norm(np.asarray(rays), axis=1),
                                   1.0, rtol=1e-5)
        back = fisheye.world2camera(cam, rays * 5.0)
        np.testing.assert_allclose(np.asarray(back), np.asarray(px),
                                   atol=0.5)

    def test_recover_pose_fisheye_pinhole(self):
        """Mixed-camera wrapper: synthetic points seen by the calibrated
        fisheye (camera 1) and an external pinhole camera (camera 2)
        recover the true relative pose (reference convenience:
        fisheye_epipolar_geometry.py:110-167)."""
        from scipy.spatial.transform import Rotation
        from globalegomocap_tpu.ops import fisheye
        from globalegomocap_tpu.ops.epipolar import (
            recover_pose_fisheye_pinhole)

        cam = fisheye.default_camera("egosyn")
        # points in front of the fisheye (its +z looks "down" the rig)
        X = rng.uniform(-0.6, 0.6, size=(40, 3)) + np.array([0, 0, 2.5])
        px_fish = np.asarray(fisheye.world2camera(cam, jnp.asarray(X)))

        R = Rotation.from_euler("xyz", [4, -6, 2], degrees=True).as_matrix()
        t = np.array([0.8, 0.3, -0.2])
        t = t / np.linalg.norm(t)
        K = np.array([[800.0, 0, 640.0], [0, 800.0, 360.0], [0, 0, 1.0]])
        x2 = (R @ X.T).T + t
        px_pin = (K @ x2.T).T
        px_pin = px_pin[:, :2] / px_pin[:, 2:]

        R_est, t_est, points = recover_pose_fisheye_pinhole(
            cam, jnp.asarray(px_fish), jnp.asarray(K), jnp.asarray(px_pin))
        np.testing.assert_allclose(np.asarray(R_est), R, atol=5e-3)
        np.testing.assert_allclose(np.asarray(t_est), t, atol=5e-3)
        # structure in the fisheye frame, |t|=1 scale
        np.testing.assert_allclose(np.asarray(points), X, atol=5e-2)


class TestCaptury:
    def test_parse_block(self, tmp_path):
        from globalegomocap_tpu.tools.captury_camera import (
            load_captury_camera)
        lines = []
        # two camera blocks with recognizable values
        for cam_id in (0, 1):
            block = [f"camera\t{cam_id}\n"] + ["junk\n"] * 26
            block[11] = f"distortion {cam_id}.1 {cam_id}.2 0.0 0.0 0.0\n"
            for k, row in enumerate(range(17, 20)):
                block[row] = f"ext {cam_id}.0 {k}.0 0.0 1.0\n"
            for k, row in enumerate(range(21, 24)):
                block[row] = f"int {500 + cam_id} 0.0 {320 + k}.0\n"
            lines += block
        p = tmp_path / "cams.calib"
        p.write_text("".join(lines))
        cam = load_captury_camera(str(p), 1)
        assert cam.distortion[0] == pytest.approx(1.1)
        assert cam.extrinsic.shape == (3, 4)
        assert cam.intrinsic[0][0] == pytest.approx(501)
