"""Tests for the remaining inventory components: Mo2Cap2 windows, camera
energies, Blender/CV conversions, 2D drawing."""

import numpy as np
import jax.numpy as jnp

from globalegomocap_tpu.data.synthetic import synthetic_chunk
from globalegomocap_tpu.data.mo2cap2 import mo2cap2_windows
from globalegomocap_tpu.energy.terms import (
    camera_matrix_energy, camera_constraint_energy)
from globalegomocap_tpu.ops.blender import (
    cv_rt_from_blender, cv_rt_from_cv, relative_transform_from_blender,
    consecutive_global_cameras)
from globalegomocap_tpu.tools.draw import draw_joints


rng = np.random.default_rng(0)


class TestMo2Cap2:
    def test_windows_shapes_and_rel_frame(self):
        chunk = synthetic_chunk(45, seed=1)
        out = mo2cap2_windows(chunk, frame_num=10)
        # range(0, 45 - 10, 10) -> starts 0,10,20,30 (reference loop)
        assert out.poses.shape == (4, 10, 45)
        assert out.cameras.shape == (4, 10, 4, 4)
        assert out.gt.shape == (4, 10, 15, 3)
        # frame 0 of a relative-global window equals the local pose
        np.testing.assert_allclose(
            out.poses[0, 0], chunk.estimated_local[0].reshape(45),
            atol=1e-5)

    def test_local_mode(self):
        chunk = synthetic_chunk(30, seed=2)
        out = mo2cap2_windows(chunk, frame_num=10, local_pose=True)
        np.testing.assert_allclose(
            out.poses[1], chunk.estimated_local[10:20].reshape(10, 45),
            atol=1e-6)


class TestCameraEnergies:
    def test_cam_energy_zero_at_init(self):
        m = jnp.asarray(rng.normal(size=(5, 4, 4)).astype(np.float32))
        assert float(camera_matrix_energy(m, m)) == 0.0
        assert float(camera_matrix_energy(m + 0.1, m)) > 0.0

    def test_constraint_zero_for_rotations(self):
        from scipy.spatial.transform import Rotation
        R = Rotation.random(6, random_state=0).as_matrix()
        mats = np.tile(np.eye(4), (6, 1, 1))
        mats[:, :3, :3] = R
        e = float(camera_constraint_energy(jnp.asarray(
            mats.astype(np.float32))))
        assert e < 1e-8
        mats[:, :3, :3] *= 1.1  # break orthonormality
        e2 = float(camera_constraint_energy(jnp.asarray(
            mats.astype(np.float32))))
        assert e2 > 0.01


class TestBlender:
    def test_world2cv_inverts_camera_pose(self):
        """A world point at the camera location maps to the cv origin."""
        loc = np.array([1.0, 2.0, 3.0])
        rot = np.array([0.3, -0.2, 0.5])
        t, R, mat = cv_rt_from_blender(loc, rot)
        p = mat @ np.array([*loc, 1.0])
        np.testing.assert_allclose(p[:3], 0.0, atol=1e-10)
        # rotation block orthonormal with det +1
        np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-10)
        np.testing.assert_allclose(np.linalg.det(R), 1.0, atol=1e-10)

    def test_blender_axis_flip(self):
        """With zero rotation, Blender cam looks down -Z: a point in front
        of the camera (below it in world -Z) gets positive cv depth."""
        t, R, mat = cv_rt_from_blender([0, 0, 0], [0, 0, 0])
        p = mat @ np.array([0.0, 0.0, -5.0, 1.0])
        assert p[2] > 0
        t2, R2, mat2 = cv_rt_from_cv([0, 0, 0], [0, 0, 0])
        p2 = mat2 @ np.array([0.0, 0.0, 5.0, 1.0])
        assert p2[2] > 0

    def test_relative_transform_identity(self):
        loc = [0.5, 1.0, -0.3]
        rot = [0.1, 0.2, 0.3]
        euler, trans, mat = relative_transform_from_blender(
            loc, rot, loc, rot)
        np.testing.assert_allclose(mat, np.eye(4), atol=1e-10)

    def test_consecutive_cameras_chain(self):
        from scipy.spatial.transform import Rotation
        cams = np.tile(np.eye(4), (4, 1, 1))
        for i in range(4):
            cams[i, :3, :3] = Rotation.random(
                random_state=i).as_matrix()
            cams[i, :3, 3] = rng.normal(size=3)
        last = np.eye(4)
        last[:3, 3] = [9.0, 0.0, 0.0]
        out = consecutive_global_cameras(cams, last)
        # first camera maps onto `last`
        np.testing.assert_allclose(out[0], last, atol=1e-10)
        # relative transforms preserved
        rel_in = np.linalg.inv(cams[0]) @ cams[2]
        rel_out = np.linalg.inv(out[0]) @ out[2]
        np.testing.assert_allclose(rel_out, rel_in, atol=1e-10)


class TestDraw:
    def test_draw_changes_pixels(self):
        img = np.zeros((64, 64, 3), dtype=np.uint8)
        joints = rng.uniform(5, 58, size=(15, 2))
        out = draw_joints(joints, img)
        assert out.sum() > 0
