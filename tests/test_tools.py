"""Tooling tests: SLAM reader, BVH parser, ETL lifting, PLY export, GMM,
HDF5 packing, prior introspection."""

import os
import pickle

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from globalegomocap_tpu.ops import fisheye
from globalegomocap_tpu.ops.gmm import (
    from_sklearn, score_samples)


rng = np.random.default_rng(0)


class TestGMM:
    @pytest.mark.parametrize("cov", ["full", "diag"])
    def test_matches_sklearn(self, cov):
        from sklearn.mixture import GaussianMixture
        X = rng.normal(size=(200, 6))
        gm = GaussianMixture(n_components=3, covariance_type=cov,
                             random_state=0).fit(X)
        params = from_sklearn(gm)
        Xt = rng.normal(size=(20, 6)).astype(np.float32)
        ours = np.asarray(score_samples(params, jnp.asarray(Xt)))
        theirs = gm.score_samples(Xt)
        np.testing.assert_allclose(ours, theirs, rtol=1e-3, atol=1e-3)

    def test_reference_compat_mode(self):
        """include_weights=False reproduces the reference's weight-less
        logsumexp (pytorch_gmm_from_scipy.py:38-40); identical for a single
        component."""
        from sklearn.mixture import GaussianMixture
        X = rng.normal(size=(100, 4))
        gm = GaussianMixture(n_components=1, covariance_type="diag",
                             random_state=0).fit(X)
        params = from_sklearn(gm)
        Xt = rng.normal(size=(10, 4)).astype(np.float32)
        a = np.asarray(score_samples(params, jnp.asarray(Xt), True))
        b = np.asarray(score_samples(params, jnp.asarray(Xt), False))
        np.testing.assert_allclose(a, b, rtol=1e-5)


class TestSlamReader:
    def _write_traj(self, path, n=30, fps=25.0):
        """Synthesize an OpenVSLAM trajectory file with known poses."""
        from scipy.spatial.transform import Rotation
        mats = []
        lines = []
        for i in range(n):
            t = i / fps
            trans = np.array([0.1 * i, 0.05 * i, 1.0 + 0.01 * i])
            quat = Rotation.from_euler("z", 5 * i, degrees=True).as_quat()
            lines.append(" ".join(map(str, [t, *trans, *quat])))
            m = np.eye(4)
            m[:3, :3] = Rotation.from_quat(quat).as_matrix()
            m[:3, 3] = trans
            mats.append(m)
        with open(path, "w") as f:
            f.write("\n".join(lines))
        return np.asarray(mats)

    def test_parse_and_rebase(self, tmp_path):
        from globalegomocap_tpu.tools.slam_reader import read_trajectory
        p = str(tmp_path / "frame_trajectory.txt")
        mats = self._write_traj(p)
        out = read_trajectory(p, 25.0, 5, 25)
        assert out.shape == (20, 4, 4)
        # rebased: first frame is the identity
        np.testing.assert_allclose(out[0], np.eye(4), atol=1e-6)
        # relative transform preserved: out[k] == inv(m5) @ m(5+k)
        expected = np.linalg.inv(mats[5]) @ mats[7]
        np.testing.assert_allclose(out[2], expected, atol=1e-5)

    def test_scale_recovery(self, tmp_path):
        """If GT head trajectory is a c-scaled version of the SLAM-implied
        one, the recovered scale must be c."""
        from globalegomocap_tpu.tools.slam_reader import (
            read_trajectory_with_scale, read_trajectory)
        from globalegomocap_tpu.ops.transforms import transform_pose
        p = str(tmp_path / "frame_trajectory.txt")
        self._write_traj(p)
        n = 20
        local = np.tile(rng.normal(size=(15, 3)) * 0.3 +
                        np.array([0, 0, 1.0]), (n, 1, 1)).astype(np.float32)
        # head joint at the camera origin makes the SLAM-implied head
        # trajectory equal the translations, so the Umeyama scale fit is
        # exact (in general the fit is approximate — the rotation parts of
        # the poses are not scaled)
        local[:, 0, :] = 0.0
        true_scale = 3.7
        # GT = trajectory with translations scaled by true_scale
        rel_scaled = read_trajectory(p, 25.0, 0, n, scale=true_scale)
        gt = np.asarray(transform_pose(jnp.asarray(local),
                                       jnp.asarray(rel_scaled)))
        traj, R1, t1 = read_trajectory_with_scale(p, 25.0, local, gt, 0, n)
        np.testing.assert_allclose(traj[:, :3, 3], rel_scaled[:, :3, 3],
                                   rtol=1e-3, atol=1e-4)


class TestBvh:
    BVH_TEXT = """HIERARCHY
ROOT Hips
{
    OFFSET 0.0 0.0 0.0
    CHANNELS 6 Xposition Yposition Zposition Zrotation Xrotation Yrotation
    JOINT Spine
    {
        OFFSET 0.0 10.0 0.0
        CHANNELS 3 Zrotation Xrotation Yrotation
        End Site
        {
            OFFSET 0.0 5.0 0.0
        }
    }
    JOINT LeftLeg
    {
        OFFSET 2.0 -5.0 0.0
        CHANNELS 3 Zrotation Xrotation Yrotation
        End Site
        {
            OFFSET 0.0 -10.0 0.0
        }
    }
}
MOTION
Frames: 2
Frame Time: 0.04
0 0 0 0 0 0 0 0 0 0 0 0
1 2 3 90 0 0 0 0 0 0 0 0
"""

    def test_parse_and_fk(self, tmp_path):
        from globalegomocap_tpu.tools.bvh import Bvh
        p = tmp_path / "test.bvh"
        p.write_text(self.BVH_TEXT)
        anim = Bvh().parse_file(str(p))
        assert anim.frames == 2
        assert anim.joint_names() == [
            "Hips", "Spine", "Spine_end", "LeftLeg", "LeftLeg_end"]
        pos, names = anim.all_frame_poses()
        assert pos.shape == (2, 5, 3)
        # frame 0: rest pose = accumulated offsets
        np.testing.assert_allclose(pos[0, 1], [0, 10, 0], atol=1e-6)
        np.testing.assert_allclose(pos[0, 2], [0, 15, 0], atol=1e-6)
        np.testing.assert_allclose(pos[0, 4], [2, -15, 0], atol=1e-6)
        # frame 1: root translated (1,2,3) and rotated 90° about z:
        # offset (0,10,0) maps to (-10,0,0) + root translation
        np.testing.assert_allclose(pos[1, 0], [1, 2, 3], atol=1e-5)
        np.testing.assert_allclose(pos[1, 1], [-9, 2, 3], atol=1e-5)

    def test_fps_property(self, tmp_path):
        from globalegomocap_tpu.tools.bvh import Bvh
        p = tmp_path / "test.bvh"
        p.write_text(self.BVH_TEXT)
        anim = Bvh().parse_file(str(p))
        assert anim.fps == pytest.approx(25.0)


class TestHeatmapLifting:
    def test_lift_recovers_known_pose(self):
        """Render heatmaps from a known pose, lift them back: the recovered
        pose matches to heatmap-pixel quantization."""
        from globalegomocap_tpu.data.synthetic import (
            synthetic_motion, render_heatmaps)
        from globalegomocap_tpu.tools.process_test_data import (
            lift_heatmaps_to_pose)
        cam = fisheye.default_camera("egosyn")
        local = synthetic_motion(6, seed=3)
        heat = render_heatmaps(local, cam)
        depths = np.linalg.norm(local, axis=-1)
        lifted = lift_heatmaps_to_pose(heat, depths, cam)
        # 16-px quantization at ~1m depth is ~3-4 cm
        err = np.linalg.norm(lifted - local, axis=-1).mean()
        assert err < 0.06, err

    def test_build_chunk_end_to_end(self, tmp_path):
        """ETL pipeline on synthetic inputs produces a consistent chunk."""
        from scipy.spatial.transform import Rotation
        from globalegomocap_tpu.data.synthetic import (
            synthetic_motion, render_heatmaps, synthetic_camera_trajectory)
        from globalegomocap_tpu.tools.process_test_data import build_chunk
        from globalegomocap_tpu.ops.transforms import transform_pose

        n = 20
        cam = fisheye.default_camera("egosyn")
        local = synthetic_motion(n, seed=4)
        cams = synthetic_camera_trajectory(n, seed=4)
        # write the SLAM trajectory file matching cams
        lines = []
        for i in range(n):
            q = Rotation.from_matrix(cams[i, :3, :3]).as_quat()
            lines.append(" ".join(map(str, [i / 25.0, *cams[i, :3, 3], *q])))
        slam_path = str(tmp_path / "frame_trajectory.txt")
        with open(slam_path, "w") as f:
            f.write("\n".join(lines))

        # GT must live in the rebased (first-camera) frame — the frame the
        # SLAM reader emits and the reference's GT pickles are aligned to
        rel_cams = np.linalg.inv(cams[0])[None] @ cams
        gt = np.asarray(transform_pose(jnp.asarray(local),
                                       jnp.asarray(rel_cams)))
        heat = render_heatmaps(local, cam)
        depths = np.linalg.norm(local, axis=-1)
        chunk = build_chunk(heat, depths, slam_path, gt, 25.0, 0, n, cam)
        assert chunk.estimated_local.shape == (n, 15, 3)
        assert chunk.camera_poses.shape == (n, 4, 4)
        # estimated global should be close to GT (heatmap quantization +
        # SLAM rebase differences only)
        err = np.linalg.norm(chunk.estimated_global - chunk.gt_global,
                             axis=-1).mean()
        assert err < 0.25, err


class TestPly:
    def test_write_and_reparse(self, tmp_path):
        from globalegomocap_tpu.tools.ply import (
            skeleton_mesh, write_ply, save_skeleton_sequence)
        joints = rng.normal(size=(15, 3))
        v, f = skeleton_mesh(joints)
        assert len(v) > 15 * 12 and len(f) > 0
        assert f.max() < len(v)
        p = str(tmp_path / "mesh.ply")
        write_ply(p, v, f)
        with open(p, "rb") as fh:
            head = fh.read(200).decode(errors="ignore")
        assert "element vertex" in head
        paths = save_skeleton_sequence(rng.normal(size=(3, 15, 3)),
                                       str(tmp_path / "seq"))
        assert len(paths) == 3 and all(os.path.exists(p) for p in paths)


class TestHDF5:
    def test_pack_and_load(self, tmp_path):
        from globalegomocap_tpu.data.synthetic import synthetic_amass
        from globalegomocap_tpu.data.hdf5 import (
            pack_amass_dir, load_hdf5_windows)
        seqs = synthetic_amass(n_sequences=2, frames_per_seq=30, seed=5)
        src = tmp_path / "pkls"
        src.mkdir()
        for i, s in enumerate(seqs):
            with open(src / f"seq_{i}.pkl", "wb") as f:
                pickle.dump(s, f)
        out = str(tmp_path / "data.h5")
        pack_amass_dir(str(src), out, frame_num=10, fps=25)
        ds = load_hdf5_windows(out)
        # 2 sequences x (30 - 10) = 40 windows
        assert ds.windows.shape == (40, 10, 45)
        ds_local = load_hdf5_windows(out, local_pose=True)
        assert ds_local.windows.shape == (40, 10, 45)

    def test_interpolate_frames(self):
        from globalegomocap_tpu.data.hdf5 import interpolate_frames
        seq = np.asarray([[0.0], [10.0], [20.0]])
        out = interpolate_frames(seq, factor=5)
        assert out.shape == (10, 1)
        np.testing.assert_allclose(out[:5, 0], [0, 2, 4, 6, 8])


class TestPriorTools:
    @pytest.fixture(scope="class")
    def model_vars(self):
        from globalegomocap_tpu.models.conv_vae import ConvVAE
        model = ConvVAE(latent_dim=32, seq_len=10,
                        hidden_dims=(16, 16, 32, 32, 64))
        v = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 10, 45)), False)
        return model, v

    def test_sample_motions(self, model_vars):
        from globalegomocap_tpu.tools.prior_tools import sample_motions
        model, v = model_vars
        s = sample_motions(model, v, 4)
        assert s.shape == (4, 10, 15, 3)

    def test_interpolation_endpoints(self, model_vars):
        from globalegomocap_tpu.tools.prior_tools import interpolate_latents
        model, v = model_vars
        wa = rng.normal(size=(10, 45)).astype(np.float32)
        wb = rng.normal(size=(10, 45)).astype(np.float32)
        out = interpolate_latents(model, v, wa, wb, steps=4)
        assert out.shape == (6, 10, 15, 3)
        # interior frames move monotonically between endpoint decodes
        d0 = np.linalg.norm(out[1] - out[0])
        d5 = np.linalg.norm(out[1] - out[5])
        assert d0 < d5

    def test_latent_statistics(self, model_vars):
        from globalegomocap_tpu.tools.prior_tools import latent_statistics
        model, v = model_vars
        w = rng.normal(size=(8, 10, 45)).astype(np.float32)
        stats = latent_statistics(model, v, w)
        assert stats["mu_sq_norm"].shape == (8,)
        assert np.isfinite(stats["mean_std_dist"])
