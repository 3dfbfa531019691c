"""Geometry core parity tests.

Promotes the reference's de-facto `__main__` smoke tests (SURVEY.md §4) into
real tests, cross-checking against scipy/torch/numpy library behaviour."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from globalegomocap_tpu.ops import (
    bone_lengths, mean_bone_lengths, skeleton_resize,
    transform_pose, relative_global_pose, relative_to_global_pose,
    quat_trans_to_matrix, invert_se3, umeyama, umeyama_align,
    gaussian_filter1d, one_euro_filter, grid_sample_bilinear,
)
from globalegomocap_tpu.ops.skeleton import (
    KINEMATIC_PARENTS, NUM_JOINTS, mean3d_bone_lengths_mm, heatmap_argmax,
)
from globalegomocap_tpu.ops import fisheye
from globalegomocap_tpu.ops.transforms import quat_to_rotmat, rotmat_to_quat


rng = np.random.default_rng(0)


def random_se3(batch=()):
    """Random rigid transforms via scipy."""
    from scipy.spatial.transform import Rotation
    n = int(np.prod(batch)) if batch else 1
    R = Rotation.random(n, random_state=42).as_matrix()
    t = rng.normal(size=(n, 3))
    M = np.tile(np.eye(4), (n, 1, 1))
    M[:, :3, :3] = R
    M[:, :3, 3] = t
    return M.reshape(*batch, 4, 4) if batch else M[0]


class TestSkeleton:
    def test_bone_lengths_shape_and_root(self):
        sk = rng.normal(size=(7, NUM_JOINTS, 3)).astype(np.float32)
        bl = bone_lengths(jnp.asarray(sk))
        assert bl.shape == (7, NUM_JOINTS)
        np.testing.assert_allclose(bl[:, 0], 0.0, atol=1e-6)
        # manual check of one bone
        j = 5
        expected = np.linalg.norm(sk[:, j] - sk[:, KINEMATIC_PARENTS[j]],
                                  axis=-1)
        np.testing.assert_allclose(bl[:, j], expected, rtol=1e-5)

    def test_mean_bone_lengths(self):
        sk = rng.normal(size=(4, 10, NUM_JOINTS, 3)).astype(np.float32)
        mbl = mean_bone_lengths(jnp.asarray(sk))
        assert mbl.shape == (4, NUM_JOINTS)

    def test_skeleton_resize_hits_target_lengths(self):
        sk = rng.normal(size=(NUM_JOINTS, 3)).astype(np.float32) * 0.5
        target_mm = mean3d_bone_lengths_mm()
        out = skeleton_resize(jnp.asarray(sk), jnp.asarray(target_mm))
        new_bl = np.asarray(bone_lengths(out))
        np.testing.assert_allclose(new_bl[1:], target_mm[1:] / 1000.0,
                                   rtol=1e-4)
        # root joint untouched
        np.testing.assert_allclose(out[0], sk[0], atol=1e-6)

    def test_heatmap_argmax(self):
        hm = np.zeros((2, 3, 8, 9), dtype=np.float32)
        hm[0, 0, 5, 7] = 1.0
        hm[0, 1, 2, 3] = 2.0
        hm[1, 2, 0, 0] = 0.5
        coords, vals = heatmap_argmax(jnp.asarray(hm))
        np.testing.assert_allclose(coords[0, 0], [7, 5])
        np.testing.assert_allclose(coords[0, 1], [3, 2])
        # all-zero map is masked to (0, 0)
        np.testing.assert_allclose(coords[0, 2], [0, 0])
        assert vals[0, 1] == 2.0


class TestTransforms:
    def test_transform_pose_matches_numpy(self):
        pose = rng.normal(size=(15, 3))
        M = random_se3()
        expected = (M @ np.concatenate(
            [pose, np.ones((15, 1))], axis=1).T).T[:, :3]
        out = transform_pose(jnp.asarray(pose), jnp.asarray(M))
        np.testing.assert_allclose(out, expected, rtol=1e-5, atol=1e-6)

    def test_invert_se3(self):
        M = random_se3((6,))
        inv = invert_se3(jnp.asarray(M))
        prod = np.asarray(jnp.matmul(inv, jnp.asarray(M)))
        np.testing.assert_allclose(prod, np.tile(np.eye(4), (6, 1, 1)),
                                   atol=1e-5)

    def test_relative_global_pose_matches_loop(self):
        """Batched einsum vs the reference's per-frame loop semantics."""
        T = 10
        local = rng.normal(size=(T, 15, 3))
        cams = random_se3((T,))
        # straightforward per-frame loop (the reference algorithm)
        cam0_inv = np.linalg.inv(cams[0])
        expected = np.stack([
            (cam0_inv @ cams[i] @ np.concatenate(
                [local[i], np.ones((15, 1))], axis=1).T).T[:, :3]
            for i in range(T)])
        out = relative_global_pose(jnp.asarray(local), jnp.asarray(cams))
        np.testing.assert_allclose(out, expected, rtol=1e-4, atol=1e-5)

    def test_relative_round_trip(self):
        T = 8
        local = rng.normal(size=(T, 15, 3))
        cams = random_se3((T,))
        rel = relative_global_pose(jnp.asarray(local), jnp.asarray(cams))
        glob = relative_to_global_pose(rel, jnp.asarray(cams[0]))
        # global pose should equal cam_i @ local_i
        expected = np.stack([
            (cams[i] @ np.concatenate(
                [local[i], np.ones((15, 1))], axis=1).T).T[:, :3]
            for i in range(T)])
        np.testing.assert_allclose(glob, expected, rtol=1e-4, atol=1e-5)

    def test_quat_matches_scipy(self):
        from scipy.spatial.transform import Rotation
        q = Rotation.random(10, random_state=7).as_quat()  # xyzw
        expected = Rotation.from_quat(q).as_matrix()
        out = quat_to_rotmat(jnp.asarray(q))
        np.testing.assert_allclose(out, expected, atol=1e-6)

        t = rng.normal(size=(10, 3))
        M = quat_trans_to_matrix(jnp.asarray(t), jnp.asarray(q))
        np.testing.assert_allclose(np.asarray(M)[:, :3, :3], expected,
                                   atol=1e-6)
        np.testing.assert_allclose(np.asarray(M)[:, :3, 3], t, atol=1e-6)

    def test_rotmat_quat_roundtrip(self):
        from scipy.spatial.transform import Rotation
        R = Rotation.random(20, random_state=3).as_matrix()
        q = rotmat_to_quat(jnp.asarray(R))
        R2 = quat_to_rotmat(q)
        np.testing.assert_allclose(R2, R, atol=1e-5)


class TestUmeyama:
    def test_recovers_known_similarity(self):
        from scipy.spatial.transform import Rotation
        P = rng.normal(size=(15, 3))
        R_true = Rotation.random(random_state=1).as_matrix()
        c_true, t_true = 1.7, np.array([0.3, -1.0, 2.0])
        # application convention: Q = P @ R * c + t
        Q = P @ R_true * c_true + t_true
        c, R, t = umeyama(jnp.asarray(P), jnp.asarray(Q))
        np.testing.assert_allclose(float(c), c_true, rtol=1e-4)
        np.testing.assert_allclose(np.asarray(R), R_true, atol=1e-4)
        np.testing.assert_allclose(np.asarray(t), t_true, atol=1e-4)

    def test_matches_torch_svd_reference(self):
        """Cross-check (c, R, t) against an independent torch computation of
        the same objective (the reference's numpy/torch pair agree with each
        other; we verify ours agrees with torch)."""
        import torch
        P = rng.normal(size=(15, 3))
        Q = rng.normal(size=(15, 3))

        tP, tQ = torch.tensor(P), torch.tensor(Q)
        cP = tP - tP.mean(0)
        cQ = tQ - tQ.mean(0)
        C = cP.T @ cQ / 15
        U, S, Vh = torch.linalg.svd(C)
        d = (torch.det(U) * torch.det(Vh)) < 0
        if d:
            S[-1] = -S[-1]
            U[:, -1] = -U[:, -1]
        R_t = U @ Vh
        c_t = S.sum() / tP.var(0, unbiased=False).sum()
        t_t = tQ.mean(0) - tP.mean(0) @ (c_t * R_t)

        c, R, t = umeyama(jnp.asarray(P), jnp.asarray(Q))
        np.testing.assert_allclose(float(c), float(c_t), rtol=1e-5)
        np.testing.assert_allclose(np.asarray(R), R_t.numpy(), atol=1e-5)
        np.testing.assert_allclose(np.asarray(t), t_t.numpy(), atol=1e-5)

    def test_batched_equals_loop(self):
        P = rng.normal(size=(9, 15, 3))
        Q = rng.normal(size=(9, 15, 3))
        out = umeyama_align(jnp.asarray(P), jnp.asarray(Q))
        for i in range(9):
            single = umeyama_align(jnp.asarray(P[i]), jnp.asarray(Q[i]))
            np.testing.assert_allclose(out[i], single, rtol=1e-4, atol=1e-5)

    def test_alignment_reduces_error(self):
        P = rng.normal(size=(50, 3))
        Q = P * 2.0 + rng.normal(size=(50, 3)) * 0.01
        aligned = np.asarray(umeyama_align(jnp.asarray(P), jnp.asarray(Q)))
        err_before = np.linalg.norm(P - Q, axis=1).mean()
        err_after = np.linalg.norm(aligned - Q, axis=1).mean()
        assert err_after < err_before * 0.1


class TestFisheye:
    def test_roundtrip_calibrated(self):
        """camera2world -> world2camera reproduces pixels (the reference's
        own __main__ round-trip check, FishEyeCalibrated.py:149-162)."""
        cam = fisheye.default_camera("egosyn")
        pts = jnp.asarray([[660.0, 520.0], [520.0, 660.0], [123.0, 456.0],
                           [900.0, 300.0]])
        depth = jnp.asarray([30.0, 30.0, 40.0, 25.0])
        p3d = fisheye.camera2world(cam, pts, depth)
        back = fisheye.world2camera(cam, p3d)
        np.testing.assert_allclose(np.asarray(back), np.asarray(pts),
                                   rtol=1e-3, atol=0.5)

    def test_depth_preserved(self):
        cam = fisheye.default_camera("egosyn")
        pts = jnp.asarray([[700.0, 500.0], [400.0, 480.0]])
        depth = jnp.asarray([3.0, 7.0])
        p3d = fisheye.camera2world(cam, pts, depth)
        np.testing.assert_allclose(jnp.linalg.norm(p3d, axis=-1), depth,
                                   rtol=1e-5)
        _, d2 = fisheye.world2camera_with_depth(cam, p3d)
        np.testing.assert_allclose(d2, depth, rtol=1e-5)

    def test_batched_and_jit(self):
        cam = fisheye.default_camera("pose_fisheye")
        p3d = jnp.asarray(rng.normal(size=(4, 10, 15, 3)) +
                          np.array([0, 0, 1.5]))
        out = jax.jit(fisheye.world2camera)(cam, p3d)
        assert out.shape == (4, 10, 15, 2)
        single = fisheye.world2camera(cam, p3d[2, 3])
        np.testing.assert_allclose(out[2, 3], single, rtol=1e-6)

    def test_equisolid_matches_formula(self):
        cam = fisheye.equisolid()
        # points within the rim clamp radius (f*sqrt(2) - 30 ≈ 479 px)
        pts = jnp.asarray([[800.0, 600.0], [700.0, 512.0]])
        depth = jnp.asarray([10.0, 10.0])
        p3d = np.asarray(fisheye.equisolid_camera2world(cam, pts, depth))
        # ray length == depth
        np.testing.assert_allclose(np.linalg.norm(p3d, axis=1), depth,
                                   rtol=1e-5)
        # z follows r / tan(2 asin(r / 2f)):  Z / r = 1 / tan(theta)
        f = 9 / 32 * 1280
        c = np.array([640 + 1e-10, 512 + 1e-10])
        r = np.linalg.norm(np.asarray(pts) - c, axis=1)
        theta = 2 * np.arcsin(r / (2 * f))
        np.testing.assert_allclose(p3d[:, 2] / np.abs(p3d[:, 0] ** 2 +
                                                      p3d[:, 1] ** 2) ** 0.5,
                                   1.0 / np.tan(theta), rtol=1e-4)

    def test_equisolid_rim_clamp(self):
        """Radii past (max_radius - 30) clamp to max_radius -> theta = 90°,
        i.e. the ray becomes purely lateral (Z ≈ 0)."""
        cam = fisheye.equisolid()
        pts = jnp.asarray([[640.0 + 500.0, 512.0]])
        p3d = np.asarray(fisheye.equisolid_camera2world(
            cam, pts, jnp.asarray([5.0])))
        assert abs(p3d[0, 2]) < 1e-3 * abs(p3d[0, 0])


class TestFiltering:
    def test_gaussian_matches_scipy(self):
        from scipy.ndimage import gaussian_filter1d as scipy_g
        x = rng.normal(size=(40, 15, 3))
        expected = scipy_g(x, sigma=1, axis=0)
        out = gaussian_filter1d(jnp.asarray(x), sigma=1.0, axis=0)
        np.testing.assert_allclose(out, expected, rtol=1e-4, atol=1e-6)

    def test_gaussian_other_axis_and_sigma(self):
        from scipy.ndimage import gaussian_filter1d as scipy_g
        x = rng.normal(size=(6, 30, 2))
        expected = scipy_g(x, sigma=2.5, axis=1)
        out = gaussian_filter1d(jnp.asarray(x), sigma=2.5, axis=1)
        np.testing.assert_allclose(out, expected, rtol=1e-4, atol=1e-6)

    def test_one_euro_matches_scalar_reference(self):
        """Vectorized scan vs a straightforward scalar recurrence."""
        t = np.arange(1, 31, dtype=np.float64) * 0.04
        x = np.cumsum(rng.normal(size=30))

        min_cutoff, beta, d_cutoff = 1.0, 0.5, 1.0
        # scalar recurrence (the classic one-euro definition)
        import math
        def sf(te, cutoff):
            r = 2 * math.pi * cutoff * te
            return r / (r + 1)
        xp, dxp, tp = x[0], 0.0, t[0]
        expected = [x[0]]
        for i in range(1, 30):
            te = t[i] - tp
            ad = sf(te, d_cutoff)
            dx = (x[i] - xp) / te
            dxh = ad * dx + (1 - ad) * dxp
            cutoff = min_cutoff + beta * abs(dxh)
            a = sf(te, cutoff)
            xh = a * x[i] + (1 - a) * xp
            xp, dxp, tp = xh, dxh, t[i]
            expected.append(xh)

        out = one_euro_filter(jnp.asarray(t), jnp.asarray(x),
                              min_cutoff=min_cutoff, beta=beta,
                              d_cutoff=d_cutoff)
        np.testing.assert_allclose(out, expected, rtol=1e-5)


class TestGridSample:
    def test_matches_torch_grid_sample(self):
        import torch
        import torch.nn.functional as F
        n = 64
        imgs = rng.normal(size=(n, 1, 64, 64)).astype(np.float32)
        grid = (rng.uniform(-1.3, 1.3, size=(n, 1, 1, 2))
                .astype(np.float32))  # include out-of-bounds
        expected = F.grid_sample(torch.tensor(imgs), torch.tensor(grid),
                                 align_corners=True).numpy().reshape(n)
        out = grid_sample_bilinear(jnp.asarray(imgs[:, 0]),
                                   jnp.asarray(grid[:, 0, 0]))
        np.testing.assert_allclose(out, expected, rtol=1e-4, atol=1e-5)

    def test_gradients_flow(self):
        imgs = jnp.asarray(rng.normal(size=(5, 16, 16)).astype(np.float32))

        def loss(g):
            return jnp.sum(grid_sample_bilinear(imgs, g))

        g = jnp.asarray(rng.uniform(-0.9, 0.9, size=(5, 2)).astype(np.float32))
        grads = jax.grad(loss)(g)
        assert grads.shape == (5, 2)
        assert bool(jnp.any(grads != 0))
