"""Synthetic data fixtures.

The reference's evaluation data (5 mocap studio sequences) and its trained
VAE checkpoints are external downloads not present in either repo, so the
test-suite and benchmark fixtures are generated: physically-consistent
synthetic sequences where the local pose, SLAM camera trajectory, fisheye
heatmaps and world-frame ground truth all agree by construction, with
controllable estimation noise.  This mirrors the data contracts of
`test_data.pkl` and the AMASS training pkls exactly
(reference: process_test_data.py:149-155; networks/dataset/
global_dataset.py:88-100).
"""

from __future__ import annotations

import numpy as np

from globalegomocap_tpu.data.test_data import TestChunk
from globalegomocap_tpu.ops.skeleton import MEAN3D_MM
from globalegomocap_tpu.ops import fisheye


def _rotz(a):
    c, s = np.cos(a), np.sin(a)
    return np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]])


def _base_local_pose() -> np.ndarray:
    """The mean skeleton in metres, expressed in a head-camera frame
    (z = depth below the cap camera) — the reference's local-pose frame."""
    return (MEAN3D_MM.T / 1000.0).astype(np.float64)  # (15, 3)


def synthetic_motion(n_frames: int, seed: int = 0,
                     motion_scale: float = 0.05,
                     freq_range: tuple = (0.3, 1.2)) -> np.ndarray:
    """(N, 15, 3) smooth local-pose motion around the mean skeleton:
    superposed sinusoids with per-joint phase, plus slow breathing sway.
    freq_range widens for faster/jerkier regimes (corpus v2)."""
    rng = np.random.default_rng(seed)
    base = _base_local_pose()
    t = np.arange(n_frames)[:, None, None] / 25.0  # seconds at 25 fps
    freq = rng.uniform(*freq_range, size=(1, 15, 3))
    phase = rng.uniform(0, 2 * np.pi, size=(1, 15, 3))
    amp = rng.uniform(0.2, 1.0, size=(1, 15, 3)) * motion_scale
    wobble = amp * np.sin(2 * np.pi * freq * t + phase)
    sway = 0.01 * np.sin(2 * np.pi * 0.25 * t[:, :, :1])
    return base[None] + wobble + sway


def synthetic_motion_contacts(n_frames: int, seed: int = 0,
                              motion_scale: float = 0.06,
                              step_period: int = 10,
                              impact_scale: float = 0.035,
                              decay: float = 4.0) -> np.ndarray:
    """(N, 15, 3) DISCONTINUOUS-CONTACT motion: the smooth sinusoidal
    carrier plus (a) a triangle-wave whole-body bob whose velocity flips
    sign at every footstrike (C0 but not C1) and (b) an exponentially
    decaying random per-joint impact transient launched at each contact
    frame — steps and impacts, the regime superposed sinusoids cannot
    represent (VERDICT r3: fast-tier findings were corpus-shape-dependent
    on smooth motion; the reference's studio sequences contain real
    contacts, reference: README.md:29-34).

    step_period is in frames (10 ≈ 2.5 steps/s at 25 fps).
    """
    rng = np.random.default_rng(seed + 13)
    out = synthetic_motion(n_frames, seed, motion_scale=motion_scale)
    t = np.arange(n_frames)
    phase = (t % step_period) / step_period
    # triangle wave: |velocity| constant, sign flips at contact + apex
    bob = impact_scale * (1.0 - 2.0 * np.abs(phase - 0.5))
    out[:, :, 2] += bob[:, None]          # z = depth below the head cam
    contacts = np.nonzero(np.diff(phase) < 0)[0] + 1
    for c in contacts:
        kick = rng.normal(scale=impact_scale, size=(15, 3))
        env = np.exp(-decay * np.arange(n_frames - c) / step_period)
        out[c:] += kick[None] * env[:, None, None]
    return out


def dropout_heatmaps(maps: np.ndarray, seed: int = 0,
                     rate: float = 0.2, min_run: int = 5,
                     max_run: int = 20,
                     floor: float = 0.01) -> np.ndarray:
    """Occlusion DROPOUT of (N, H, W, J) heatmaps: contiguous per-joint
    runs of frames where the joint's map VANISHES entirely (uniform
    background floor, no peak at all) — a joint leaving the fisheye
    frustum or fully occluded, as opposed to `degrade_heatmaps`'
    flattening (which keeps a damped peak the argmax can still find).

    rate ~ expected fraction of (frame, joint) cells dropped; runs are
    uniform(min_run, max_run) frames.  The floor keeps total map mass
    positive so the crop-mass guard sees the dropout (a crop of a
    uniform map holds ~k^2/(H*W) of its mass).
    """
    rng = np.random.default_rng(seed + 17)
    n, h, w, j = maps.shape
    out = maps.copy()
    mean_run = 0.5 * (min_run + max_run)
    p_start = min(1.0, rate / mean_run)
    for k in range(j):
        i = 0
        while i < n:
            if rng.random() < p_start:
                run = int(rng.integers(min_run, max_run + 1))
                out[i:i + run, :, :, k] = floor
                i += run
            else:
                i += 1
    return out.astype(np.float32)


def synthetic_camera_trajectory(n_frames: int, seed: int = 0
                                ) -> np.ndarray:
    """(N, 4, 4) smooth cam->world trajectory: walking arc with slow yaw."""
    rng = np.random.default_rng(seed + 1)
    t = np.arange(n_frames) / 25.0
    speed = rng.uniform(0.5, 1.0)
    radius = rng.uniform(3.0, 6.0)
    ang = speed * t / radius
    pos = np.stack([radius * np.sin(ang),
                    radius * (1 - np.cos(ang)),
                    1.6 + 0.03 * np.sin(2 * np.pi * 1.4 * t)], axis=1)
    mats = np.tile(np.eye(4), (n_frames, 1, 1))
    for i in range(n_frames):
        mats[i, :3, :3] = _rotz(ang[i] + 0.05 * np.sin(2 * np.pi * 0.3 * t[i]))
        mats[i, :3, 3] = pos[i]
    return mats


def perturb_camera_trajectory(cams: np.ndarray, seed: int = 0,
                              drift_rot: float = 0.03,
                              drift_trans: float = 0.05,
                              jitter_rot: float = 0.008,
                              jitter_trans: float = 0.008) -> np.ndarray:
    """SLAM-like trajectory error: a low-frequency random-walk drift plus
    per-frame jitter, the error structure of the reference's OpenVSLAM
    input (reference: slam_reader.py:81-117 recovers only a global scale —
    drift and jitter remain in the camera matrices the optimizer consumes).

    Rotation error is applied about the CURRENT camera centre (reorients
    the camera without translating it), translation error is additive, so
    `drift_*`/`jitter_*` are directly the end-of-sequence / per-frame
    error magnitudes in radians / metres.  The GLOBAL-stage prior is what
    corrects this error class; with exact cameras stage 2 has nothing to
    fix (stage2_experiment.json).
    """
    rng = np.random.default_rng(seed + 7)
    n = len(cams)
    walk = lambda scale, shape: np.cumsum(  # noqa: E731
        rng.normal(scale=scale / np.sqrt(max(n, 1)), size=shape), axis=0)
    yaw = walk(drift_rot, n) + rng.normal(scale=jitter_rot, size=n)
    tilt = walk(drift_rot / 2, n) + rng.normal(scale=jitter_rot, size=n)
    dt = walk(drift_trans, (n, 3)) + rng.normal(scale=jitter_trans,
                                                size=(n, 3))
    out = cams.copy()
    for i in range(n):
        cx, sx = np.cos(tilt[i]), np.sin(tilt[i])
        rx = np.array([[1, 0, 0], [0, cx, -sx], [0, sx, cx]])
        err = _rotz(yaw[i]) @ rx
        out[i, :3, :3] = err @ cams[i, :3, :3]
        out[i, :3, 3] = cams[i, :3, 3] + dt[i]
    return out


def render_heatmaps(local_pose: np.ndarray,
                    camera: fisheye.FisheyeParams | None = None,
                    size: int = 64, sigma_px: float = 1.5,
                    ) -> np.ndarray:
    """Render per-joint Gaussian heatmaps on the 64x64 grid of the
    1024x1024 fisheye center crop, matching the geometry the optimizer's
    heatmap energy assumes (x - 128, /16 downscale;
    reference: optimizer.py:133-134, skeleton.py:87-88)."""
    import jax.numpy as jnp

    if camera is None:
        camera = fisheye.default_camera("egosyn")
    n, j = local_pose.shape[0], local_pose.shape[1]
    p2d = np.asarray(fisheye.world2camera(
        camera, jnp.asarray(local_pose.reshape(-1, 3))))  # full-image px
    hx = (p2d[:, 0] - 128.0) / 16.0
    hy = p2d[:, 1] / 16.0
    grid = np.arange(size)
    gx = grid[None, None, :]  # (1, 1, S)
    gy = grid[None, :, None]  # (1, S, 1)
    d2 = ((gx - hx[:, None, None]) ** 2 + (gy - hy[:, None, None]) ** 2)
    maps = np.exp(-d2 / (2 * sigma_px ** 2)).astype(np.float32)
    return maps.reshape(n, j, size, size).transpose(0, 2, 3, 1)  # (N,H,W,J)


def degrade_heatmaps(maps: np.ndarray, seed: int = 0,
                     occlusion_prob: float = 0.15,
                     distractor_prob: float = 0.15,
                     distractor_sigma: float = 2.5,
                     floor: float = 0.02) -> np.ndarray:
    """Mo2Cap2-failure-mode degradation of (N, H, W, J) heatmaps:

    - occlusion: with `occlusion_prob` per (frame, joint) the map is
      flattened toward uniform (peak mass collapses — the regime the
      crop-mass guard exists for, energy/terms.py crop guard);
    - multimodal: with `distractor_prob` a second Gaussian of comparable
      mass appears at a random location (detector ambiguity);
    - a uniform score floor everywhere (background response).

    Returns a new array; peaks of unaffected maps are unchanged, so the
    reprojection energy keeps real signal on most joints.
    """
    rng = np.random.default_rng(seed + 3)
    n, h, w, j = maps.shape
    out = maps.copy()
    occl = rng.random((n, j)) < occlusion_prob
    distract = rng.random((n, j)) < distractor_prob
    cx = rng.uniform(4, w - 4, size=(n, j))
    cy = rng.uniform(4, h - 4, size=(n, j))
    gy = np.arange(h)[:, None]
    gx = np.arange(w)[None, :]
    for i in range(n):
        for k in range(j):
            if occl[i, k]:
                out[i, :, :, k] = 0.05 * out[i, :, :, k] + floor
            if distract[i, k]:
                d2 = ((gx - cx[i, k]) ** 2 + (gy - cy[i, k]) ** 2)
                out[i, :, :, k] += 0.9 * np.exp(
                    -d2 / (2 * distractor_sigma ** 2))
    return (out + floor).astype(np.float32)


def synthetic_chunk(n_frames: int = 100, seed: int = 0,
                    noise_std: float = 0.03,
                    camera: fisheye.FisheyeParams | None = None,
                    cam_noise: dict | None = None,
                    degrade: dict | None = None,
                    motion_scale: float = 0.05,
                    freq_range: tuple = (0.3, 1.2),
                    motion: np.ndarray | None = None,
                    heat_transform=None) -> TestChunk:
    """A full synthetic test chunk in the test_data.pkl contract.

    Ground truth = TRUE camera trajectory ∘ true local pose; the estimated
    local pose is the truth plus white noise (mimicking per-frame network
    estimation error); heatmaps peak at the TRUE projections so the
    reprojection energy carries real signal.

    cam_noise: kwargs for `perturb_camera_trajectory` ({} for defaults,
    None for exact cameras).  When set, `camera_poses` and the estimated
    global skeletons carry SLAM-like drift+jitter while `gt_global` stays
    in the true frame — the reference's real data regime
    (process_test_data.py:28-35 composes estimated poses through the
    NOISY SLAM trajectory; GT comes from the mocap system).
    degrade: kwargs for `degrade_heatmaps` ({} for defaults, None off).
    motion_scale/freq_range: passed to `synthetic_motion`.
    motion: pre-computed (N, 15, 3) true local motion (overrides
    synthetic_motion — the v3 contact corpus passes
    synthetic_motion_contacts output).
    heat_transform: callable (maps, seed) -> maps applied AFTER degrade
    (the v3 corpus passes dropout_heatmaps).
    """
    rng = np.random.default_rng(seed + 2)
    local_true = (motion if motion is not None else
                  synthetic_motion(n_frames, seed,
                                   motion_scale=motion_scale,
                                   freq_range=freq_range))
    cams_true = synthetic_camera_trajectory(n_frames, seed)
    cams = (cams_true if cam_noise is None
            else perturb_camera_trajectory(cams_true, seed, **cam_noise))

    homo = np.concatenate(
        [local_true, np.ones((n_frames, 15, 1))], axis=2)
    gt_global = np.einsum("nij,nkj->nki", cams_true, homo)[:, :, :3]

    noise = rng.normal(scale=noise_std, size=local_true.shape)
    est_local = (local_true + noise).astype(np.float32)
    est_global = np.einsum(
        "nij,nkj->nki", cams,
        np.concatenate([est_local, np.ones((n_frames, 15, 1))], axis=2)
    )[:, :, :3]

    heat = render_heatmaps(local_true, camera)
    if degrade is not None:
        heat = degrade_heatmaps(heat, seed, **degrade)
    if heat_transform is not None:
        heat = heat_transform(heat, seed)
    return TestChunk(
        estimated_local=est_local.astype(np.float32),
        estimated_global=est_global.astype(np.float32),
        gt_global=gt_global.astype(np.float32),
        camera_poses=cams.astype(np.float32),
        heatmaps=heat,
    )


def synthetic_amass(n_sequences: int = 12, frames_per_seq: int = 300,
                    frame_rate: int = 25, seed: int = 0,
                    motion_scale: float = 0.08,
                    freq_range: tuple = (0.3, 1.2),
                    motion_fn=None) -> list[dict]:
    """Synthetic AMASS-style training pkls: dicts with `local_pose_list`
    (N, 15, 3), `cam_list` ({'loc','rot'} per frame) and `frame_rate`
    (reference contract: networks/dataset/global_dataset.py:88-100).
    motion_scale/freq_range select the motion regime (v2 corpus: 0.10 /
    (0.5, 2.5) — a prior must be trained on statistics matching its
    deployment, like the reference's real-AMASS prior for real motion).
    motion_fn: (n_frames, seed) -> (N, 15, 3) overrides the sinusoidal
    generator entirely (the v3 contact corpus passes
    synthetic_motion_contacts)."""
    from scipy.spatial.transform import Rotation

    out = []
    for s in range(n_sequences):
        local = (motion_fn(frames_per_seq, seed + 10 * s)
                 if motion_fn is not None else
                 synthetic_motion(frames_per_seq, seed + 10 * s,
                                  motion_scale=motion_scale,
                                  freq_range=freq_range))
        cams = synthetic_camera_trajectory(frames_per_seq, seed + 10 * s)
        cam_list = []
        for i in range(frames_per_seq):
            cam_list.append({
                "loc": cams[i, :3, 3],
                "rot": Rotation.from_matrix(cams[i, :3, :3]).as_quat(),
            })
        out.append({
            "local_pose_list": local.astype(np.float32),
            "cam_list": cam_list,
            "frame_rate": frame_rate,
        })
    return out


def synthetic_chunk_v2(n_frames: int = 100, seed: int = 0,
                       noise_std: float = 0.03,
                       camera: fisheye.FisheyeParams | None = None
                       ) -> TestChunk:
    """The SECOND evaluation regime (quality-robustness corpus): faster,
    jerkier motion (2x amplitude, up to 2.5 Hz components), SLAM-like
    camera drift+jitter, and Mo2Cap2-failure-mode heatmaps (occlusion
    flattening + multimodal distractors + background floor).

    Quality defaults tuned on the v1 corpus (iter15/m5/K2/crop8 —
    quality_iter_crop*.json) must be re-validated here; the reference's
    five REAL sequences span exactly this kind of diversity
    (reference: README.md:29-34).
    """
    return synthetic_chunk(n_frames, seed, noise_std=noise_std,
                           camera=camera,
                           cam_noise={},        # drift+jitter defaults
                           degrade={},          # occlusion+distractors
                           motion_scale=0.10,
                           freq_range=(0.5, 2.5))


def synthetic_chunk_v3(n_frames: int = 100, seed: int = 0,
                       noise_std: float = 0.03,
                       camera: fisheye.FisheyeParams | None = None
                       ) -> TestChunk:
    """The THIRD evaluation regime (VERDICT r3 #6 — fast-tier de-risk):
    discontinuous-contact motion (footstrike bob + impact transients,
    `synthetic_motion_contacts`) and heatmap occlusion DROPOUT (joints
    vanishing to a uniform floor for contiguous runs, `dropout_heatmaps`
    — not the flattened-but-peaked maps of v2), over jitter-only camera
    noise (the error class the optimizer can actually fix; drift is
    unobservable without loop closure).

    What it probes that v1/v2 cannot: the smooth prior + fast tier
    against velocity discontinuities, and the crop path against maps
    with NO usable mode at all (the dropout floor pulls crop-mass
    coverage down, so the guard should trip and restore the robust
    tier).  Reference bar: the studio sequences' real failure modes
    (reference: README.md:29-34).
    """
    motion = synthetic_motion_contacts(n_frames, seed)
    return synthetic_chunk(
        n_frames, seed, noise_std=noise_std, camera=camera,
        cam_noise={"drift_rot": 0.0, "drift_trans": 0.0,
                   "jitter_rot": 0.008, "jitter_trans": 0.008},
        motion=motion,
        heat_transform=lambda m, s: dropout_heatmaps(m, s))
