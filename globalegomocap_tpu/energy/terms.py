"""Energy terms for the two-stage latent optimization.

Pure functions of the decoded pose window and its context; semantics match
the reference's `BodyPoseOptimizer` energies (reference: optimizer.py:96-240)
term by term.  Everything is written for a single window `(T, 15, 3)` and is
`vmap`-ed across the whole batch of windows by the pipeline — the reference
processes windows serially; here all windows of all sequences evaluate in
one fused device launch.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from globalegomocap_tpu.ops.skeleton import bone_lengths
from globalegomocap_tpu.ops.sampling import (
    grid_sample_bilinear, grid_sample_bilinear_dense)
from globalegomocap_tpu.ops import fisheye


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class EnergyWeights:
    """Weights of the total energy (reference: optimizer.py:73-79, 226-240).

    The reference's driver derives the stage weights from CLI flags
    (optimizer.py:352-358): the global stage gets
    {3d: w3d, smooth: s, bone: 0.01, reproj: 0} and the local stage
    {3d: w3d/1e4, smooth: s/100, bone: b, reproj: r}.
    """
    weight_3d: jnp.ndarray
    smooth: jnp.ndarray
    bone_length: jnp.ndarray
    vae: jnp.ndarray
    reproj: jnp.ndarray
    gmm: jnp.ndarray
    soft_smooth: jnp.ndarray

    @staticmethod
    def create(weight_3d=0.01, smooth=0.001, bone_length=0.01, vae=0.0,
               reproj=0.01, gmm=0.0, soft_smooth=0.0) -> "EnergyWeights":
        f = lambda v: jnp.asarray(v, dtype=jnp.float32)
        return EnergyWeights(f(weight_3d), f(smooth), f(bone_length),
                             f(vae), f(reproj), f(gmm), f(soft_smooth))


def pose_energy_3d(pose: jnp.ndarray, initial_pose: jnp.ndarray) -> jnp.ndarray:
    """Squared distance to the stage's initial pose estimate
    (reference: optimizer.py:210-213)."""
    return jnp.sum(jnp.square(pose - initial_pose))


def smooth_acceleration_energy(pose: jnp.ndarray) -> jnp.ndarray:
    """Sum of squared second temporal differences — acceleration smoothness
    (reference: optimizer.py:202-208).  pose: (T, 15, 3)."""
    velocity = pose[:-1] - pose[1:]
    acceleration = velocity[:-1] - velocity[1:]
    return jnp.sum(jnp.square(acceleration))


def soft_smooth_energy(pose: jnp.ndarray,
                       smoothed_pose: jnp.ndarray) -> jnp.ndarray:
    """Squared distance to a pre-smoothed pose (reference:
    optimizer.py:188-192; inactive in the default pipeline but part of the
    energy library)."""
    return jnp.sum(jnp.square(smoothed_pose - pose))


def bone_length_energy(pose: jnp.ndarray,
                       mean_bone_length: jnp.ndarray) -> jnp.ndarray:
    """Squared deviation of every frame's bone lengths from the sequence's
    mean bone lengths (reference: optimizer.py:172-177).

    pose: (T, 15, 3); mean_bone_length: (15,)."""
    predicted = bone_lengths(pose)  # (T, 15)
    return jnp.sum(jnp.square(predicted - mean_bone_length))


def vae_energy(pose: jnp.ndarray) -> jnp.ndarray:
    """Sum of squares of the decoded pose.  NOTE: the reference applies this
    "vae" regularizer to the decoded pose, not to the latent
    (optimizer.py:238 passes the pose into vae_energy), with default weight
    0; replicated as-is."""
    return jnp.sum(jnp.square(pose))


def camera_matrix_energy(cam_mats: jnp.ndarray,
                         initial_cam_mats: jnp.ndarray) -> jnp.ndarray:
    """Squared deviation from the initial camera matrices
    (reference: optimizer.py:151-157; part of the energy library for
    camera-refinement experiments, not in the default pipeline)."""
    return jnp.sum(jnp.square(cam_mats - initial_cam_mats))


def camera_constraint_energy(cam_mats: jnp.ndarray) -> jnp.ndarray:
    """SO(3)-validity penalty on the rotation blocks: (det R - 1)² plus
    ||R Rᵀ - I||² (reference: optimizer.py:159-170)."""
    rot = cam_mats[..., :3, :3]
    det = jnp.linalg.det(rot)
    e_det = jnp.sum(jnp.square(det - 1.0))
    rrt = jnp.matmul(rot, jnp.swapaxes(rot, -1, -2))
    e_orth = jnp.sum(jnp.square(rrt - jnp.eye(3, dtype=cam_mats.dtype)))
    return e_det + e_orth


def reprojection_energy(pose: jnp.ndarray, initial_pose_2d: jnp.ndarray,
                        camera: fisheye.FisheyeParams) -> jnp.ndarray:
    """Squared 2D distance between projected joints and the initial
    2D estimate (reference: optimizer.py:96-100)."""
    p2d = fisheye.world2camera(camera, pose.reshape(-1, 3))
    return jnp.sum(jnp.square(p2d - initial_pose_2d))


def project_to_heatmap_grid(pose: jnp.ndarray,
                            camera: fisheye.FisheyeParams) -> jnp.ndarray:
    """Project a pose window to normalized heatmap grid coordinates.

    The heatmaps were predicted on the 1024x1024 center crop of the
    1280x1024 fisheye image, so the projected x shifts by -128 and both axes
    normalize by (p - 512)/512 into [-1, 1]
    (reference: optimizer.py:143-144).

    pose: (..., 3) -> (..., 2) in [-1, 1].
    """
    p2d = fisheye.world2camera(camera, pose)
    # x: (x - crop_offset - half)/half, y: (y - half)/half — as one affine
    # op (an .at[...,0].add would lower to a scatter)
    offset = jnp.asarray([128.0 + 512.0, 512.0], p2d.dtype)
    return (p2d - offset) / 512.0


def heatmap_energy(pose: jnp.ndarray, heatmaps: jnp.ndarray,
                   camera: fisheye.FisheyeParams,
                   impl: str = "gather",
                   origins: jnp.ndarray | None = None,
                   full_hw: tuple | None = None) -> jnp.ndarray:
    """Negative sum of heatmap likelihood sampled at the projected joints
    (reference: optimizer.py:139-149 `reprojection_energy_heatmap_fast`).

    pose:     (T, 15, 3) decoded window (camera frame).
    heatmaps: (T, 15, H, W) per-joint score maps (already permuted from the
              stored (T, H, W, 15) layout by the pipeline).  With `origins`
              these are k x k CROPS around each map's peak.
    impl:     'gather' (one 4-tap flat gather) or 'dense' (MXU one-hot
              contraction) or 'pallas' (fused kernel).
    origins:  (T, 15, 2) crop origins (oy, ox) in full-map pixels; requires
              `full_hw` = the uncropped (H, W).  Projected points are mapped
              to full-map pixels then shifted into crop coordinates; points
              outside the crop sample zero (the peak-centered crops carry
              all non-negligible mass, tests/test_heatmap_crop.py).
    """
    t, j = heatmaps.shape[0], heatmaps.shape[1]
    grid = project_to_heatmap_grid(pose.reshape(t * j, 3), camera)
    maps = heatmaps.reshape(t * j, heatmaps.shape[-2], heatmaps.shape[-1])
    if origins is not None:
        from globalegomocap_tpu.ops.sampling import (
            bilinear_sample_pixels, bilinear_dense_pixels)
        fh, fw = full_hw
        org = origins.reshape(t * j, 2)
        ix = (grid[..., 0] + 1.0) * 0.5 * (fw - 1) - org[..., 1]
        iy = (grid[..., 1] + 1.0) * 0.5 * (fh - 1) - org[..., 0]
        pix_sample = (bilinear_dense_pixels if impl == "dense"
                      else bilinear_sample_pixels)
        return -jnp.sum(pix_sample(maps, ix, iy))
    if impl == "pallas":
        from globalegomocap_tpu.ops.pallas.heatmap_sample import (
            heatmap_sample_pallas)
        sample = heatmap_sample_pallas
    elif impl == "dense":
        sample = grid_sample_bilinear_dense
    else:
        sample = grid_sample_bilinear
    return -jnp.sum(sample(maps, grid))


def crop_heatmaps(heatmaps: jnp.ndarray, k: int):
    """Crop each map to the k x k window around its peak.

    The maps are Gaussian blobs (Mo2Cap2-style network output), so a
    peak-centered crop carries all non-negligible probability mass; the
    latent solver only ever samples near the blob.  Cropping shrinks the
    solver's sampling working set (H*W -> k*k) — the sampling gather is the
    dominant eval cost on TPU.  Runs ONCE per launch (loop-invariant),
    outside the solver iteration.

    heatmaps: (..., H, W) -> (crops (..., k, k), origins (..., 2) as
    (oy, ox) float, (H, W)).
    """
    h, w = heatmaps.shape[-2], heatmaps.shape[-1]
    k = min(int(k), h, w)   # a crop can never exceed the map
    flat = heatmaps.reshape(heatmaps.shape[:-2] + (h * w,))
    am = jnp.argmax(flat, axis=-1)
    cy, cx = am // w, am % w
    oy = jnp.clip(cy - k // 2, 0, h - k)
    ox = jnp.clip(cx - k // 2, 0, w - k)
    iy = oy[..., None] + jnp.arange(k)
    rows = jnp.take_along_axis(heatmaps, iy[..., None], axis=-2)
    ix = ox[..., None] + jnp.arange(k)
    crops = jnp.take_along_axis(rows, ix[..., None, :], axis=-1)
    origins = jnp.stack([oy, ox], axis=-1).astype(jnp.float32)
    return crops, origins, (h, w)


def crop_heatmaps_at_centers(heatmaps: jnp.ndarray, k: int,
                             centers: jnp.ndarray):
    """`crop_heatmaps` ((..., H, W) layout) with CALLER-SUPPLIED centers
    (..., 2) as (cy, cx) — see crop_heatmaps_at_centers_channels_last
    for why the guard-trip fast path centers at the projected estimate
    instead of the argmax."""
    h, w = heatmaps.shape[-2], heatmaps.shape[-1]
    k = min(int(k), h, w)
    c = jnp.round(centers).astype(jnp.int32)
    oy = jnp.clip(c[..., 0] - k // 2, 0, h - k)
    ox = jnp.clip(c[..., 1] - k // 2, 0, w - k)
    iy = oy[..., None] + jnp.arange(k)
    rows = jnp.take_along_axis(heatmaps, iy[..., None], axis=-2)
    ix = ox[..., None] + jnp.arange(k)
    crops = jnp.take_along_axis(rows, ix[..., None, :], axis=-1)
    origins = jnp.stack([oy, ox], axis=-1).astype(jnp.float32)
    return crops, origins, (h, w)


def _extract_crops_channels_last(heatmaps: jnp.ndarray, k: int,
                                 oy: jnp.ndarray, ox: jnp.ndarray,
                                 impl: str = "gather"):
    """Extract (..., k, k, J) crops at integer origins (oy, ox) from
    (..., H, W, J) maps — the shared back half of the channels-last crop
    ops, in one of three exactly-equivalent formulations:

      'gather'  two chained take_along_axis (rows (k, W, J) then cols) —
                the original; TPU lowers these gathers poorly.
      'flat'    ONE take_along_axis on the flattened (H*W) axis with
                precomputed k*k flat indices — k/W-fold less gathered
                data and a single gather op.
      'onehot'  row/col one-hot MATMULS (MXU): crops = Oy @ map @ Ox^T
                per joint — no gather at all; ~55 MFLOP/chunk of
                trivially-parallel einsum.

    All three read the same values at the same indices (pure gathers /
    selector products), so staging is bit-exact across impls
    (tests/test_heatmap_crop.py::test_crop_impl_equivalence).  The
    selector einsums pin precision=HIGHEST: at the TPU default matmul
    precision the MXU truncates inputs to bf16, which would silently
    round the f32 crop VALUES and break that contract (the selectors
    are 0/1, so at HIGHEST the products are exact selections).
    """
    h, w = heatmaps.shape[-3], heatmaps.shape[-2]
    if impl == "flat":
        flat = heatmaps.reshape(heatmaps.shape[:-3] + (h * w,)
                                + heatmaps.shape[-1:])
        idx = ((oy[..., None, None, :] + jnp.arange(k)[:, None, None]) * w
               + (ox[..., None, None, :] + jnp.arange(k)[None, :, None]))
        crops = jnp.take_along_axis(
            flat, idx.reshape(idx.shape[:-3] + (k * k,) + idx.shape[-1:]),
            axis=-2)
        return crops.reshape(idx.shape)
    if impl == "onehot":
        # row selector (..., J, k, H), col selector (..., J, k, W)
        ry = oy[..., None] + jnp.arange(k)                  # (..., J, k)
        rx = ox[..., None] + jnp.arange(k)
        eye_h = jnp.eye(h, dtype=heatmaps.dtype)
        eye_w = jnp.eye(w, dtype=heatmaps.dtype)
        sel_y = eye_h[ry]                                   # (..., J, k, H)
        sel_x = eye_w[rx]                                   # (..., J, k, W)
        hi = jax.lax.Precision.HIGHEST
        rows = jnp.einsum("...jkh,...hwj->...jkw", sel_y, heatmaps,
                          precision=hi)
        crops = jnp.einsum("...jkw,...jcw->...jkc", rows, sel_x,
                           precision=hi)
        return jnp.moveaxis(crops, -3, -1)                  # (..., k, k, J)
    iy = oy[..., None, None, :] + jnp.arange(k)[:, None, None]
    rows = jnp.take_along_axis(heatmaps, iy, axis=-3)      # (..., k, W, J)
    ix = ox[..., None, None, :] + jnp.arange(k)[None, :, None]
    return jnp.take_along_axis(rows, ix, axis=-2)          # (..., k, k, J)


def crop_heatmaps_channels_last(heatmaps: jnp.ndarray, k: int,
                                impl: str = "gather",
                                extract_dtype=None):
    """`crop_heatmaps` for the STORAGE layout (..., H, W, J): crop each
    joint's map around its peak WITHOUT first transposing the full-size
    maps to (..., J, H, W).

    This exists for launch-cost reasons: cropping is window-independent
    (a frame's peak crop is the same in every sliding window that contains
    the frame), so the pipeline crops the raw per-frame maps FIRST and
    only then windows/transposes the 16x-smaller crops — the full maps
    are read once (argmax + crop extraction) and never copied.
    fixed_cost_probe.json measured the old window-then-crop order's full-
    map windowing+moveaxis as the bulk of a ~63 ms per-launch intercept.
    `impl` selects the extraction formulation (see
    _extract_crops_channels_last); all impls are bit-exact.

    extract_dtype: when the caller will STORE the crops in a narrower
    dtype anyway (bf16 staged heat), the EXTRACTION input is cast to it
    first — the argmax (and therefore the origins) still runs on the
    full-precision maps, and because extraction is a pure selection,
    extract(cast(map)) == cast(extract(map)) bit-exactly while the
    onehot einsums then run on exactly-representable narrow inputs (no
    HIGHEST multi-pass needed) and the staged write halves.

    heatmaps: (..., H, W, J) -> (crops (..., k, k, J),
    origins (..., J, 2) as (oy, ox) float, (H, W)).
    """
    h, w = heatmaps.shape[-3], heatmaps.shape[-2]
    k = min(int(k), h, w)
    flat = heatmaps.reshape(heatmaps.shape[:-3] + (h * w,)
                            + heatmaps.shape[-1:])
    am = jnp.argmax(flat, axis=-2)                     # (..., J)
    cy, cx = am // w, am % w
    oy = jnp.clip(cy - k // 2, 0, h - k)
    ox = jnp.clip(cx - k // 2, 0, w - k)
    src = heatmaps if extract_dtype is None \
        else heatmaps.astype(extract_dtype)
    crops = _extract_crops_channels_last(src, k, oy, ox, impl)
    origins = jnp.stack([oy, ox], axis=-1).astype(jnp.float32)
    return crops, origins, (h, w)


def crop_heatmaps_at_centers_channels_last(heatmaps: jnp.ndarray, k: int,
                                           centers: jnp.ndarray,
                                           impl: str = "gather",
                                           extract_dtype=None):
    """`crop_heatmaps_channels_last` with CALLER-SUPPLIED crop centers
    instead of the per-map argmax.

    The guard-trip fast path (OptimizeConfig.guard_crop) centers each
    crop at the projected initial pose estimate: on multimodal /
    distractor maps the argmax may sit on the wrong mode, but the latent
    solver only ever samples within a few pixels of the projected
    estimate — so estimate-centered crops preserve exactly the
    neighbourhood the solve reads (reference full-map semantics:
    optimizer.py:139-149 samples 4 texels around the projection) while
    keeping the k*k staged contract of the fused kernel.

    heatmaps: (..., H, W, J); centers: (..., J, 2) float (cy, cx) in
    full-map pixels (any out-of-range values clamp to the map).
    -> (crops (..., k, k, J), origins (..., J, 2) float, (H, W)).
    """
    h, w = heatmaps.shape[-3], heatmaps.shape[-2]
    k = min(int(k), h, w)
    c = jnp.round(centers).astype(jnp.int32)
    oy = jnp.clip(c[..., 0] - k // 2, 0, h - k)            # (..., J)
    ox = jnp.clip(c[..., 1] - k // 2, 0, w - k)
    src = heatmaps if extract_dtype is None \
        else heatmaps.astype(extract_dtype)
    crops = _extract_crops_channels_last(src, k, oy, ox, impl)
    origins = jnp.stack([oy, ox], axis=-1).astype(jnp.float32)
    return crops, origins, (h, w)


def projected_estimate_centers(est_local: jnp.ndarray, camera,
                               h: int, w: int) -> jnp.ndarray:
    """Crop centers for `crop_heatmaps_at_centers_channels_last`: the
    initial local-pose estimates projected into full-map pixels.

    est_local: (..., J, 3) camera-frame estimates -> (..., J, 2) as
    (cy, cx).  Uses the same fisheye projection + grid mapping the energy
    samples with (project_to_heatmap_grid), so center and sample
    coordinates agree exactly.
    """
    lead = est_local.shape[:-1]
    grid = project_to_heatmap_grid(
        est_local.reshape(-1, 3).astype(jnp.float32), camera)
    cx = (grid[:, 0] + 1.0) * 0.5 * (w - 1)
    cy = (grid[:, 1] + 1.0) * 0.5 * (h - 1)
    return jnp.stack([cy, cx], axis=-1).reshape(lead + (2,))


def crop_heatmaps_at_centers_channels_last_np(heatmaps, k: int, centers):
    """Numpy mirror of `crop_heatmaps_at_centers_channels_last` for the
    HOST staging path (stage(on_host=True) with a tripped guard +
    OptimizeConfig.guard_crop).  Bit-exact vs the jax version (pure
    gather at identical rounded/clipped origins).

    heatmaps: (..., H, W, J); centers: (..., J, 2) float (cy, cx).
    -> (crops (..., k, k, J), origins (..., J, 2) float32, (H, W)).
    """
    import numpy as np
    heatmaps = np.asarray(heatmaps)
    h, w = heatmaps.shape[-3], heatmaps.shape[-2]
    k = min(int(k), h, w)
    c = np.round(np.asarray(centers)).astype(np.int64)
    oy = np.clip(c[..., 0] - k // 2, 0, h - k)
    ox = np.clip(c[..., 1] - k // 2, 0, w - k)
    iy = oy[..., None, None, :] + np.arange(k)[:, None, None]
    rows = np.take_along_axis(heatmaps, iy, axis=-3)
    ix = ox[..., None, None, :] + np.arange(k)[None, :, None]
    crops = np.take_along_axis(rows, ix, axis=-2)
    origins = np.stack([oy, ox], axis=-1).astype(np.float32)
    return crops, origins, (h, w)


def crop_heatmaps_channels_last_np(heatmaps, k: int):
    """Numpy mirror of `crop_heatmaps_channels_last` for HOST-side staging.

    Serving ingests host-resident maps (the reference loads test_data.pkl
    on the CPU — reference: optimizer.py:384-390); shipping full maps
    through the slow host->device tunnel only to crop them 16-64x smaller
    on device wastes the serving producer's time.  This mirror lets
    stage(on_host=True) crop BEFORE the transfer, so only (F, k*k*J)
    crops + (F, J, 2) origins cross the tunnel.

    Bit-exact vs the jax version: the crop is a pure gather and
    np.argmax/jnp.argmax share first-max tie-breaking.  Also returns the
    crop-mass coverage ingredients (box mass per map, total mass per map)
    so the host guard costs no extra full-map pass beyond one sum.

    heatmaps: (..., H, W, J) -> (crops (..., k, k, J),
    origins (..., J, 2) float32, (H, W), box (..., J), total (..., J)).
    """
    import numpy as np
    heatmaps = np.asarray(heatmaps)
    h, w = heatmaps.shape[-3], heatmaps.shape[-2]
    k = min(int(k), h, w)
    flat = heatmaps.reshape(heatmaps.shape[:-3] + (h * w,)
                            + heatmaps.shape[-1:])
    am = flat.argmax(axis=-2)                          # (..., J)
    cy, cx = am // w, am % w
    oy = np.clip(cy - k // 2, 0, h - k)
    ox = np.clip(cx - k // 2, 0, w - k)
    iy = oy[..., None, None, :] + np.arange(k)[:, None, None]
    rows = np.take_along_axis(heatmaps, iy, axis=-3)   # (..., k, W, J)
    ix = ox[..., None, None, :] + np.arange(k)[None, :, None]
    crops = np.take_along_axis(rows, ix, axis=-2)      # (..., k, k, J)
    origins = np.stack([oy, ox], axis=-1).astype(np.float32)
    box = np.clip(crops, 0.0, None).sum(axis=(-3, -2), dtype=np.float32)
    total = np.clip(heatmaps, 0.0, None).sum(axis=(-3, -2),
                                             dtype=np.float32)
    return crops, origins, (h, w), box, total


def crop_mass_coverage(heatmaps, k: int):
    """Host-side guard for `crop_heatmaps`: per-map fraction of total
    (non-negative) probability mass retained by the k x k peak-centered
    crop.

    A peak crop is exact for the unimodal Gaussian blobs a Mo2Cap2-style
    network emits, but silently discards secondary modes of multimodal or
    occlusion-flattened maps.  The driver evaluates this ONCE per chunk
    (numpy, host) and falls back to full-map sampling when the mean
    coverage drops below `OptimizeConfig.heatmap_crop_min_mass`.

    heatmaps: array-like (..., H, W).  Returns per-map coverage ratios in
    [0, 1] with shape (prod(leading dims),); maps with zero total mass
    count as fully covered.
    """
    import numpy as np
    m = np.clip(np.asarray(heatmaps, dtype=np.float64), 0.0, None)
    h, w = m.shape[-2], m.shape[-1]
    k = min(int(k), h, w)
    flat = m.reshape(-1, h, w)
    am = flat.reshape(flat.shape[0], -1).argmax(axis=-1)
    cy, cx = am // w, am % w
    oy = np.clip(cy - k // 2, 0, h - k)
    ox = np.clip(cx - k // 2, 0, w - k)
    # integral image -> O(1) box sums
    ii = np.pad(flat, ((0, 0), (1, 0), (1, 0))).cumsum(axis=1).cumsum(axis=2)
    idx = np.arange(flat.shape[0])
    box = (ii[idx, oy + k, ox + k] - ii[idx, oy, ox + k]
           - ii[idx, oy + k, ox] + ii[idx, oy, ox])
    total = ii[:, -1, -1]
    return np.where(total > 0, box / np.maximum(total, 1e-300), 1.0)


def crop_coverage_mean(heatmaps: jnp.ndarray, k: int) -> jnp.ndarray:
    """Device-side guard statistic: MEAN fraction of (non-negative) map
    mass retained by the k x k peak-centered crops.

    Same quantity as `crop_mass_coverage(...).mean()` but computed on
    device (one tiny launch, one scalar readback) so the per-launch guard
    costs microseconds instead of a full host transfer of the heatmap
    stack.  heatmaps: (..., H, W).
    """
    m = jnp.clip(heatmaps.astype(jnp.float32), 0.0, None)
    crops, _, _ = crop_heatmaps(m, k)
    box = jnp.sum(crops, axis=(-2, -1))
    total = jnp.sum(m, axis=(-2, -1))
    ratio = jnp.where(total > 0, box / jnp.maximum(total, 1e-30), 1.0)
    return jnp.mean(ratio)


def overlap_consistency_energy(poses: jnp.ndarray,
                               stride: int) -> jnp.ndarray:
    """Cross-window coupling: adjacent sliding windows must agree on their
    shared frames.

    poses: (W, T, 15, 3) — ALL windows of a chunk (the windows overlap by
    T - stride frames).  No reference equivalent: the reference optimizes
    windows serially and merges by post-hoc averaging
    (optimizer.py:425-437); batching all windows on TPU makes jointly
    optimizing the whole sequence with this term possible.
    """
    t = poses.shape[1]
    overlap = t - stride
    if overlap <= 0 or poses.shape[0] < 2:
        return jnp.asarray(0.0, poses.dtype)
    tail = poses[:-1, stride:]    # last `overlap` frames of window i
    head = poses[1:, :overlap]    # first `overlap` frames of window i+1
    return jnp.sum(jnp.square(tail - head))


def total_energy_from_pose(pose: jnp.ndarray,
                           initial_pose: jnp.ndarray,
                           mean_bone_length: jnp.ndarray,
                           heatmaps: jnp.ndarray,
                           camera: fisheye.FisheyeParams,
                           weights: EnergyWeights,
                           use_reproj: bool,
                           gmm_score_fn=None,
                           sampling_impl: str = "gather",
                           origins: jnp.ndarray | None = None,
                           full_hw: tuple | None = None,
                           smoothed_pose: jnp.ndarray | None = None
                           ) -> jnp.ndarray:
    """The total loss of a stage given an already-decoded pose window
    (reference: optimizer.py:226-240).

    `use_reproj` is a static Python bool: the reference skips the heatmap
    term entirely when its weight is 0 (the global stage), which we mirror
    at trace time so the compiled global-stage program contains no
    projection code at all.
    """
    e = (weights.weight_3d * pose_energy_3d(pose, initial_pose)
         + weights.smooth * smooth_acceleration_energy(pose)
         + weights.bone_length * bone_length_energy(pose, mean_bone_length)
         + weights.vae * vae_energy(pose))
    if smoothed_pose is not None:
        # anchor to the pre-smoothed input window (the reference's
        # soft_smooth_energy with the gaussian_filter1d'ed input,
        # optimizer.py:188-192, 382-383)
        e = e + weights.soft_smooth * soft_smooth_energy(pose,
                                                         smoothed_pose)
    if use_reproj:
        e = e + weights.reproj * heatmap_energy(pose, heatmaps, camera,
                                                sampling_impl, origins,
                                                full_hw)
    if gmm_score_fn is not None:
        # optional GMM pose prior: negative log-likelihood of the window
        # (the reference plumbs --gmm but never adds the term to total_loss,
        # optimizer.py:226-240; here it is available and defaults to 0).
        e = e + weights.gmm * -jnp.sum(gmm_score_fn(pose.reshape(1, -1)))
    return e
