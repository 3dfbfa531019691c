"""15-joint egocentric skeleton model.

Joint order, kinematic tree and bone topology follow the Mo2Cap2 heatmap
convention used throughout the reference implementation
(reference: utils/skeleton.py:16-22).  The mean skeleton constants are the
`mean3D` reference skeleton (reference: utils/fisheye/mean3D.mat), used for
bone-length-normalized evaluation.

All math here is pure jnp, batched over arbitrary leading axes.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

NUM_JOINTS = 15

JOINT_NAMES = (
    "Neck",
    "Right_shoulder", "Right_elbow", "Right_wrist",
    "Left_shoulder", "Left_elbow", "Left_wrist",
    "Right_hip", "Right_knee", "Right_ankle", "Right_foot",
    "Left_hip", "Left_knee", "Left_ankle", "Left_foot",
)

# parent joint index of each joint (joint 0 is its own parent / root)
KINEMATIC_PARENTS = (0, 0, 1, 2, 0, 4, 5, 1, 7, 8, 9, 4, 11, 12, 13)

# bone edges used for rendering / topology checks
BONE_LINES = (
    (0, 1), (0, 4), (1, 2), (2, 3), (4, 5), (5, 6), (1, 7), (4, 11),
    (7, 8), (8, 9), (9, 10), (11, 12), (12, 13), (13, 14), (7, 11),
)

# Mean reference skeleton in millimetres, joints as columns (3, 15), i.e. the
# published `mean3D` calibration constant of the Mo2Cap2 camera rig.
MEAN3D_MM = np.array([
    [6.12454847, 145.97761, 258.72083056, 281.27554815, -130.58758154,
     -217.63663461, -234.47818229, 122.57391072, 157.99031993, 172.09879492,
     215.33356937, -52.15750419, -59.0959752, -36.18717374, -80.10264932],
    [233.90813433, 232.60823975, 188.18493809, 72.79136312, 239.16565076,
     203.68825151, 91.05888921, 239.95855861, 133.01398165, 176.20098748,
     37.42165039, 243.04617535, 149.38252591, 180.44482382, 44.79721165],
    [176.25176082, 220.73112637, 404.39836013, 488.37987609, 232.02432922,
     436.14841643, 529.22255096, 675.05067301, 1019.17833662, 1331.949378,
     1391.75072893, 683.67509016, 1037.58363271, 1353.00767289,
     1407.87463384],
])

_PARENTS = np.asarray(KINEMATIC_PARENTS)


def mean3d_bone_lengths_mm() -> np.ndarray:
    """Bone lengths (mm) of the mean reference skeleton, shape (15,)."""
    mean3d = MEAN3D_MM.T  # (15, 3)
    bones = mean3d - mean3d[_PARENTS, :]
    return np.linalg.norm(bones, axis=1)


def bone_lengths(skeleton: jnp.ndarray) -> jnp.ndarray:
    """Per-bone lengths of a skeleton.

    skeleton: (..., 15, 3) joint positions.
    returns:  (..., 15) distances from each joint to its kinematic parent
              (entry 0 is always 0, the root).

    Mirrors the behaviour of the reference's bone-length computation
    (reference: optimizer.py:89-94).  The norm is zero-safe under
    differentiation: the root bone is identically zero and d|x|/dx at 0 is
    NaN in plain autodiff (torch special-cases this; we must too since the
    bone-length energy is differentiated through this function).
    """
    parents = jnp.asarray(_PARENTS)
    bones = skeleton - jnp.take(skeleton, parents, axis=-2)
    sq = jnp.sum(jnp.square(bones), axis=-1)
    nonzero = sq > 0
    return jnp.sqrt(jnp.where(nonzero, sq, 1.0)) * nonzero


def mean_bone_lengths(skeleton_seq: jnp.ndarray) -> jnp.ndarray:
    """Mean bone lengths over all frames of a sequence.

    skeleton_seq: (..., T, 15, 3) -> (..., 15).
    The reference computes this over the *input sequence's own* estimated
    skeleton (reference: optimizer.py:42-43).
    """
    return jnp.mean(bone_lengths(skeleton_seq), axis=-2)


def skeleton_resize(skeleton: jnp.ndarray,
                    target_bone_lengths: jnp.ndarray,
                    lengths_in_mm: bool = True) -> jnp.ndarray:
    """Renormalize a skeleton's bone lengths while keeping bone directions.

    Walks the kinematic tree root-to-leaf rebuilding each joint at
    `target_bone_length` from its parent along the original bone direction
    (reference semantics: utils/skeleton.py:124-136, which divides by 1000
    because `mean3D.mat` is in millimetres).

    skeleton:             (..., 15, 3)
    target_bone_lengths:  (15,) desired lengths; millimetres when
                          `lengths_in_mm` (matching the reference's
                          `_skeleton_resize` contract), else metres.
    """
    est_bones = skeleton - jnp.take(skeleton, jnp.asarray(_PARENTS), axis=-2)
    est_len = jnp.linalg.norm(est_bones, axis=-1)  # (..., 15)
    scale = jnp.where(est_len > 0, target_bone_lengths / jnp.where(est_len > 0, est_len, 1.0), 0.0)
    # root bone (joint 0) keeps zero offset, exactly like the reference which
    # zeroes the first multiplier.
    scale = scale.at[..., 0].set(0.0)
    divisor = 1000.0 if lengths_in_mm else 1.0
    new_bones = est_bones * scale[..., None] / divisor

    # Rebuild joints root-to-leaf.  The parent list is topologically sorted
    # (parents always precede children), so a static unrolled loop of 15
    # steps suffices; XLA fuses this into a handful of gathers.
    joints = skeleton
    for j in range(NUM_JOINTS):
        p = KINEMATIC_PARENTS[j]
        if j == 0:
            continue
        joints = joints.at[..., j, :].set(joints[..., p, :] + new_bones[..., j, :])
    return joints


def heatmap_argmax(heatmaps: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """2D argmax of joint heatmaps -> pixel coordinates.

    heatmaps: (..., J, H, W)
    returns (coords (..., J, 2) as [x, y] float, maxvals (..., J)).
    Joints whose peak value is <= 0 get zeroed coordinates, matching the
    reference's `get_max_preds` masking (reference: utils/skeleton.py:176-204).
    """
    *lead, j, h, w = heatmaps.shape
    flat = heatmaps.reshape(*lead, j, h * w)
    idx = jnp.argmax(flat, axis=-1)
    maxvals = jnp.max(flat, axis=-1)
    x = (idx % w).astype(jnp.float32)
    y = jnp.floor(idx.astype(jnp.float32) / w)
    coords = jnp.stack([x, y], axis=-1)
    mask = (maxvals > 0.0).astype(jnp.float32)[..., None]
    return coords * mask, maxvals
