"""Pure-jnp geometry and math core: skeleton model, SE(3) transforms,
Procrustes/Umeyama alignment, fisheye camera models, temporal filtering and
bilinear sampling.  Every function is jit/vmap-clean (static shapes, no
Python control flow on traced values)."""

from globalegomocap_tpu.ops.skeleton import (
    KINEMATIC_PARENTS,
    JOINT_NAMES,
    BONE_LINES,
    NUM_JOINTS,
    MEAN3D_MM,
    bone_lengths,
    mean_bone_lengths,
    skeleton_resize,
)
from globalegomocap_tpu.ops.transforms import (
    transform_pose,
    relative_global_pose,
    relative_to_global_pose,
    quat_trans_to_matrix,
    invert_se3,
)
from globalegomocap_tpu.ops.umeyama import umeyama, umeyama_align
from globalegomocap_tpu.ops.filtering import gaussian_filter1d, one_euro_filter
from globalegomocap_tpu.ops.sampling import grid_sample_bilinear
