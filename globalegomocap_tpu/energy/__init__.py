"""Energy terms of the latent-space pose optimization."""

from globalegomocap_tpu.energy.terms import (
    pose_energy_3d,
    smooth_acceleration_energy,
    bone_length_energy,
    vae_energy,
    heatmap_energy,
    reprojection_energy,
    soft_smooth_energy,
    EnergyWeights,
    total_energy_from_pose,
)
