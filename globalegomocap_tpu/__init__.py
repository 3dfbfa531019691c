"""GlobalEgoMocap-TPU: a TPU-native (JAX/Flax/Pallas) framework for estimating
egocentric 3D human pose in global space.

Re-designed from scratch for TPU hardware with the capabilities of the
reference implementation of "Estimating Egocentric 3D Human Pose in Global
Space" (Wang et al., ICCV 2021): a two-stage latent-space energy minimization
over a convolutional sequence motion-VAE prior, plus the VAE training
pipeline, evaluation suite, and data-preprocessing ETL.

Key architectural differences from the reference (CUDA/PyTorch, serial):
  * All sliding windows of a sequence (and of all sequences) are optimized in
    ONE vmapped, jit-compiled batched L-BFGS launch instead of a serial
    Python loop over windows.
  * The window axis shards across a `jax.sharding.Mesh` so multi-chip TPU
    slices scale the batch of windows over ICI.
  * The heatmap reprojection energy (fisheye projection + bilinear heatmap
    sampling) is available as a fused Pallas TPU kernel.
  * Evaluation (per-frame Procrustes, sequence Umeyama) runs as batched SVD
    on-device.
"""

__version__ = "0.1.0"
