"""Offline tooling: preprocessing ETL (SLAM, BVH, heatmap lifting), prior
introspection (sampling, interpolation, latent stats) and mesh export."""
