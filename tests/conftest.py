"""Test configuration: force CPU with 8 virtual devices so multi-chip
sharding paths are exercised without TPU hardware (and without the slow
per-process TPU tunnel handshake).

Note: the environment's sitecustomize registers an `axon` TPU plugin and
overwrites the `jax_platforms` config at interpreter start, so plain
JAX_PLATFORMS=cpu env vars are NOT enough — we must update the config after
importing jax, before any backend is initialized."""

import os
import sys

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: the suite's wall-clock on this 1-core box
# is dominated by serial XLA compiles; caching makes reruns much faster
# (first/cold run is unchanged).  Safe to delete the dir at any time.
try:
    jax.config.update("jax_compilation_cache_dir",
                      "/tmp/jax_test_compile_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:
    pass

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
