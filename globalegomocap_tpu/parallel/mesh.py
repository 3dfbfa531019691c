"""Device mesh and sharding helpers.

The reference has no parallelism at all (SURVEY.md §2.4: single device,
serial windows).  The TPU-native scaling axes are:

  * training: data parallelism — the batch axis sharded over a 1-D 'dp'
    mesh, XLA inserting the gradient all-reduce over ICI;
  * optimization: window parallelism — the batch-of-windows axis sharded
    the same way (windows are data-independent; the only coupling, the
    overlap-averaged merge, happens after gathering).

Both use one mesh axis name, 'dp'.  All helpers degrade gracefully to a
single device.  Two optimization sharding structures build on these
helpers: the driver's chunk-axis shard_map (many sequences, collective-
free) and window_shard.optimize_chunk_window_sharded (ONE long sequence:
per-shard two-stage solve + a tiled all_gather feeding the overlap
merge).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int | None = None, axis: str = "dp") -> Mesh:
    """1-D mesh over the first `n_devices` devices (default: all)."""
    devices = jax.devices()
    if n_devices:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis,))


def replicate(mesh: Mesh):
    """Sharding that replicates a pytree on every device of the mesh."""
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, axis: str = "dp"):
    """Sharding that splits axis 0 (the batch / window axis)."""
    return NamedSharding(mesh, P(axis))


def window_sharding(mesh: Mesh, axis: str = "dp"):
    """Alias expressing intent for the optimizer's window axis."""
    return shard_batch(mesh, axis)


def pad_to_multiple(x, multiple: int, axis: int = 0):
    """Pad axis to a device-count multiple (returns padded array and the
    original length).  Needed because a sharded axis must divide evenly."""
    import jax.numpy as jnp
    n = x.shape[axis]
    rem = (-n) % multiple
    if rem == 0:
        return x, n
    pad = [(0, 0)] * x.ndim
    pad[axis] = (0, rem)
    return jnp.pad(x, pad, mode="edge"), n
