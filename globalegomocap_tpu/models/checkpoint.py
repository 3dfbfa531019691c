"""Prior checkpoint IO: Orbax directories and flax msgpack files.

Covers the reference's checkpoint surface (save per epoch, load state_dict
for inference; reference: networks/train.py:102-108, optimizer.py:59-60)
plus the resume path it lacks.  Formats:

  * Orbax (directory): the TPU-native production format — async-capable,
    sharding-aware.
  * msgpack (single file): the lightweight format the Trainer writes.
  * torch .pth.tar: read-only via models/torch_convert (released reference
    weights).
"""

from __future__ import annotations

import os
from typing import Any


def save_orbax(variables: Any, path: str):
    """Save {'params', 'batch_stats'} to an Orbax checkpoint directory."""
    import jax
    import orbax.checkpoint as ocp
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.abspath(path), jax.device_get(variables))
    ckptr.wait_until_finished()


def load_orbax(path: str) -> Any:
    import orbax.checkpoint as ocp
    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(os.path.abspath(path))


def save_msgpack(variables: Any, path: str):
    import jax
    from flax import serialization
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(path, "wb") as f:
        f.write(serialization.msgpack_serialize(
            jax.device_get(variables)))


def load_msgpack(path: str) -> Any:
    from flax import serialization
    with open(path, "rb") as f:
        return serialization.msgpack_restore(f.read())


def load_prior_variables(path: str, seq_len: int = 10,
                         hidden_dims=(64, 64, 128, 256, 512)) -> Any:
    """Load prior variables from any supported format, detected by path:
    torch archives by extension, directories as Orbax, files as msgpack."""
    import jax
    import jax.numpy as jnp

    if path.endswith((".pth.tar", ".pth", ".tar", ".pt")):
        from globalegomocap_tpu.models.torch_convert import (
            load_torch_checkpoint)
        v = load_torch_checkpoint(path, seq_len, hidden_dims)
    elif os.path.isdir(path):
        v = load_orbax(path)
    else:
        v = load_msgpack(path)
    if "params" not in v:
        raise ValueError(f"checkpoint at {path} has no 'params'")
    v.setdefault("batch_stats", {})
    return jax.tree_util.tree_map(jnp.asarray, v)
