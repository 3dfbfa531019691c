"""Minimal on-TPU repro for the heatmap_sample Pallas kernel, to surface
the Mosaic compile error in isolation."""

import os
import sys
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def main():
    from globalegomocap_tpu.ops.pallas.heatmap_sample import (
        heatmap_sample_pallas)
    rng = np.random.default_rng(0)
    maps = jnp.asarray(rng.normal(size=(512, 64, 64)).astype(np.float32))
    pts = jnp.asarray(rng.uniform(-1, 1, size=(512, 2)).astype(np.float32))
    try:
        out = jax.jit(heatmap_sample_pallas)(maps, pts)
        jax.block_until_ready(out)
        print("forward OK", np.asarray(out[:3]))
    except Exception:
        traceback.print_exc()
        return
    try:
        g = jax.grad(lambda p: jnp.sum(heatmap_sample_pallas(maps, p)))(pts)
        jax.block_until_ready(g)
        print("backward OK", np.asarray(g[:2]))
    except Exception:
        traceback.print_exc()


def vmap_case():
    from globalegomocap_tpu.ops.pallas.heatmap_sample import (
        heatmap_sample_pallas)
    rng = np.random.default_rng(1)
    # windows x (T*J) maps — the shape the energy sees under vmap
    maps = jnp.asarray(rng.normal(size=(12, 150, 64, 64)).astype(np.float32))
    pts = jnp.asarray(rng.uniform(-1, 1, size=(12, 150, 2)).astype(np.float32))
    try:
        out = jax.jit(jax.vmap(heatmap_sample_pallas))(maps, pts)
        jax.block_until_ready(out)
        print("vmap forward OK", out.shape)
    except Exception:
        traceback.print_exc()
        return
    try:
        g = jax.grad(lambda p: jnp.sum(
            jax.vmap(heatmap_sample_pallas)(maps, p)))(pts)
        jax.block_until_ready(g)
        print("vmap backward OK", g.shape)
    except Exception:
        traceback.print_exc()


if __name__ == "__main__":
    main()
    vmap_case()
