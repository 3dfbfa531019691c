"""Window-axis sharding: scale ONE sequence chunk across the mesh.

The chunk-axis sharding in `optimize.driver` (shard_map over data-
independent chunks) covers the reference's 5-sequence evaluation workload
but cannot give a SINGLE long sequence more than one chip.  This module
shards the WINDOW axis of one chunk instead — SURVEY.md §5's stated
TPU-native design: windows are data-independent through both optimization
stages (the reference solves them serially, optimizer.py:311-507), and the
only cross-window coupling, the overlap-averaged merge
(reference: optimizer.py:425-437), becomes an `all_gather` over the mesh
followed by the same segment-mean merge every shard computes identically.

Mechanics:
  * windows are edge-padded to a device-count multiple (a sharded axis
    must divide evenly; padding is sliced off after the gather, BEFORE the
    merge, so duplicate windows never bias the overlap means);
  * the two-stage solve runs per-shard under `shard_map` — the Pallas
    mega-kernels are opaque custom calls the SPMD partitioner cannot split,
    so per-shard execution (like the driver's chunk-axis shard_map) is the
    correct structure, and here the collective is real: one tiled
    `all_gather` of the five solved window fields (W x T x 15 x 3 each —
    a few hundred KB, negligible on ICI next to the solve);
  * the merge + final smoothing run replicated on the gathered windows
    inside the same jit program.

Cross-shard equality vs the single-device pipeline is tested on the
8-virtual-device CPU mesh (tests/test_window_shard.py) and exercised at
full size by `__graft_entry__.dryrun_multichip` step 6.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from globalegomocap_tpu.config import OptimizeConfig
from globalegomocap_tpu.models.conv_vae import ConvVAE
from globalegomocap_tpu.ops import fisheye
from globalegomocap_tpu.optimize.pipeline import (
    ChunkResult, WindowFields, merge_window_fields, solve_windows,
    window_chunk_inputs)
from globalegomocap_tpu.parallel.mesh import make_mesh, pad_to_multiple


def optimize_chunk_window_sharded(
        model: ConvVAE, local_variables, global_variables,
        estimated_local, camera_seq, heatmap_seq, gt_seq,
        camera: fisheye.FisheyeParams, cfg: OptimizeConfig,
        mesh=None, origins=None, full_hw=None) -> ChunkResult:
    """One chunk's two-stage solve with the window axis sharded over the
    mesh and the overlap merge fed by an all_gather.

    Same argument contract as `pipeline.optimize_chunk` (raw maps, or
    staged crops via `origins`/`full_hw`), same result — equality with the
    single-device path is bitwise up to XLA reassociation (rtol ~1e-5 at
    f32).  Call under `jax.jit` for production use (the driver method
    `SequenceOptimizer.optimize_chunk_sharded` caches that)."""
    if float(cfg.energy.overlap_consistency) != 0.0:
        raise ValueError(
            "window-sharded solve requires data-independent windows; the "
            "overlap_consistency joint solve couples them — use the "
            "single-device optimize_chunk for joint solving")
    if mesh is None:
        mesh = make_mesh()
    n_dev = mesh.devices.size
    axis = mesh.axis_names[0]

    (win_local, win_cam, win_heat, win_gt, win_bl, win_org,
     full_hw) = window_chunk_inputs(estimated_local, camera_seq,
                                    heatmap_seq, gt_seq, camera, cfg,
                                    origins, full_hw)
    n_win = win_local.shape[0]
    if n_dev == 1:
        fields = solve_windows(model, local_variables, global_variables,
                               win_local, win_cam, win_heat, win_gt,
                               win_bl, camera, cfg, win_org=win_org,
                               full_hw=full_hw)
        return merge_window_fields(fields, cfg)

    # pad the window axis to a device multiple (edge: duplicate solves,
    # sliced off after the gather)
    win_local, _ = pad_to_multiple(win_local, n_dev)
    win_cam, _ = pad_to_multiple(win_cam, n_dev)
    win_heat, _ = pad_to_multiple(win_heat, n_dev)
    win_gt, _ = pad_to_multiple(win_gt, n_dev)
    win_bl, _ = pad_to_multiple(win_bl, n_dev)
    if win_org is not None:
        win_org, _ = pad_to_multiple(win_org, n_dev)

    has_org = win_org is not None

    def shard_body(lv, gv, wl, wc, wh, wg, wbl, *worg):
        fields = solve_windows(model, lv, gv, wl, wc, wh, wg, wbl,
                               camera, cfg,
                               win_org=worg[0] if has_org else None,
                               full_hw=full_hw)
        # THE collective: gather every shard's solved windows so each
        # device holds the full window set for the overlap merge
        # (all_gather + segment-mean — SURVEY §5's merge design)
        return WindowFields(*(
            jax.lax.all_gather(f, axis, axis=0, tiled=True)
            for f in fields))

    specs = [P(), P(), P(axis), P(axis), P(axis), P(axis), P(axis)]
    args = [local_variables, global_variables, win_local, win_cam,
            win_heat, win_gt, win_bl]
    if has_org:
        specs.append(P(axis))
        args.append(win_org)
    gathered = jax.shard_map(
        shard_body, mesh=mesh, in_specs=tuple(specs),
        out_specs=P(), check_vma=False)(*args)

    # slice the padding off BEFORE merging (padded duplicate windows
    # would otherwise bias the overlap segment means)
    fields = WindowFields(*(f[:n_win] for f in gathered))
    return merge_window_fields(fields, cfg)
