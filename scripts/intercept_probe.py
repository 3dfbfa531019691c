"""Decompose the ~56 ms in-program fixed cost (intercept) of the flat
two-stage solve program (fixed_cost_probe.json: 129.5 ms program =
1.46 ms x 48 stage-iterations + 56.4 ms intercept at iter1).

Variants at max_iter=1 isolate components by removing them:
  - reproj0:    no heatmap term at all -> no crop extraction, no sampling
  - nosmooth:   final Gaussian smoothing off
  - crop_only:  jitted crop_heatmaps_channels_last on the raw maps alone
  - encode_only: jitted batched encoder forward alone (stage-1 init)

Run on the TPU: python scripts/intercept_probe.py
Writes intercept_probe.json at the repo root.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def timeit(fn, n=5):
    fn()
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main():
    import jax
    import jax.numpy as jnp

    from globalegomocap_tpu.config import (
        OptimizeConfig, PriorConfig, SolverConfig, EnergyConfig,
        with_overrides)
    from globalegomocap_tpu.data.synthetic import synthetic_chunk
    from globalegomocap_tpu.data.test_data import TestChunk
    from globalegomocap_tpu.optimize.driver import (
        SequenceOptimizer, build_model)

    out = {}
    n_chunks = int(os.environ.get("PROBE_CHUNKS", "20"))
    chunks = [synthetic_chunk(100, seed=i) for i in range(n_chunks)]
    chunks = [TestChunk(*(jax.device_put(jnp.asarray(a)) for a in c))
              for c in chunks]

    def solver(**kw):
        kw.setdefault("history_size", 10)
        return SolverConfig(method="lbfgs_fixed", fused_probes=True, **kw)

    base = OptimizeConfig(
        prior=PriorConfig(latent_dim=2048, seq_len=10),
        solver=solver(max_iter=1), sampling_impl="dense", fold_bn=True,
        dense_decoder=True, decoder_impl="shift", heatmap_crop=16)

    model = build_model(base)
    x0 = jnp.zeros((1, 10, 45))
    v1 = model.init(jax.random.PRNGKey(0), x0, False)
    v2 = model.init(jax.random.PRNGKey(1), x0, False)

    def measure(label, cfg):
        opt = SequenceOptimizer(model, v1, v2, cfg)
        staged = opt.stage(chunks)
        def call():
            res = opt.optimize_chunks_batched(staged, mode="flat")
            jax.block_until_ready(res.optimized)
        t0 = time.perf_counter()
        call()
        compile_s = time.perf_counter() - t0
        out[label + "_ms"] = round(1e3 * timeit(call, n=5), 2)
        out[label + "_compile_s"] = round(compile_s, 1)
        print(label, out[label + "_ms"], flush=True)
        with open(os.path.join(REPO, "intercept_probe.json"), "w") as f:
            json.dump(out, f, indent=1)

    measure("iter1_base", base)
    measure("iter1_reproj0", with_overrides(
        base, energy=EnergyConfig(reproj=0.0)))
    measure("iter1_nosmooth", with_overrides(base, final_smooth=False))

    # solver-structure share of the iteration slope: the two-loop
    # recursion + history rolls scale with m, the objective eval doesn't
    measure("iter25_m10", with_overrides(base, solver=solver(max_iter=25)))
    measure("iter25_m1", with_overrides(
        base, solver=solver(max_iter=25, history_size=1)))
    out["two_loop_ms_per_iter_m10_vs_m1"] = round(
        (out["iter25_m10_ms"] - out["iter25_m1_ms"]) / 25.0, 3)

    # isolated pieces
    from globalegomocap_tpu.energy.terms import crop_heatmaps_channels_last
    heat = jnp.stack([c.heatmaps for c in chunks])
    crop_j = jax.jit(lambda h: crop_heatmaps_channels_last(h, 16)[0])
    out["crop_only_ms"] = round(1e3 * timeit(
        lambda: jax.block_until_ready(crop_j(heat)), n=5), 2)

    from globalegomocap_tpu.models.conv_vae import ConvVAE
    from globalegomocap_tpu.optimize.window import slice_windows
    est = jnp.stack([c.estimated_local for c in chunks])
    win = jax.vmap(lambda s: slice_windows(s, 10, 8))(est)
    flat = win.reshape(-1, 10, 45)
    enc = jax.jit(lambda x: model.apply(v1, x, False,
                                        method=ConvVAE.encode))
    out["encode_only_ms"] = round(1e3 * timeit(
        lambda: jax.block_until_ready(enc(flat)), n=5), 2)

    print(json.dumps(out, indent=1), flush=True)
    with open(os.path.join(REPO, "intercept_probe.json"), "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
