"""Sustained serving benchmark: a stream of DISTINCT staged batches
through StreamingOptimizer.submit_batch with bounded in-flight depth.

bench.py's pipelined number replays ONE staged batch; this measures the
realistic serving regime — every batch is different data (stage() runs
on the host while the device solves previous batches), with per-batch
completion latencies.

Run on the TPU: python scripts/serving_bench.py
Writes serving_bench.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from globalegomocap_tpu.config import (
        OptimizeConfig, PriorConfig, SolverConfig)
    from globalegomocap_tpu.data.synthetic import synthetic_chunk
    from globalegomocap_tpu.data.test_data import TestChunk
    from globalegomocap_tpu.optimize.driver import (
        SequenceOptimizer, build_model)
    from globalegomocap_tpu.optimize.streaming import StreamingOptimizer
    from globalegomocap_tpu.optimize.window import num_windows

    # 6 x 40-chunk batches ~= 5.9 GB of device-resident raw maps (16 GB
    # HBM); larger streams must rotate buffers
    n_batches = int(os.environ.get("SERVE_BATCHES", "6"))
    chunks_per = int(os.environ.get("SERVE_CHUNKS", "40"))
    depth = int(os.environ.get("SERVE_DEPTH", "3"))

    cfg = OptimizeConfig(
        prior=PriorConfig(latent_dim=2048, seq_len=10),
        solver=SolverConfig(method="lbfgs_fixed", fused_probes=True,
                            history_size=5, max_iter=15,
                            step_candidates=(1.0, 0.1)),
        sampling_impl="dense", fold_bn=True, dense_decoder=True,
        decoder_impl="shift", heatmap_crop=8)
    model = build_model(cfg)
    x0 = jnp.zeros((1, 10, 45))
    v1 = model.init(jax.random.PRNGKey(0), x0, False)
    v2 = model.init(jax.random.PRNGKey(1), x0, False)
    opt = SequenceOptimizer(model, v1, v2, cfg)

    wins_per_batch = num_windows(100) * chunks_per

    def make_batch(b):
        return [TestChunk(*(jax.device_put(jnp.asarray(a))
                            for a in synthetic_chunk(100,
                                                     seed=10_000 * b + i)))
                for i in range(chunks_per)]

    # pre-generate host data; staging itself is part of the serving loop
    batches = [make_batch(b) for b in range(n_batches)]

    # warmup: compile the program once
    warm = opt.stage(batches[0])
    jax.block_until_ready(
        opt.optimize_chunks_batched(warm, mode="flat").optimized)

    service = StreamingOptimizer(opt, max_in_flight=depth)
    lat = []
    t_start = time.perf_counter()
    submit_t = {}
    for b, chunks in enumerate(batches):
        submit_t[b] = time.perf_counter()
        service.submit_batch(chunks)           # stages + dispatches
        while len(service._completed) > len(lat):
            done_idx = len(lat)
            lat.append(time.perf_counter() - submit_t[done_idx])
    service.drain()
    total = time.perf_counter() - t_start
    while len(lat) < n_batches:
        lat.append(total - (submit_t[len(lat)] - t_start))

    lat_ms = sorted(1e3 * x for x in lat)
    out = {
        "batches": n_batches,
        "chunks_per_batch": chunks_per,
        "windows_per_batch": wins_per_batch,
        "in_flight_depth": depth,
        "sustained_windows_per_sec": round(
            n_batches * wins_per_batch / total, 1),
        "total_s": round(total, 3),
        "batch_latency_ms_p50": round(lat_ms[len(lat_ms) // 2], 1),
        "batch_latency_ms_p90": round(
            lat_ms[min(len(lat_ms) - 1, int(0.9 * len(lat_ms)))], 1),
        "batch_latency_ms_max": round(lat_ms[-1], 1),
    }
    print(json.dumps(out, indent=1), flush=True)
    with open(os.path.join(REPO, "serving_bench.json"), "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
