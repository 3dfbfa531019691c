"""Host-ingest serving A/B: device staging vs stage(on_host=True).

serving_bench.py keeps its chunk pool DEVICE-resident, so it measures the
steady-state solve pipeline but not the ingest cost.  Real serving ingests
host-resident chunks (the reference loads test_data.pkl on the CPU —
reference: optimizer.py:384-390): every submitted batch must cross the
host->device tunnel.  This A/B keeps the pool in HOST numpy and measures
the full producer cost both ways:

  device arm: submit transfers FULL maps (~25 MB/chunk) through the
              tunnel; the staging program crops on device.
  host arm:   stage(on_host=True) crops in numpy first; only the
              (F, k*k*J) crops + origins cross (~0.4 MB/chunk at k=8).

Run on the TPU: python scripts/host_ingest_ab.py -> host_ingest_ab.json
Envs: AB_BATCHES, AB_ROUNDS, AB_CHUNKS, AB_DEPTH.
"""

from __future__ import annotations

import os
import time

import numpy as np

from _ab_harness import REPO, build_prior_pair, production_base, write_out


def main():
    import jax

    from globalegomocap_tpu.optimize.driver import SequenceOptimizer
    from globalegomocap_tpu.optimize.streaming import StreamingOptimizer
    from globalegomocap_tpu.data.synthetic import synthetic_chunk
    from globalegomocap_tpu.optimize.window import num_windows

    n_batches = int(os.environ.get("AB_BATCHES", "4"))
    n_rounds = int(os.environ.get("AB_ROUNDS", "3"))
    chunks_per = int(os.environ.get("AB_CHUNKS", "40"))
    depth = int(os.environ.get("AB_DEPTH", "3"))

    base = production_base(compute_dtype="float32",  # pre-bf16 artifact
                           history_size=3)
    model, v1, v2 = build_prior_pair(base)
    opt = SequenceOptimizer(model, v1, v2, base)
    wins = num_windows(100) * chunks_per

    # HOST-resident pool (numpy): every submission pays real ingest
    batches = [[synthetic_chunk(100, seed=10_000 * b + i)
                for i in range(chunks_per)]
               for b in range(n_batches)]

    # one-time micro-decomposition of the two staging paths
    t0 = time.perf_counter()
    staged_dev = opt.stage(batches[0])
    jax.block_until_ready(staged_dev.heat)
    dev_stage_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    staged_host = opt.stage(batches[0], on_host=True)
    jax.block_until_ready(staged_host.heat)
    host_stage_s = time.perf_counter() - t0
    same = bool(np.array_equal(np.asarray(staged_dev.heat),
                               np.asarray(staged_host.heat)))
    # warm the solve program
    jax.block_until_ready(
        opt.optimize_chunks_batched(staged_dev, mode="flat").optimized)

    out = {
        "batches": n_batches, "rounds": n_rounds,
        "chunks_per_batch": chunks_per, "windows_per_batch": wins,
        "in_flight_depth": depth,
        "staged_heat_bytes": int(np.asarray(staged_host.heat).nbytes),
        "full_maps_bytes_per_batch": int(sum(
            np.asarray(c.heatmaps).nbytes for c in batches[0])),
        "stage_once_device_s": round(dev_stage_s, 4),
        "stage_once_host_s": round(host_stage_s, 4),
        "staged_heat_identical": same,
        "results": {},
    }

    def pct(sorted_ms, q):
        return round(sorted_ms[min(len(sorted_ms) - 1,
                                   int(q * len(sorted_ms)))], 1)

    for label, on_host in (("device_staging", False),
                           ("host_staging", True)):
        service = StreamingOptimizer(opt, max_in_flight=depth,
                                     stage_on_host=on_host)
        n_subs = n_batches * n_rounds
        submit_ms = []
        t_start = time.perf_counter()
        for b in range(n_subs):
            t0 = time.perf_counter()
            service.submit_batch(batches[b % n_batches])
            submit_ms.append(1e3 * (time.perf_counter() - t0))
        service.drain()
        total = time.perf_counter() - t_start
        sub = sorted(submit_ms)
        out["results"][label] = {
            "sustained_windows_per_sec": round(n_subs * wins / total, 1),
            "total_s": round(total, 3),
            "submit_ms_p50": pct(sub, 0.50),
            "submit_ms_p95": pct(sub, 0.95),
        }
        print(label, out["results"][label], flush=True)

    write_out(out, "host_ingest_ab.json")


if __name__ == "__main__":
    main()
