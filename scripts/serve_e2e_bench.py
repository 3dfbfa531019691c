"""Watch-mode serving measured END-TO-END (VERDICT r4 #5).

serving_bench.json measures the device-pool solve pipeline;
host_ingest_ab.json measured the host-resident staging path in
isolation.  This script measures what a deployment actually runs —
`cli/serve.py` in watch mode over on-disk pkl sequences:

  directory scan -> pickle ingest -> native hostcrop (stage on_host)
  -> StagePrefetcher worker -> flat batched solve -> JSONL emit

with the session-health calibration gate in front (degraded-claim trap),
sequences ARRIVING while the service runs (os.rename into the watch
root), and distinct data per sequence.

Corpus: SE_SEQS sequences x SE_CHUNKS chunks x 100 frames of synthetic
test_data.pkl dirs (cached under /tmp/serve_e2e_data; ~25 MB/chunk on
disk).  The serve CLI runs IN-PROCESS (the TPU session admits one
claimant; a subprocess could not share the calibrated session) with its
emitted JSON lines captured.

Run on the TPU: python scripts/serve_e2e_bench.py
Writes serve_e2e_bench.json.
"""

from __future__ import annotations

import io
import json
import os
import shutil
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main():
    _sleep = os.environ.pop("SERVE_SANITY_SLEEP", None)
    if _sleep:
        time.sleep(float(_sleep))

    import jax
    import jax.numpy as jnp
    import numpy as np

    from _ab_harness import build_prior_pair, production_base
    from globalegomocap_tpu.data.synthetic import synthetic_chunk
    from globalegomocap_tpu.data.test_data import (
        TestChunk, save_test_chunk)
    from globalegomocap_tpu.models.checkpoint import save_msgpack
    from globalegomocap_tpu.optimize.driver import SequenceOptimizer
    from globalegomocap_tpu.optimize.window import num_windows

    n_seqs = int(os.environ.get("SE_SEQS", "8"))
    chunks_per = int(os.environ.get("SE_CHUNKS", "8"))
    data_cache = os.environ.get("SE_DATA", "/tmp/serve_e2e_data")

    # ---- corpus on disk (cached across runs) -----------------------------
    src = os.path.join(data_cache, f"s{n_seqs}_c{chunks_per}")
    if not os.path.isdir(src):
        os.makedirs(src, exist_ok=True)
        for s in range(n_seqs):
            for c in range(chunks_per):
                ch = TestChunk(*synthetic_chunk(100, seed=7_000 * s + c))
                d = os.path.join(src, f"seq_{s:03d}",
                                 f"data_start_{c*100}_end_{(c+1)*100}")
                os.makedirs(d, exist_ok=True)
                save_test_chunk(ch, d)
        print(f"corpus written to {src}", flush=True)

    # random-init priors as msgpack checkpoints (metrics are not the
    # point here; the ingest/solve pipeline is)
    cfg = production_base()
    model, v1, v2 = build_prior_pair(cfg)
    ck = os.path.join(data_cache, "ckpt")
    os.makedirs(ck, exist_ok=True)
    lp, gp = os.path.join(ck, "local.msgpack"), os.path.join(
        ck, "global.msgpack")
    if not os.path.exists(lp):
        save_msgpack(v1, lp)
        save_msgpack(v2, gp)

    # ---- session-health calibration gate (serving_bench's design) --------
    from _ab_harness import session_health_gate
    wins_cal = num_windows(100) * 40
    opt = SequenceOptimizer(model, v1, v2, cfg)
    warm = opt.stage([TestChunk(*(jax.device_put(jnp.asarray(a))
                                  for a in synthetic_chunk(100, seed=i)))
                      for i in range(40)])
    jax.block_until_ready(
        opt.optimize_chunks_batched(warm, mode="flat").optimized)
    gate = session_health_gate(opt, warm, wins_cal, __file__,
                               "serve_e2e")
    del warm

    # ---- watch root + arrival feeder -------------------------------------
    root = os.path.join(data_cache, "watch_root")
    shutil.rmtree(root, ignore_errors=True)
    os.makedirs(root)
    # keep the cached corpus intact: hardlink-copy each sequence into a
    # staging area, then os.rename (atomic arrival) into the watch root
    stagedir = os.path.join(data_cache, "arrivals")
    shutil.rmtree(stagedir, ignore_errors=True)
    os.makedirs(stagedir)
    for s in sorted(os.listdir(src)):
        shutil.copytree(os.path.join(src, s), os.path.join(stagedir, s),
                        copy_function=os.link)

    # a WARMUP sequence (same shapes, distinct name) arrives first and is
    # excluded from the stats: the serve process compiles the c8 solve +
    # metrics programs on it, so the measured sequences see steady state
    # (without this, every sequence queued behind the ~60 s first-shape
    # compile and the aggregate read 5.8 w/s while steady-state
    # per-sequence records showed 80-200)
    warm_name = "_warmup"
    wsrc = os.path.join(stagedir, warm_name)
    os.makedirs(wsrc, exist_ok=True)
    for c in range(chunks_per):
        ch = TestChunk(*synthetic_chunk(100, seed=999_000 + c))
        d = os.path.join(wsrc, f"data_start_{c*100}_end_{(c+1)*100}")
        os.makedirs(d, exist_ok=True)
        save_test_chunk(ch, d)

    t_meas = [None]  # steady-state clock start (set by the feeder)

    def feeder():
        # warmup arrives first; measured sequences are released only once
        # the warmup record has been emitted (compiles done)
        time.sleep(0.5)
        os.rename(wsrc, os.path.join(root, warm_name))
        deadline = time.monotonic() + 600
        while f'"sequence": "{warm_name}"' not in buf.getvalue():
            if time.monotonic() > deadline:
                break  # serve died before warmup emitted; release anyway
            time.sleep(0.2)
        t_meas[0] = time.perf_counter()
        for s in sorted(os.listdir(stagedir)):
            time.sleep(0.1)
            os.rename(os.path.join(stagedir, s), os.path.join(root, s))

    # ---- run the serve CLI in-process, capture its JSONL -----------------
    from globalegomocap_tpu.cli import serve as serve_cli
    buf = io.StringIO()

    class Tee(io.TextIOBase):
        def write(self, txt):
            buf.write(txt)
            sys.__stdout__.write(txt)
            return len(txt)

        def flush(self):
            sys.__stdout__.flush()

    th = threading.Thread(target=feeder, daemon=True)
    argv = ["--data_root", root,
            "--local_ckpt", lp, "--global_ckpt", gp,
            "--watch_interval", "0.2",
            "--max_batches", str(n_seqs + 1),
            "--out_dir", os.path.join(data_cache, "results"),
            "--save_pose", "false"]
    old = sys.stdout
    sys.stdout = Tee()
    try:
        th.start()
        emitted = serve_cli.main(argv)
    finally:
        sys.stdout = old
    wall_end = time.perf_counter()
    th.join(timeout=10)
    if t_meas[0] is None:
        print("serve_e2e: serve exited before the warmup sequence was "
              "emitted — no steady-state window to measure",
              file=sys.stderr, flush=True)
        sys.exit(1)
    total = wall_end - t_meas[0]

    recs = [json.loads(ln) for ln in buf.getvalue().splitlines()
            if ln.startswith("{")]
    seq_recs = [r for r in recs
                if "windows" in r and r["sequence"] != warm_name]
    wins_total = sum(r["windows"] for r in seq_recs)
    lat = sorted(r["latency_ms"] for r in seq_recs)

    def pct(q):
        return lat[min(len(lat) - 1, int(q * len(lat)))] if lat else None

    out = {
        "sequences": n_seqs, "chunks_per_seq": chunks_per,
        "windows_total": wins_total,
        "emitted": emitted,
        **gate,
        "wall_s": round(total, 2),
        "sustained_windows_per_sec": round(wins_total / total, 1),
        "seq_latency_ms_p50": pct(0.50),
        "seq_latency_ms_p95": pct(0.95),
        "seq_latency_ms_max": lat[-1] if lat else None,
        "per_sequence": seq_recs,
        "note": ("end-to-end watch mode: scan + pickle ingest + native "
                 "hostcrop (stage_on_host) + StagePrefetcher + flat "
                 "batched solve + JSONL emit; sequences arrive by "
                 "os.rename while the service polls at 0.2 s; latency "
                 "is submit->complete per sequence (excludes queueing "
                 "before discovery)"),
    }
    print(json.dumps({k: v for k, v in out.items()
                      if k != "per_sequence"}, indent=1), flush=True)
    with open(os.path.join(REPO, "serve_e2e_bench.json"), "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
