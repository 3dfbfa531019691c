"""bench.py smoke test: the driver runs bench.py on real hardware at
round end — this catches API drift (e.g. a changed jit-cache signature)
on CPU before it can break the official measurement.  Uses a tiny prior
via the BENCH_LATENT/BENCH_HIDDEN test-only knobs."""

import json
import os
import subprocess
import sys

import pytest


@pytest.mark.slow
def test_bench_cpu_smoke(tmp_path):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    driver = tmp_path / "run_bench.py"
    driver.write_text(
        "import jax\n"
        "jax.config.update('jax_platforms', 'cpu')\n"
        "import runpy\n"
        "runpy.run_path(r'%s', run_name='__main__')\n"
        % os.path.join(repo, "bench.py"))
    env = dict(os.environ,
               BENCH_CHUNKS="2", BENCH_LATENT="32",
               BENCH_HIDDEN="8,8,16,16,32", BENCH_MAX_ITER="2",
               BENCH_HISTORY="2", BENCH_PIPELINE_DEPTH="2",
               BENCH_MFU="0", PYTHONPATH=repo)
    out = subprocess.run([sys.executable, str(driver)], env=env,
                         capture_output=True, text=True, timeout=900)
    assert out.returncode == 0, out.stderr[-2000:]
    line = [ln for ln in out.stdout.strip().splitlines()
            if ln.startswith("{")][-1]
    rec = json.loads(line)
    assert rec["metric"] == "two_stage_latent_optimization_throughput"
    assert rec["value"] > 0 and rec["vs_baseline"] > 0
    assert rec["unit"] == "windows/s"
    assert rec["pipelined_windows_per_sec"] > 0
