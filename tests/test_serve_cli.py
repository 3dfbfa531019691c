"""Serving CLI: one-shot directory sweep through the streaming pipeline."""

import json
import os

import numpy as np
import jax
import jax.numpy as jnp


def test_serve_one_shot(tmp_path, capsys):
    from globalegomocap_tpu.data.synthetic import synthetic_chunk
    from globalegomocap_tpu.data.test_data import save_test_chunk
    from globalegomocap_tpu.models.conv_vae import ConvVAE
    from globalegomocap_tpu.models.checkpoint import save_msgpack
    from globalegomocap_tpu.cli.serve import main

    root = tmp_path / "incoming"
    for s, n in (("seqA", 2), ("seqB", 1)):
        for j in range(n):
            save_test_chunk(
                synthetic_chunk(26, seed=10 * j + hash(s) % 97),
                str(root / s / f"data_start_{26*j}_end_{26*(j+1)}"))
    m = ConvVAE(latent_dim=16, seq_len=10, hidden_dims=(8, 8, 16, 16, 32))
    v = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 10, 45)), False)
    ckpt = str(tmp_path / "prior.msgpack")
    save_msgpack(v, ckpt)

    n = main(["--data_root", str(root), "--local_ckpt", ckpt,
              "--global_ckpt", ckpt, "--latent_dim", "16",
              "--hidden_dims", "8,8,16,16,32", "--solver", "lbfgs_fixed",
              "--save_pose", "true",
              "--out_dir", str(tmp_path / "results")])
    assert n == 2
    lines = [json.loads(line) for line in
             capsys.readouterr().out.strip().splitlines()]
    assert {r["sequence"] for r in lines} == {"seqA", "seqB"}
    by_name = {r["sequence"]: r for r in lines}
    assert by_name["seqA"]["chunks"] == 2
    assert by_name["seqB"]["chunks"] == 1
    assert all("optimized_global_mpjpe" in r for r in lines)
    a = np.load(str(tmp_path / "results" / "seqA" / "optimized.npy"))
    assert a.shape == (2, 26, 15, 3) and np.isfinite(a).all()


def test_serve_unequal_lengths_fallback(tmp_path, capsys):
    """A sequence whose chunks differ in length takes the serial
    per-chunk fallback and still emits a result line."""
    from globalegomocap_tpu.data.synthetic import synthetic_chunk
    from globalegomocap_tpu.data.test_data import save_test_chunk
    from globalegomocap_tpu.models.conv_vae import ConvVAE
    from globalegomocap_tpu.models.checkpoint import save_msgpack
    from globalegomocap_tpu.cli.serve import main

    root = tmp_path / "incoming"
    save_test_chunk(synthetic_chunk(26, seed=1),
                    str(root / "mixed" / "data_start_0_end_26"))
    save_test_chunk(synthetic_chunk(34, seed=2),
                    str(root / "mixed" / "data_start_26_end_60"))
    m = ConvVAE(latent_dim=16, seq_len=10, hidden_dims=(8, 8, 16, 16, 32))
    v = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 10, 45)), False)
    ckpt = str(tmp_path / "prior.msgpack")
    save_msgpack(v, ckpt)

    n = main(["--data_root", str(root), "--local_ckpt", ckpt,
              "--global_ckpt", ckpt, "--latent_dim", "16",
              "--hidden_dims", "8,8,16,16,32", "--solver", "lbfgs_fixed"])
    assert n == 1
    rec = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rec["sequence"] == "mixed" and rec["chunks"] == 2
    assert "optimized_global_mpjpe" in rec


def _mk_prior(tmp_path):
    from globalegomocap_tpu.models.conv_vae import ConvVAE
    from globalegomocap_tpu.models.checkpoint import save_msgpack
    m = ConvVAE(latent_dim=16, seq_len=10, hidden_dims=(8, 8, 16, 16, 32))
    v = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 10, 45)), False)
    ckpt = str(tmp_path / "prior.msgpack")
    save_msgpack(v, ckpt)
    return ckpt


class _StopWatch(Exception):
    pass


def _watch_main(root, ckpt, monkeypatch, extra=()):
    """Run serve main in watch mode with time.sleep patched to raise
    after recording the call, so the infinite loop terminates."""
    import pytest
    import globalegomocap_tpu.cli.serve as serve_mod
    sleeps = []

    def fake_sleep(t):
        sleeps.append(t)
        raise _StopWatch

    monkeypatch.setattr(serve_mod.time, "sleep", fake_sleep)
    with pytest.raises(_StopWatch):
        serve_mod.main(["--data_root", str(root), "--local_ckpt", ckpt,
                        "--global_ckpt", ckpt, "--latent_dim", "16",
                        "--hidden_dims", "8,8,16,16,32",
                        "--solver", "lbfgs_fixed",
                        "--watch_interval", "0.5", *extra])
    return sleeps


def test_serve_watch_emits_in_flight_before_idle(tmp_path, capsys,
                                                 monkeypatch):
    """Watch mode must not hold finished results hostage until the NEXT
    arrival: an idle scan pass drains in-flight work and emits it before
    sleeping (ADVICE r2 medium)."""
    from globalegomocap_tpu.data.synthetic import synthetic_chunk
    from globalegomocap_tpu.data.test_data import save_test_chunk

    root = tmp_path / "incoming"
    save_test_chunk(synthetic_chunk(26, seed=3),
                    str(root / "seqA" / "data_start_0_end_26"))
    sleeps = _watch_main(root, _mk_prior(tmp_path), monkeypatch)
    # pass 1 submits seqA (progress, no sleep); pass 2 is idle: the
    # result must be emitted BEFORE the (patched, raising) sleep.
    assert len(sleeps) == 1
    lines = [json.loads(line) for line in
             capsys.readouterr().out.strip().splitlines()]
    assert any(r.get("sequence") == "seqA" and "windows_per_sec" in r
               for r in lines)


def test_serve_watch_sleeps_on_empty_dirs(tmp_path, capsys, monkeypatch):
    """A subdirectory with no chunk dirs must not busy-spin the scan loop:
    a pass that makes no progress sleeps even though `seqs` is non-empty
    (ADVICE r2 medium)."""
    root = tmp_path / "incoming"
    (root / "not_yet_uploaded").mkdir(parents=True)
    sleeps = _watch_main(root, _mk_prior(tmp_path), monkeypatch)
    assert sleeps == [0.5]
    assert capsys.readouterr().out.strip() == ""


def test_serve_watch_retries_failed_loads(tmp_path, capsys, monkeypatch):
    """A chunk whose pickle fails to load (mid-upload) is retried on later
    scans in watch mode instead of being marked permanently done
    (ADVICE r2 low)."""
    root = tmp_path / "incoming"
    d = root / "uploading" / "data_start_0_end_26"
    d.mkdir(parents=True)
    (d / "test_data.pkl").write_bytes(b"not a pickle")
    sleeps = _watch_main(root, _mk_prior(tmp_path), monkeypatch)
    # load failed but under the retry cap: no error record, loop idles
    assert sleeps == [0.5]
    assert capsys.readouterr().out.strip() == ""


def test_serve_one_shot_emits_load_error(tmp_path, capsys):
    """One-shot mode reports a corrupt sequence immediately."""
    from globalegomocap_tpu.cli.serve import main
    root = tmp_path / "incoming"
    d = root / "corrupt" / "data_start_0_end_26"
    d.mkdir(parents=True)
    (d / "test_data.pkl").write_bytes(b"not a pickle")
    ckpt = _mk_prior(tmp_path)
    n = main(["--data_root", str(root), "--local_ckpt", ckpt,
              "--global_ckpt", ckpt, "--latent_dim", "16",
              "--hidden_dims", "8,8,16,16,32", "--solver", "lbfgs_fixed"])
    assert n == 0
    rec = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rec["sequence"] == "corrupt" and "error" in rec

def test_serve_solver_flags_reach_config(tmp_path, monkeypatch):
    """The serve CLI inherits the optimize parser's solver flags; it must
    actually plumb them into SolverConfig (it silently dropped
    fused_energy/circular_history/unroll/init before round 3)."""
    from globalegomocap_tpu.models.conv_vae import ConvVAE
    from globalegomocap_tpu.models.checkpoint import save_msgpack
    import globalegomocap_tpu.cli.serve as serve_mod

    m = ConvVAE(latent_dim=16, seq_len=10, hidden_dims=(8, 8, 16, 16, 32))
    v = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 10, 45)), False)
    ckpt = str(tmp_path / "prior.msgpack")
    save_msgpack(v, ckpt)

    captured = {}

    class _Capture(Exception):
        pass

    def fake_opt(model, lv, gv, cfg):
        captured["cfg"] = cfg
        raise _Capture

    # serve.main imports SequenceOptimizer from the driver module inside
    # the function body — patch it at its source
    monkeypatch.setattr(
        "globalegomocap_tpu.optimize.driver.SequenceOptimizer", fake_opt)
    root = tmp_path / "incoming"
    root.mkdir()
    try:
        serve_mod.main(["--data_root", str(root), "--local_ckpt", ckpt,
                        "--global_ckpt", ckpt, "--latent_dim", "16",
                        "--hidden_dims", "8,8,16,16,32",
                        "--solver", "lbfgs_fixed", "--fused_probes", "true",
                        "--fused_energy", "true", "--unroll", "5",
                        "--circular_history", "true",
                        "--global_max_iter", "3",
                        "--global_residual", "true",
                        "--global_weight_3d", "1.0",
                        "--init", "sample", "--init_seed", "7"])
    except _Capture:
        pass
    s = captured["cfg"].solver
    assert s.fused_energy and s.fused_probes and s.circular_history
    assert s.unroll == 5 and s.init == "sample" and s.init_seed == 7
    assert s.global_max_iter == 3
    e = captured["cfg"].energy
    assert e.global_residual and e.global_weight_3d == 1.0
