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
