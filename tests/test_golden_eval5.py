"""Golden 5-sequence evaluation artifact (VERDICT r1 item 9).

Runs the `cli.evaluate_all` surface — the rebuild of the reference's
five-sequence benchmark loop (reference: optimize_whole_sequence.py:90-117,
README.md:29-34) — on a FIXED synthetic dataset with a FIXED tiny prior and
compares the 17-metric overall averages against the committed golden, so
quality regressions surface as numeric diffs.

Delete tests/golden/eval5_metrics.npz to regenerate intentionally.
"""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

GOLDEN = os.path.join(os.path.dirname(__file__), "golden",
                      "eval5_metrics.npz")


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    from globalegomocap_tpu.data.synthetic import synthetic_chunk
    from globalegomocap_tpu.data.test_data import save_test_chunk
    from globalegomocap_tpu.models.checkpoint import save_msgpack
    from globalegomocap_tpu.models.conv_vae import ConvVAE

    root = tmp_path_factory.mktemp("eval5")
    for i in range(5):
        save_test_chunk(
            synthetic_chunk(n_frames=26, seed=100 + i),
            str(root / f"seq-{i}" / "data_start_0_end_26"))

    model = ConvVAE(latent_dim=16, seq_len=10, hidden_dims=(8, 8, 16, 16, 32))
    v = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 10, 45)), False)
    ckpt = str(root / "prior.msgpack")
    save_msgpack(v, ckpt)
    return str(root), ckpt


def test_eval5_matches_golden(dataset, capsys):
    from globalegomocap_tpu.cli.evaluate_all import main

    root, ckpt = dataset
    per_seq = main([
        "--data_root", root, "--local_ckpt", ckpt, "--global_ckpt", ckpt,
        "--latent_dim", "16", "--hidden_dims", "8,8,16,16,32",
        "--solver", "lbfgs_fixed", "--fold_bn", "true",
        "--dense_decoder", "true",
    ])
    out = capsys.readouterr().out
    assert "overall averages" in out
    assert len(per_seq) == 5

    keys = sorted(next(iter(per_seq.values())).keys())
    overall = {k: np.mean([np.asarray(v[k]) for v in per_seq.values()],
                          axis=0) for k in keys}

    if not os.path.exists(GOLDEN):
        np.savez(GOLDEN, **overall)
        pytest.skip("golden regenerated — rerun to compare")

    golden = np.load(GOLDEN)
    assert sorted(golden.files) == keys
    for k in keys:
        np.testing.assert_allclose(
            overall[k], golden[k], rtol=2e-3, atol=1e-5,
            err_msg=f"metric {k} drifted from the committed golden")
