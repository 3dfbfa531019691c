"""IO-path coverage: .mat fixtures through the ETL loader, calibration JSON
loading, the torch .pth.tar loader, and the TensorBoard metric mirror."""

import json
import os

import numpy as np
import jax
import jax.numpy as jnp


def test_load_mat_frames(tmp_path):
    """scipy .mat heatmap/depth files through the reference's dir-scan
    contract (natural-sorted, 'heatmap'/'depth' keys)."""
    from scipy.io import savemat
    from globalegomocap_tpu.tools.process_test_data import load_mat_frames

    hdir = tmp_path / "heatmaps"
    ddir = tmp_path / "depths"
    hdir.mkdir()
    ddir.mkdir()
    rng = np.random.default_rng(0)
    # names that need NATURAL sorting (img-2 < img-10)
    names = [f"img-{i}.mat" for i in (1, 2, 10, 3)]
    for k, n in enumerate(sorted(names, key=lambda s: int(
            s.split("-")[1].split(".")[0]))):
        savemat(hdir / n, {"heatmap": np.full((64, 64, 15), float(k),
                                              dtype=np.float32)})
        savemat(ddir / n, {"depth": np.full((1, 15), float(k),
                                            dtype=np.float32)})
    heat, depth = load_mat_frames(str(hdir), str(ddir), 0, 4)
    assert heat.shape == (4, 64, 64, 15)
    assert depth.shape == (4, 15)
    # natural order preserved: frame k has constant value k
    np.testing.assert_allclose(heat[:, 0, 0, 0], [0, 1, 2, 3])
    np.testing.assert_allclose(depth[:, 0], [0, 1, 2, 3])


def test_load_calibration_json(tmp_path):
    from globalegomocap_tpu.ops import fisheye

    path = tmp_path / "calib.json"
    with open(path, "w") as f:
        json.dump(fisheye.EGOSYN_CALIBRATION, f)
    cam = fisheye.load_calibration(str(path))
    ref = fisheye.default_camera("egosyn")
    np.testing.assert_allclose(np.asarray(cam.center),
                               np.asarray(ref.center))
    np.testing.assert_allclose(np.asarray(cam.poly_w2c),
                               np.asarray(ref.poly_w2c))


def test_load_torch_checkpoint_file(tmp_path):
    """A reference-format .pth.tar on disk loads through the converter."""
    import torch
    from tests.torch_vae_harness import TorchConvVAE
    from globalegomocap_tpu.models.checkpoint import load_prior_variables
    from globalegomocap_tpu.models.conv_vae import ConvVAE

    torch.manual_seed(1)
    hidden = (8, 8, 16, 16, 32)
    tmodel = TorchConvVAE(latent_dim=16, seq_len=10,
                          hidden_dims=hidden).eval()
    path = str(tmp_path / "19.pth.tar")
    torch.save({"epoch": 20, "args": {}, "state_dict": tmodel.state_dict(),
                "eval_result": 0.1, "optimizer": {}}, path)

    v = load_prior_variables(path, seq_len=10, hidden_dims=hidden)
    model = ConvVAE(latent_dim=16, seq_len=10, hidden_dims=hidden)
    z = jnp.zeros((2, 16))
    out = model.apply(v, z, False, method=ConvVAE.decode)
    with torch.no_grad():
        t_out = tmodel.decode(torch.zeros(2, 16)).numpy()
    np.testing.assert_allclose(np.asarray(out), t_out, rtol=1e-4,
                               atol=1e-5)


def test_metric_logger_tensorboard(tmp_path):
    from globalegomocap_tpu.utils.logging import MetricLogger
    lg = MetricLogger(str(tmp_path), tensorboard=True)
    lg.scalar("loss", 0.5, 0)
    lg.close()
    # JSONL always written; TB event files appear when torch is available
    assert os.path.exists(tmp_path / "metrics.jsonl")
    tb_dir = tmp_path / "tensorboard"
    if os.path.isdir(tb_dir):
        assert any("tfevents" in f for f in os.listdir(tb_dir))
