"""Measure the reference-equivalent baseline: serial per-window two-stage
torch L-BFGS optimization (the reference's execution model,
optimizer.py:370-419) on the same synthetic data and full-size prior the
TPU benchmark uses.  Writes baseline_torch.json with windows/sec.

This reimplements the reference's algorithm from its documented semantics
(energies, weights, LBFGS hyperparameters) with torch on CPU — the only
torch device in this environment; the reference itself would use one GPU if
available (optimizer.py:39).

Usage: python scripts/measure_torch_baseline.py [n_windows]
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np
import torch

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))

from torch_vae_harness import TorchConvVAE  # noqa: E402

KINEMATIC_PARENTS = [0, 0, 1, 2, 0, 4, 5, 1, 7, 8, 9, 4, 11, 12, 13]


class FisheyeTorch:
    """Calibrated fisheye projection (torch) from the built-in constants."""

    def __init__(self):
        from globalegomocap_tpu.ops.fisheye import EGOSYN_CALIBRATION as C
        self.center = torch.tensor([C["intrinsic"][0][2],
                                    C["intrinsic"][1][2]])
        self.w2c = torch.tensor(C["polynomialW2C"])

    def world2camera(self, p):  # (N, 3) -> (N, 2)
        x, y, z = p[:, 0], p[:, 1], -p[:, 2]
        norm = torch.sqrt(x * x + y * y).clamp_min(1e-9)
        theta = torch.atan(z / norm)
        rho = torch.zeros_like(theta)
        for c in reversed(self.w2c):
            rho = rho * theta + c
        return torch.stack([x / norm * rho + self.center[0],
                            y / norm * rho + self.center[1]], dim=1)


def total_loss(pose, anchor, mean_bl, heat, cam, w3d, ws, wb, wr):
    e3d = torch.sum((pose - anchor) ** 2)
    vel = pose[1:] - pose[:-1]
    acc = vel[1:] - vel[:-1]
    es = torch.sum(acc ** 2)
    bones = pose - pose[:, KINEMATIC_PARENTS, :]
    bl = torch.norm(bones, dim=-1)
    eb = torch.sum((bl - mean_bl) ** 2)
    loss = w3d * e3d + ws * es + wb * eb
    if wr:
        p2d = cam.world2camera(pose.reshape(-1, 3))
        p2d = torch.stack([p2d[:, 0] - 128.0, p2d[:, 1]], dim=1)
        grid = ((p2d - 512.0) / 512.0).view(-1, 1, 1, 2)
        maps = heat.reshape(-1, 1, heat.shape[-2], heat.shape[-1])
        sampled = torch.nn.functional.grid_sample(maps, grid,
                                                  align_corners=True)
        loss = loss + wr * -torch.sum(sampled)
    return loss


def optimize_window(model, anchor, mean_bl, heat, cam, w3d, ws, wb, wr):
    with torch.no_grad():
        mu, _ = model.encode(anchor.reshape(1, 10, 45))
    z = torch.nn.Parameter(mu.clone())
    opt = torch.optim.LBFGS([z], lr=2.0, max_iter=25,
                            tolerance_change=1e-6,
                            line_search_fn="strong_wolfe")

    def closure():
        opt.zero_grad()
        pose = model.decode(z).reshape(10, 15, 3)
        loss = total_loss(pose, anchor, mean_bl, heat, cam, w3d, ws, wb, wr)
        loss.backward()
        return loss

    opt.step(closure)
    with torch.no_grad():
        return model.decode(z).reshape(10, 15, 3)


def main():
    n_windows = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    torch.manual_seed(0)
    torch.set_num_threads(os.cpu_count())

    from globalegomocap_tpu.data.synthetic import synthetic_chunk
    chunk = synthetic_chunk(n_frames=10 + 8 * (n_windows - 1), seed=0)

    model = TorchConvVAE(latent_dim=2048, seq_len=10).eval()
    cam = FisheyeTorch()

    est = torch.tensor(chunk.estimated_local)
    heat = torch.tensor(chunk.heatmaps).permute(0, 3, 1, 2)  # (N,15,H,W)
    cams = torch.tensor(chunk.camera_poses)
    bones = est - est[:, KINEMATIC_PARENTS, :]
    mean_bl = torch.norm(bones, dim=-1).mean(0)

    # warmup one window (thread pools, allocator)
    optimize_window(model, est[0:10], mean_bl, heat[0:10], cam,
                    0.01 / 1e4, 0.001 / 100, 0.01, 0.01)

    t0 = time.perf_counter()
    for i in range(n_windows):
        s = i * 8
        anchor = est[s:s + 10]
        h = heat[s:s + 10]
        # stage 1 (local): weights per optimizer.py:355-358
        local = optimize_window(model, anchor, mean_bl, h, cam,
                                0.01 / 1e4, 0.001 / 100, 0.01, 0.01)
        # lift to relative-global frame
        c0_inv = torch.inverse(cams[s])
        rel = []
        for k in range(10):
            m = c0_inv @ cams[s + k]
            homo = torch.cat([local[k], torch.ones(15, 1)], dim=1)
            rel.append((m @ homo.T).T[:, :3])
        rel = torch.stack(rel)
        # stage 2 (global): weights per optimizer.py:352-353, reproj off
        optimize_window(model, rel, mean_bl, h, cam,
                        0.01, 0.001, 0.01, 0.0)
    dt = time.perf_counter() - t0

    wps = n_windows / dt
    out = {
        "windows_per_sec": wps,
        "sec_per_window": dt / n_windows,
        "n_windows": n_windows,
        "device": "cpu",
        "torch_threads": torch.get_num_threads(),
    }
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "baseline_torch.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
